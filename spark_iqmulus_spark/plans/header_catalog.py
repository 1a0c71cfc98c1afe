"""Header-catalog metadata fast paths (A13/A14/A23 equivalents).

The reference answers ``COUNT(*)`` and ``MIN/MAX(x|y|z)`` from header
metadata via two custom Catalyst physical plans injected through
``extraStrategies`` (``/root/reference/src/main/scala/fr/ign/spark/iqmulus/ExtraStrategies.scala:35-76``)
— O(files) work, zero bytes of point data read.  Pure-Python Spark cannot
inject planner strategies, so we surface the same capability as an explicit
**header catalog**: a small DataFrame of per-file header facts, and helpers
that answer count/min-max from it (SURVEY.md §4.3).  ``df.count()`` on the
full scan remains the always-correct path; these helpers are the O(files)
fast path, and the catalog doubles as the bounds source for file skipping.

The reference's ``CountPlan`` returns ``n × Σcount`` for ``COUNT(n)`` — a
wrong-SQL quirk we deliberately do not replicate (SURVEY §2A A13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession

from ..sources.las_format import LasHeader
from ..sources.ply_format import PlyHeader
from ..sources.pointcloud_common import pmap_headers


def las_headers(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One row per LAS file: the FIXTURES.md F8 catalog schema."""
    rows = []
    sorted_paths = sorted(paths)
    for p, h in zip(sorted_paths, pmap_headers(LasHeader.parse_file, sorted_paths)):
        rows.append(
            Row(
                location=p,
                version_major=h.version_major,
                version_minor=h.version_minor,
                pdr_format=h.pdr_format,
                pdr_nb=h.pdr_nb,
                x_min=h.pmin[0], y_min=h.pmin[1], z_min=h.pmin[2],
                x_max=h.pmax[0], y_max=h.pmax[1], z_max=h.pmax[2],
                scale_x=h.scale[0], scale_y=h.scale[1], scale_z=h.scale[2],
                offset_x=h.offset[0], offset_y=h.offset[1], offset_z=h.offset[2],
                return_counts=list(h.pdr_return_nb),
            )
        )
    return spark.createDataFrame(rows)


def ply_headers(spark: SparkSession, paths: list[str], element: str = "vertex") -> DataFrame:
    """One row per PLY file: element count/stride and layout facts."""
    rows = []
    sorted_paths = sorted(paths)
    for p, h in zip(sorted_paths, pmap_headers(PlyHeader.parse_file, sorted_paths)):
        el = h.element(element)
        rows.append(
            Row(
                location=p,
                little_endian=h.little_endian,
                element=element,
                count=el.count if el else 0,
                stride=el.stride if el else 0,
                n_properties=len(el.properties) if el else 0,
                header_length=h.header_length,
            )
        )
    return spark.createDataFrame(rows)


def pcd_headers(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One row per PCD file: points/stride/layout facts (pcdinfo catalog)."""
    from ..sources.pcd_format import PcdHeader

    rows = []
    sorted_paths = sorted(paths)
    for p, h in zip(sorted_paths, pmap_headers(PcdHeader.parse_file, sorted_paths)):
        rows.append(
            Row(
                location=p,
                version=h.version,
                data_kind=h.data_kind,
                points=h.points,
                width=h.width,
                height=h.height,
                stride=h.stride,
                n_fields=len(h.fields),
            )
        )
    return spark.createDataFrame(rows)


def count_from_headers(
    spark: SparkSession | None, paths: list[str], fmt: str = "las", element: str = "vertex"
) -> int:
    """Metadata-only COUNT(*): Σ per-file header counts — no data scan, no
    Spark job.  Like the reference's CountPlan (``executeCollect`` computes
    on the driver with zero executor work, ExtraStrategies.scala:37,41), this
    is O(files) of driver-side header reads; ``spark`` is accepted for API
    symmetry but unused."""
    if fmt == "las":
        return sum(h.pdr_nb for h in pmap_headers(LasHeader.parse_file, paths))
    if fmt == "pcd":
        from ..sources.pcd_format import PcdHeader

        return sum(h.points for h in pmap_headers(PcdHeader.parse_file, paths))
    total = 0
    for h in pmap_headers(PlyHeader.parse_file, paths):
        el = h.element(element)
        total += el.count if el else 0
    return total


def minmax_from_headers(
    spark: SparkSession | None, paths: list[str]
) -> dict[str, float]:
    """Metadata-only MIN/MAX(x,y,z) in world coordinates from LAS headers
    (AggregatePlan semantics, ExtraStrategies.scala:49-76) — driver-side
    only, no Spark job."""
    headers = pmap_headers(LasHeader.parse_file, paths)
    out: dict[str, float] = {}
    for i, c in enumerate("xyz"):
        out[f"{c}_min"] = min(h.pmin[i] for h in headers)
        out[f"{c}_max"] = max(h.pmax[i] for h in headers)
    return out


def las_info(path: str) -> str:
    """lasinfo-style header report (A23 — LasHeader.scala:246-284)."""
    return LasHeader.parse_file(path).info()


def scan_report(paths: list[str], fmt: str = "las") -> dict:
    """Driver-side read-completeness audit for the skip-with-warning default.

    The point-cloud sources default to ``ignoreCorruptFiles=true`` (reference
    parity, PlyRelation.scala:101-115), so an unreadable tile degrades to a
    stderr warning rather than a failed job.  This helper is the queryable
    counterpart: parse every header on the driver and report exactly which
    files a read of ``paths`` would include vs. skip, so pipelines can gate
    on ``report["skipped_count"] == 0`` before trusting a result.

    Returns ``{"readable": [...], "skipped": [(path, error_str), ...],
    "readable_count": int, "skipped_count": int}``.
    """
    if fmt == "las":
        parse_one = LasHeader.parse_file
    elif fmt == "pcd":
        from ..sources.pcd_format import PcdHeader

        parse_one = PcdHeader.parse_file
    else:
        parse_one = PlyHeader.parse_file

    def attempt(p):
        try:
            parse_one(p)
            return (p, None)
        except Exception as exc:
            return (p, str(exc))

    from concurrent.futures import ThreadPoolExecutor

    paths = sorted(paths)
    if len(paths) > 1:
        with ThreadPoolExecutor(max_workers=min(32, len(paths))) as pool:
            results = list(pool.map(attempt, paths))
    else:
        results = [attempt(p) for p in paths]
    readable = [p for p, err in results if err is None]
    skipped = [(p, err) for p, err in results if err is not None]
    return {
        "readable": readable,
        "skipped": skipped,
        "readable_count": len(readable),
        "skipped_count": len(skipped),
    }


def _verify_las_sizes(paths) -> None:
    """Raise if any file is shorter than its header's claimed point data
    (``offset + n*stride``).  Longer is legal — LAS 1.4 EVLRs follow the
    point records — but shorter means truncation or a lying header."""
    import os as _os

    for p, h in zip(sorted(paths), pmap_headers(LasHeader.parse_file, sorted(paths))):
        need = h.offset_to_points + h.pdr_nb * h.stride
        size = _os.stat(p).st_size
        if size < need:
            raise ValueError(
                f"{p}: header claims {h.pdr_nb} points"
                f" ({need} bytes) but the file has {size} bytes —"
                " truncated tile or lying header"
            )


class SmartPointCloudFrame:
    """Opt-in facade restoring the reference's *transparent* metadata-only
    aggregation UX (``ExtraStrategies.scala:35-76``: after one
    ``Strategy.register()``, plain ``df.count()`` / ``min(x)`` become
    O(files)).  Pure-Python Spark cannot inject planner strategies
    (SURVEY.md §4.3), so this wrapper intercepts exactly the two aggregate
    shapes the reference's strategies cover and answers them from file
    headers; EVERY other DataFrame attribute delegates to the real scan —
    a ``.filter(...)``/``.select(...)`` returns a plain DataFrame and
    leaves the fast path, which is also the reference's behavior (its
    CountPlan only matches a bare count over the relation).

    ``verify=True`` cross-checks each metadata answer against the full
    scan and raises on drift (headers are producer-written and CAN lie;
    the default trusts them exactly as the reference does).
    """

    def __init__(
        self, spark, paths, fmt="las", verify=False, manifest_path=None, **options
    ):
        self._spark = spark
        self._paths = sorted(paths)
        self._fmt = fmt
        self._verify = verify
        #: PLY/PCD bounds source: a stats-from-data manifest parquet
        #: (plans/manifest.py) — headers of those formats carry no bounds
        self._manifest_path = manifest_path
        self._manifest_df = None
        self._manifest_cols: tuple = ()
        self._options = options
        self._df = None

    # -- the real scan (built lazily so metadata-only use never plans it) --

    def toDF(self) -> DataFrame:
        import json

        if self._df is None:
            reader = self._spark.read.format(self._fmt)
            for k, v in self._options.items():
                reader = reader.option(k, v)
            if self._verify:
                # verify=True cross-checks headers against the REAL scan;
                # with the round-10 transparent fast path installed
                # (plans/fused_read.py) a bare count()/min-max over this
                # frame would answer from the same headers it is supposed
                # to verify — force the scan path for every delegated op
                reader = reader.option("fusedRead", "false")
            self._df = reader.option(
                "paths", json.dumps(self._paths)
            ).load()
        return self._df

    def __getattr__(self, name):
        # anything we don't intercept behaves exactly like the DataFrame
        return getattr(self.toDF(), name)

    # -- intercepted metadata-only aggregates ------------------------------

    def count(self) -> int:
        """O(files) header count — no Spark job, zero point bytes read
        (CountPlan semantics, ExtraStrategies.scala:35-48).

        ``verify=True`` adds two checks: (a) each file is at least as long
        as its header claims (catches truncated/partial tiles — the scan
        CANNOT catch a consistent lie because it plans from the same
        header), then (b) the full scan count equals the header count."""
        n = count_from_headers(self._spark, self._paths, fmt=self._fmt)
        if self._verify:
            if self._fmt == "las":
                _verify_las_sizes(self._paths)
            scanned = self.toDF().count()
            if scanned != n:
                raise ValueError(
                    f"header catalog count {n} != scanned count {scanned}"
                    " — a header lies; rebuild the files or read without"
                    " smart_las"
                )
        return n

    def minmax(self, cols=("x", "y", "z")) -> dict:
        """Metadata-only world-coordinate MIN/MAX (AggregatePlan semantics,
        ExtraStrategies.scala:49-76).

        LAS answers O(files) from headers.  PLY/PCD headers carry no
        bounds, so those route to the stats-from-data manifest
        (plans/manifest.py): O(manifest) when ``manifest_path`` points at a
        written manifest, else ONE distributed stats scan on first use,
        cached on this frame for every later ``minmax`` call — the Iceberg
        cost model (pay ingestion once, plan from stats forever)."""
        if self._fmt == "las":
            mm = minmax_from_headers(self._spark, self._paths)
        else:
            mm = self._manifest_minmax(cols)
        out = {k: v for k, v in mm.items() if k.split("_")[0] in cols}
        if self._verify:
            from pyspark.sql import functions as F

            from ..functions.scaled import with_world_coords

            if self._fmt == "las":
                world = with_world_coords(self.toDF())
            else:  # PLY/PCD coordinates are already world-valued floats
                df = self.toDF()
                world = df.select(
                    *[F.col(c).cast("double").alias(c) for c in cols]
                )
            aggs = []
            for c in cols:
                aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
            truth = world.agg(*aggs).collect()[0].asDict()
            for k, v in out.items():
                if abs(truth[k] - v) > 1e-6:
                    raise ValueError(
                        f"header bounds {k}={v} != scanned {truth[k]}"
                        " — a header lies; rebuild the files or read"
                        " without smart_las"
                    )
        return out


    def _manifest_minmax(self, cols) -> dict:
        """PLY/PCD bounds: read the written manifest if given, else run the
        one-time distributed stats scan (build_manifest_scan) and keep the
        per-file stats frame for later calls.  The final min/max over
        O(files) manifest rows is computed driver-side."""
        from pyspark.sql import functions as F

        from .manifest import build_manifest_scan

        if self._manifest_df is None:
            if self._manifest_path is not None:
                self._manifest_df = self._spark.read.parquet(self._manifest_path)
            else:
                self._manifest_cols = tuple(cols)
                self._manifest_df = build_manifest_scan(
                    self._spark, self._paths, fmt=self._fmt, columns=tuple(cols)
                ).localCheckpoint()
        missing = [c for c in cols if f"{c}_min" not in self._manifest_df.columns]
        if missing and self._manifest_path is not None:
            # a user-supplied manifest is the source of truth — never
            # silently drop the columns it lacks
            raise ValueError(
                f"manifest at {self._manifest_path!r} has no bounds for"
                f" columns {tuple(missing)} (requested {tuple(cols)})"
            )
        if missing:
            # columns already attempted by an earlier scan (they are in
            # _manifest_cols but produced no bounds) do not exist in the
            # files — raise without re-running the full rescan
            known_absent = [c for c in missing if c in self._manifest_cols]
            if known_absent:
                raise ValueError(
                    f"columns {tuple(known_absent)} not present in the"
                    f" {self._fmt} files (requested {tuple(cols)})"
                )
            # the on-demand stats scan was built for an earlier, narrower
            # column set — rebuild covering the union rather than
            # returning a dict that silently omits the new columns
            self._manifest_cols = tuple(
                dict.fromkeys(tuple(self._manifest_cols) + tuple(cols))
            )
            self._manifest_df = build_manifest_scan(
                self._spark, self._paths, fmt=self._fmt,
                columns=self._manifest_cols,
            ).localCheckpoint()
            # build_manifest_scan silently skips columns the files don't
            # have; a column still absent after the rebuild does not exist
            # in the data — raise the clear error (and cache the rebuilt
            # frame so the full rescan is not repeated on retry)
            still = [
                c for c in cols
                if f"{c}_min" not in self._manifest_df.columns
            ]
            if still:
                raise ValueError(
                    f"columns {tuple(still)} not present in the"
                    f" {self._fmt} files (requested {tuple(cols)})"
                )
        m = self._manifest_df
        aggs = []
        for c in cols:
            aggs.append(F.min(f"{c}_min").alias(f"{c}_min"))
            aggs.append(F.max(f"{c}_max").alias(f"{c}_max"))
        return m.agg(*aggs).collect()[0].asDict()


_EXT = {"las": ".las", "ply": ".ply", "pcd": ".pcd"}


def _glob_fmt(paths, fmt: str) -> list[str]:
    import glob as _glob
    import os as _os

    if isinstance(paths, str):
        if _os.path.isdir(paths):
            return _glob.glob(_os.path.join(paths, f"*{_EXT[fmt]}"))
        return _glob.glob(paths) or [paths]
    return list(paths)


def smart_las(
    spark: SparkSession, paths, verify: bool = False, **options
) -> SmartPointCloudFrame:
    """The reference-UX entry point: ``smart_las(spark, paths).count()``
    is O(files); everything else is the normal LAS scan."""
    return SmartPointCloudFrame(spark, _glob_fmt(paths, "las"), "las", verify, **options)


def smart_scan(
    spark: SparkSession,
    paths,
    fmt: str = "las",
    verify: bool = False,
    manifest_path: str | None = None,
    **options,
) -> SmartPointCloudFrame:
    """Format-general metadata-aggregation facade (VERDICT r6 item 4 —
    generalizes A15 beyond LAS): ``smart_scan(spark, paths, "ply").count()``
    answers O(files) from headers for LAS/PLY/PCD alike, and ``minmax()``
    routes to LAS headers or, for PLY/PCD, to the stats-from-data manifest
    (pass ``manifest_path`` for O(manifest) planning, or let the first call
    pay the one ingestion scan).  Everything else delegates to the normal
    scan — reference parity with the opt-in ``Strategy.register()`` UX
    (``ExtraStrategies.scala:35-76,132-135``)."""
    if fmt not in _EXT:
        raise ValueError(f"fmt must be one of {sorted(_EXT)}, got {fmt!r}")
    return SmartPointCloudFrame(
        spark,
        _glob_fmt(paths, fmt),
        fmt,
        verify,
        manifest_path=manifest_path,
        **options,
    )
