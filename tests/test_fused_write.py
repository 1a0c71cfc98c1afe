"""Fused write fast path (sources/fused_write.py): equivalence with the
general Python-DataSource sink, and the fallback gates.

The rewrite makes stock ``df.write.format("las")`` take the transcode byte
path when the plan is a pure scan→filter of the same format; every test
here compares it against the general sink (forced via
``.option("fusedWrite", "false")``) at the reader level — same rows, same
restored file names."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from .fixtures import make_las


@pytest.fixture()
def tiles(tmp_path):
    d = tmp_path / "tiles"
    d.mkdir()
    make_las(str(d / "tile_a.las"), n=8000, fmt=1)
    make_las(str(d / "tile_b.las"), n=5000, fmt=1)
    return str(d)


def _rows(spark, path):
    return sorted(
        map(tuple, spark.read.format("las").load(path).drop("fid", "pid").collect())
    )


def _names(path):
    return sorted(f for f in os.listdir(path) if f.endswith(".las"))


def _both(spark, df_fn, tmp_path, tag):
    outg = str(tmp_path / f"general_{tag}")
    outf = str(tmp_path / f"fused_{tag}")
    df_fn().write.format("las").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("las").mode("overwrite").save(outf)
    return outg, outf


def test_fused_scan_write_equals_general(spark, tiles, tmp_path):
    outg, outf = _both(
        spark, lambda: spark.read.format("las").load(tiles), tmp_path, "scan"
    )
    assert _names(outg) == _names(outf) == ["tile_a.las", "tile_b.las"]
    assert _rows(spark, outg) == _rows(spark, outf)


def test_fused_filter_write_equals_general(spark, tiles, tmp_path):
    def df_fn():
        return (
            spark.read.format("las")
            .load(tiles)
            .where((F.col("classification") <= 3) & (F.col("intensity") > 100))
        )

    outg, outf = _both(spark, df_fn, tmp_path, "filter")
    assert _names(outg) == _names(outf)
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)


def test_fused_xyz_filter_translates_grid_to_world(spark, tiles, tmp_path):
    """x/y/z in the DataFrame are RAW grid ints; the transcoder's where is
    WORLD-valued — the fused path must translate thresholds so <=, <, and
    == answer identically on both paths (including a non-integer literal
    that casts the int column)."""

    def df_fn():
        return (
            spark.read.format("las")
            .load(tiles)
            .where((F.col("x") <= 5000) & (F.col("y") > 2500.5))
        )

    outg, outf = _both(spark, df_fn, tmp_path, "xyz")
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)
    assert _names(outg) == _names(outf)


def test_fused_respects_mode_error(spark, tiles, tmp_path):
    out = str(tmp_path / "once")
    df = spark.read.format("las").load(tiles)
    df.write.format("las").save(out)
    assert _names(out) == ["tile_a.las", "tile_b.las"]
    with pytest.raises(Exception):
        df.write.format("las").save(out)  # default mode errors on existing


def test_projection_falls_back_to_general_sink(spark, tiles, tmp_path):
    # dropping fid removes name-restore provenance; the general sink merges
    # into data.las — if the fused path (wrongly) engaged, names would be
    # the restored tile names instead
    out = str(tmp_path / "proj")
    spark.read.format("las").load(tiles).select("x", "y", "z").write.format(
        "las"
    ).mode("overwrite").save(out)
    assert _names(out) == ["data.las"]


def test_non_scan_plan_falls_back(spark, tiles, tmp_path):
    # an aggregate-derived frame is not a scan→filter: must go through the
    # general sink (and still produce a valid file)
    df = spark.read.format("las").load(tiles)
    small = df.limit(100)
    out = str(tmp_path / "limit")
    small.write.format("las").mode("overwrite").save(out)
    assert spark.read.format("las").load(out).count() == 100


def test_write_options_disable_fusing(spark, tiles, tmp_path):
    # an explicit grid option means re-encoding — general sink; the output
    # must actually carry the requested scale
    from spark_iqmulus_spark.sources.las_format import LasHeader

    out = str(tmp_path / "regrid")
    spark.read.format("las").load(tiles).write.format("las").option(
        "scale", "0.001,0.001,0.001"
    ).mode("overwrite").save(out)
    for f in _names(out):
        assert LasHeader.parse_file(os.path.join(out, f)).scale == (
            0.001,
            0.001,
            0.001,
        )


@pytest.fixture()
def ply_tiles(tmp_path):
    from .fixtures import make_ply_xyz

    d = tmp_path / "ply_tiles"
    d.mkdir()
    make_ply_xyz(str(d / "pa.ply"), n=700, seed=3)
    make_ply_xyz(str(d / "pb.ply"), n=500, seed=4)
    return str(d)


def _ply_rows(spark, path):
    return sorted(
        map(tuple, spark.read.format("ply").load(path).drop("fid", "pid").collect())
    )


def test_fused_ply_filter_write_equals_general(spark, ply_tiles, tmp_path):
    def df_fn():
        return (
            spark.read.format("ply").load(ply_tiles).where(F.col("x") < 50.0)
        )

    outg = str(tmp_path / "ply_general")
    outf = str(tmp_path / "ply_fused")
    df_fn().write.format("ply").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("ply").mode("overwrite").save(outf)
    gnames = sorted(f for f in os.listdir(outg) if f.endswith(".ply"))
    fnames = sorted(f for f in os.listdir(outf) if f.endswith(".ply"))
    assert gnames == fnames == ["pa.ply", "pb.ply"]
    rows = _ply_rows(spark, outf)
    assert rows and rows == _ply_rows(spark, outg)


def test_fused_ply_unsigned_property_falls_back(spark, tmp_path):
    # u1 rgb properties map through Spark's signed types (tinyint → i1) —
    # the two paths would write different property descriptors, so the
    # rewrite must not engage (observable: the general sink re-types
    # r/g/b to signed; a byte copy would keep u1)
    from .fixtures import make_ply_xyz
    from spark_iqmulus_spark.sources.ply_format import PlyHeader

    d = tmp_path / "rgb"
    d.mkdir()
    make_ply_xyz(str(d / "t.ply"), n=300, rgb=True)
    out = str(tmp_path / "rgb_out")
    spark.read.format("ply").load(str(d)).write.format("ply").mode(
        "overwrite"
    ).save(out)
    h = PlyHeader.parse_file(os.path.join(out, "t.ply"))
    got = {p.name: p.np_char for p in h.element("vertex").properties}
    assert got["r"] == "i1"  # general sink's signed re-typing → fell back


def test_fused_ply_projected_write_equals_general(spark, ply_tiles, tmp_path):
    """VERDICT r10 next #3: select(subset) → write.format("ply") takes the
    byte path (zero Arrow hop) and matches the general sink file-for-file
    — the output header carries exactly the projected properties."""
    from spark_iqmulus_spark.sources.fused_write import plan_fused_save
    from spark_iqmulus_spark.sources.ply_format import PlyHeader

    def df_fn():
        return (
            spark.read.format("ply")
            .load(ply_tiles)
            .select("fid", "x", "z")
            .where(F.col("x") < 50.0)
        )

    assert (
        plan_fused_save(df_fn(), "ply", str(tmp_path / "pp"), "overwrite", {})
        is not None
    )
    outg = str(tmp_path / "plyp_general")
    outf = str(tmp_path / "plyp_fused")
    df_fn().write.format("ply").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("ply").mode("overwrite").save(outf)
    gnames = sorted(f for f in os.listdir(outg) if f.endswith(".ply"))
    fnames = sorted(f for f in os.listdir(outf) if f.endswith(".ply"))
    assert gnames == fnames == ["pa.ply", "pb.ply"]
    rows = _ply_rows(spark, outf)
    assert rows and rows == _ply_rows(spark, outg)
    for nm in fnames:
        hf = PlyHeader.parse_file(os.path.join(outf, nm))
        hg = PlyHeader.parse_file(os.path.join(outg, nm))
        lay_f = [(p.name, p.np_char) for p in hf.element("vertex").properties]
        lay_g = [(p.name, p.np_char) for p in hg.element("vertex").properties]
        assert lay_f == lay_g == [("x", "f4"), ("z", "f4")]
        assert hf.element("vertex").count == hg.element("vertex").count


def test_fused_pcd_projected_write_equals_general(spark, tmp_path):
    from .fixtures import make_pcd
    from spark_iqmulus_spark.sources.fused_write import plan_fused_save
    from spark_iqmulus_spark.sources.pcd_format import PcdHeader

    d = tmp_path / "pcdp_tiles"
    d.mkdir()
    make_pcd(str(d / "ca.pcd"), n=600, seed=5)
    make_pcd(str(d / "cb.pcd"), n=400, seed=6)

    def df_fn():
        return (
            spark.read.format("pcd")
            .load(str(d))
            .select("fid", "x", "label")
            .where(F.col("label") <= 4)
        )

    assert (
        plan_fused_save(df_fn(), "pcd", str(tmp_path / "cp"), "overwrite", {})
        is not None
    )
    outg = str(tmp_path / "pcdp_general")
    outf = str(tmp_path / "pcdp_fused")
    df_fn().write.format("pcd").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("pcd").mode("overwrite").save(outf)

    def rows(path):
        return sorted(
            map(
                tuple,
                spark.read.format("pcd")
                .load(path)
                .drop("fid", "pid")
                .collect(),
            )
        )

    gnames = sorted(f for f in os.listdir(outg) if f.endswith(".pcd"))
    fnames = sorted(f for f in os.listdir(outf) if f.endswith(".pcd"))
    assert gnames == fnames == ["ca.pcd", "cb.pcd"]
    got = rows(outf)
    assert got and got == rows(outg)
    for nm in fnames:
        hf = PcdHeader.parse_file(os.path.join(outf, nm))
        hg = PcdHeader.parse_file(os.path.join(outg, nm))
        assert [(f.name, f.np_char) for f in hf.fields] == [
            (f.name, f.np_char) for f in hg.fields
        ] == [("x", "f4"), ("label", "i4")]
        assert hf.points == hg.points


def test_fused_ply_renamed_write_equals_general(spark, ply_tiles, tmp_path):
    """Pure renames (withColumnRenamed / .alias) are byte-path-fusable for
    self-describing layouts: the output property takes the new name with
    the source values — matching the general sink, which writes schema
    names.  LAS declines (standard field names are fixed)."""
    from spark_iqmulus_spark.sources.fused_write import plan_fused_save
    from spark_iqmulus_spark.sources.ply_format import PlyHeader

    def df_fn():
        return (
            spark.read.format("ply")
            .load(ply_tiles)
            .where(F.col("y") < 50.0)  # filter column dropped by the select
            .select("fid", F.col("x").alias("easting"), "z")
        )

    assert (
        plan_fused_save(df_fn(), "ply", str(tmp_path / "rn"), "overwrite", {})
        is not None
    )
    outg = str(tmp_path / "rn_general")
    outf = str(tmp_path / "rn_fused")
    df_fn().write.format("ply").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("ply").mode("overwrite").save(outf)
    names = sorted(f for f in os.listdir(outf) if f.endswith(".ply"))
    assert names == sorted(f for f in os.listdir(outg) if f.endswith(".ply"))
    rows = _ply_rows(spark, outf)
    assert rows and rows == _ply_rows(spark, outg)
    for nm in names:
        h = PlyHeader.parse_file(os.path.join(outf, nm))
        lay = [(p.name, p.np_char) for p in h.element("vertex").properties]
        assert lay == [("easting", "f4"), ("z", "f4")]


def test_las_renamed_projection_falls_back(spark, tiles, tmp_path):
    from spark_iqmulus_spark.sources import fused_write as fw

    df = (
        spark.read.format("las")
        .load(tiles)
        .select("fid", F.col("x").alias("easting"), "y", "z")
    )
    assert fw.plan_fused_save(df, "las", str(tmp_path / "r"), "overwrite", {}) is None
    assert "renamed" in (fw._LAST_DECLINE or "")


def test_projected_extra_bytes_standard_name_falls_back(spark, tmp_path):
    """ADVICE r10: an ExtraBytes field that REUSES a standard name from
    another point format ('red' is standard on fmt 2/3 but ExtraBytes on
    this fmt-1 source) must not qualify the projected byte path — the
    byte path would copy raw stored values where the general sink writes
    schema values."""
    import numpy as np

    from spark_iqmulus_spark.sources.fused_write import plan_fused_save
    from spark_iqmulus_spark.sources.las_format import (
        POINT_FORMATS,
        ExtraField,
        LasHeader,
    )

    d = tmp_path / "redex"
    d.mkdir()
    p = str(d / "r.las")
    n = 400
    rng = np.random.default_rng(11)
    fields = list(POINT_FORMATS[1]) + [("red", "u2")]
    dtype = np.dtype([(nm, "<" + ch) for nm, ch in fields])
    arr = np.zeros(n, dtype=dtype)
    for c in "xyz":
        arr[c] = rng.integers(-(10**5), 10**5, n).astype(np.int32)
    arr["red"] = rng.integers(0, 65535, n)
    world = {c: 0.01 * arr[c].astype(np.float64) for c in "xyz"}
    hdr = LasHeader(
        location=p,
        version_minor=2,
        pdr_format=1,
        pdr_nb=n,
        pmin=(world["x"].min(), world["y"].min(), world["z"].min()),
        pmax=(world["x"].max(), world["y"].max(), world["z"].max()),
        extra_fields=[ExtraField("red", "u2")],
    )
    with open(p, "wb") as f:
        f.write(hdr.to_bytes())
        f.write(arr.tobytes())
    df = spark.read.format("las").load(str(d))
    assert "red" in df.columns
    proj = df.select("fid", "x", "y", "red")
    assert plan_fused_save(proj, "las", str(tmp_path / "o"), "overwrite", {}) is None
    # the same source with a format-native projection still fuses
    proj2 = df.select("fid", "x", "y", "intensity")
    assert (
        plan_fused_save(proj2, "las", str(tmp_path / "o2"), "overwrite", {})
        is not None
    )


def test_fused_pcd_filter_write_equals_general(spark, tmp_path):
    from .fixtures import make_pcd

    d = tmp_path / "pcd_tiles"
    d.mkdir()
    make_pcd(str(d / "ca.pcd"), n=600, seed=5)
    make_pcd(str(d / "cb.pcd"), n=400, seed=6)

    def df_fn():
        return (
            spark.read.format("pcd").load(str(d)).where(F.col("label") <= 4)
        )

    outg = str(tmp_path / "pcd_general")
    outf = str(tmp_path / "pcd_fused")
    df_fn().write.format("pcd").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("pcd").mode("overwrite").save(outf)

    def rows(path):
        return sorted(
            map(
                tuple,
                spark.read.format("pcd")
                .load(path)
                .drop("fid", "pid")
                .collect(),
            )
        )

    gnames = sorted(f for f in os.listdir(outg) if f.endswith(".pcd"))
    fnames = sorted(f for f in os.listdir(outf) if f.endswith(".pcd"))
    assert gnames == fnames == ["ca.pcd", "cb.pcd"]
    got = rows(outf)
    assert got and got == rows(outg)


def test_fused_plan_analysis_is_side_effect_free(spark, tiles, tmp_path):
    # a qualifying plan analyzed but not run must not create anything
    from spark_iqmulus_spark.sources.fused_write import plan_fused_save

    df = spark.read.format("las").load(tiles)
    out = str(tmp_path / "never")
    run = plan_fused_save(df, "las", out, "overwrite", {})
    assert run is not None
    assert not os.path.exists(out)


def test_fused_partition_by_matches_general_sink(spark, tiles, tmp_path):
    """VERDICT r9 wrong #1: ``.partitionBy('z')`` via the builder must NOT
    silently take the fused path (which would drop the partitioning) — it
    must hit the general sink, which rejects column partitioning for our
    formats on both the builder and keyword spellings."""
    df = spark.read.format("las").load(tiles)
    out = str(tmp_path / "pby")
    with pytest.raises(Exception):
        df.write.format("las").option("fusedWrite", "false").partitionBy(
            "z"
        ).mode("overwrite").save(out)
    with pytest.raises(Exception):
        df.write.format("las").partitionBy("z").mode("overwrite").save(out)
    with pytest.raises(Exception):
        df.write.format("las").mode("overwrite").save(out, partitionBy=["z"])
    assert not os.path.exists(out) or not _names(out)


def test_fused_partition_by_state_does_not_leak(spark, tiles, tmp_path):
    """A fresh writer after a ``.partitionBy`` writer must still fuse —
    the mirrored state lives on the writer instance, not the class."""
    from spark_iqmulus_spark.sources import fused_write as fw

    df = spark.read.format("las").load(tiles)
    w = df.write.format("las").partitionBy("z")
    assert getattr(w, "_fw_partition_by", None) == ["z"]
    out = str(tmp_path / "fresh")
    df.write.format("las").mode("overwrite").save(out)
    assert _names(out) == ["tile_a.las", "tile_b.las"]


def test_lossy_cast_filter_falls_back(spark, tiles, tmp_path):
    """ADVICE r9 (high): a narrowing cast in the filter must disqualify
    the fused path — stripping it would compare the un-truncated value and
    emit different rows than the general sink.  Under ANSI (Spark 4
    default) a plain narrowing cast THROWS on overflow in the general
    sink, so a fused path that stripped it would silently succeed where
    the general sink errors; ``try_cast`` (overflow → NULL → filter
    false) exposes the row-divergence flavor of the same bug."""
    from spark_iqmulus_spark.sources.fused_write import plan_fused_save

    df = spark.read.format("las").load(tiles).where(
        F.col("intensity").try_cast("tinyint") > 0
    )
    assert plan_fused_save(df, "las", str(tmp_path / "x"), "overwrite", {}) is None

    # and end-to-end: both spellings produce identical (general-sink) rows
    def df_fn():
        return spark.read.format("las").load(tiles).where(
            F.col("intensity").try_cast("tinyint") > 0
        )

    outg, outf = _both(spark, df_fn, tmp_path, "lossy")
    assert _rows(spark, outg) == _rows(spark, outf)


def test_widening_cast_filter_still_fuses(spark, tiles, tmp_path):
    """A value-preserving widening (int → bigint) keeps the byte path."""
    from spark_iqmulus_spark.sources.fused_write import plan_fused_save

    df = spark.read.format("las").load(tiles).where(
        F.col("intensity").cast("bigint") > 100
    )
    run = plan_fused_save(df, "las", str(tmp_path / "w"), "overwrite", {})
    assert run is not None


def test_decline_reason_is_recorded(spark, tiles, tmp_path):
    """VERDICT r9 wrong #2: a declined plan must leave a diagnosable
    reason for the fusedWriteDebug trace."""
    from spark_iqmulus_spark.sources import fused_write as fw

    df = spark.read.format("las").load(tiles)
    out = str(tmp_path / "why")
    assert fw.plan_fused_save(df, "las", out, "overwrite", {}, partition_by=["z"]) is None
    assert "partitionBy" in (fw._LAST_DECLINE or "")
    assert fw.plan_fused_save(df, "las", out, "overwrite", {"scale": "0.1"}) is None
    assert "scale" in (fw._LAST_DECLINE or "")
    assert fw.plan_fused_save(df.limit(5), "las", out, "overwrite", {}) is None
    assert fw._LAST_DECLINE


def test_projected_filter_write_fuses_and_equals_general(spark, tiles, tmp_path):
    """VERDICT r9 item 4: the las2las column-subset shape
    ``read → select(core fields) → filter → write`` takes the byte path
    (re-encoding onto the smallest covering format) and matches the
    general sink file-for-file, row-for-row."""
    from spark_iqmulus_spark.sources.fused_write import plan_fused_save
    from spark_iqmulus_spark.sources.las_format import LasHeader

    def df_fn():
        return (
            spark.read.format("las")
            .load(tiles)
            .select("fid", "x", "y", "z", "intensity")
            .where(F.col("intensity") > 100)
        )

    assert (
        plan_fused_save(df_fn(), "las", str(tmp_path / "p"), "overwrite", {})
        is not None
    )
    outg, outf = _both(spark, df_fn, tmp_path, "proj")
    assert _names(outg) == _names(outf) == ["tile_a.las", "tile_b.las"]
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)
    for nm in _names(outf):
        hf = LasHeader.parse_file(os.path.join(outf, nm))
        hg = LasHeader.parse_file(os.path.join(outg, nm))
        assert (hf.pdr_format, hf.pdr_nb, hf.pmin, hf.pmax, hf.pdr_return_nb) == (
            hg.pdr_format, hg.pdr_nb, hg.pmin, hg.pmax, hg.pdr_return_nb
        )
        assert hf.pdr_format == 0  # x/y/z/intensity collapse to fmt 0


def test_projected_without_fid_falls_back(spark, tiles, tmp_path):
    # no fid → no name-restore provenance → general sink merges to data.las
    out = str(tmp_path / "nofid")
    spark.read.format("las").load(tiles).select("x", "y", "intensity").write.format(
        "las"
    ).mode("overwrite").save(out)
    assert _names(out) == ["data.las"]


def test_projected_computed_column_falls_back(spark, tiles, tmp_path):
    from spark_iqmulus_spark.sources.fused_write import plan_fused_save

    df = (
        spark.read.format("las")
        .load(tiles)
        .select("fid", (F.col("x") + 1).alias("x"), "y", "z")
    )
    assert plan_fused_save(df, "las", str(tmp_path / "c"), "overwrite", {}) is None


def test_projected_extra_bytes_column_falls_back(spark, tmp_path):
    """A projected ExtraBytes column would make the general sink emit an
    ExtraBytes descriptor the byte path doesn't — must decline (and the
    two paths then agree trivially)."""
    from spark_iqmulus_spark.sources.fused_write import plan_fused_save

    d = tmp_path / "ex"
    d.mkdir()
    make_las(str(d / "e.las"), n=500, fmt=1, extra=True)
    df = spark.read.format("las").load(str(d))
    assert "reflectance" in df.columns  # the fixture's ExtraBytes field
    proj = df.select("fid", "x", "y", "reflectance")
    assert plan_fused_save(proj, "las", str(tmp_path / "x"), "overwrite", {}) is None
    # a standard-field projection of the same extras-carrying source DOES
    # fuse (the output simply has no ExtraBytes, like the general sink)
    proj2 = df.select("fid", "x", "y", "intensity")
    assert plan_fused_save(proj2, "las", str(tmp_path / "y"), "overwrite", {}) is not None


def test_columns_option_write_fuses_and_equals_general(spark, tiles, tmp_path):
    """The read-option spelling of projection: .option("columns","x,y,z,
    intensity") prunes in-scan (no Project node) — the write must take the
    same projected byte path and match the general sink."""
    from spark_iqmulus_spark.sources.fused_write import plan_fused_save
    from spark_iqmulus_spark.sources.las_format import LasHeader

    def df_fn():
        return (
            spark.read.format("las")
            .option("columns", "x,y,z,intensity")
            .load(tiles)
            .where(F.col("x") <= 5000)
        )

    assert (
        plan_fused_save(df_fn(), "las", str(tmp_path / "c"), "overwrite", {})
        is not None
    )
    outg, outf = _both(spark, df_fn, tmp_path, "colsopt")
    assert _names(outg) == _names(outf) == ["tile_a.las", "tile_b.las"]
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)
    for nm in _names(outf):
        hf = LasHeader.parse_file(os.path.join(outf, nm))
        hg = LasHeader.parse_file(os.path.join(outg, nm))
        assert hf.pdr_format == hg.pdr_format == 0
        assert (hf.pdr_nb, hf.pmin, hf.pmax) == (hg.pdr_nb, hg.pmin, hg.pmax)


def test_identity_projection_takes_byte_copy(spark, ply_tiles, tmp_path, monkeypatch):
    """select(all columns, source order) is an identity projection: the
    planner collapses it to the full-width pure byte copy (project=None
    reaches the transcoder — pinned by a recording wrapper, since the
    re-encode would produce byte-equal output and hide a regression) and
    the output equals the general sink."""
    from spark_iqmulus_spark.sources import transcode as tc

    def df_fn():
        return spark.read.format("ply").load(ply_tiles).select(
            "fid", "pid", "x", "y", "z"
        )

    seen = {}
    real = tc.transcode_ply_tiled

    def recording(*a, **kw):
        seen["project"] = kw.get("project", "MISSING")
        return real(*a, **kw)

    monkeypatch.setattr(tc, "transcode_ply_tiled", recording)
    outg = str(tmp_path / "idp_general")
    outf = str(tmp_path / "idp_fused")
    df_fn().write.format("ply").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("ply").mode("overwrite").save(outf)
    assert seen["project"] is None  # collapsed, not re-encoded
    rows = _ply_rows(spark, outf)
    assert rows and rows == _ply_rows(spark, outg)


def test_truncated_source_falls_back_and_matches_general(spark, tmp_path):
    """A truncated source file: the general sink (allow_short scan under
    the default ignoreCorruptFiles=true) writes the partial records; the
    byte path would raise mid-transcode — the planner must decline so the
    stock write matches the general sink (round-11 equivalence guard)."""
    import struct

    from spark_iqmulus_spark.sources import fused_write as fw

    d = tmp_path / "trunc_src"
    d.mkdir()
    p = str(d / "t.las")
    make_las(p, n=3000, fmt=1)
    with open(p, "rb") as f:
        blob = f.read()
    off = struct.unpack_from("<I", blob, 96)[0]
    stride = struct.unpack_from("<H", blob, 105)[0]
    with open(p, "wb") as f:
        f.write(blob[: off + 1200 * stride])
    df = spark.read.format("las").load(str(d))
    assert fw.plan_fused_save(df, "las", str(tmp_path / "o"), "overwrite", {}) is None
    assert "shorter" in (fw._LAST_DECLINE or "")
    out = str(tmp_path / "out")
    df.write.format("las").mode("overwrite").save(out)  # general sink
    assert spark.read.format("las").load(out).count() == 1200


# --- re-grid (computed-column) fused write — round 12 ---------------------


def _regrid_df_fn(spark, tiles, scale, offset, flt=None):
    from spark_iqmulus_spark.functions.scaled import regrid

    def df_fn():
        df = spark.read.format("las").load(tiles)
        if flt is not None:
            df = df.where(flt)
        return regrid(df, scale, offset)

    return df_fn


def _grid_opts(scale, offset):
    return {
        "scale": ",".join(repr(v) for v in scale),
        "offset": ",".join(repr(v) for v in offset),
    }


def test_regrid_write_fuses_and_equals_general(spark, tiles, tmp_path):
    """The headline re-grid shape: read → filter → regrid → write with the
    matching writer grid engages the byte path and matches the general
    sink row-for-row AND header-for-header (grid, bounds, counts)."""
    from spark_iqmulus_spark.sources import fused_write as fw
    from spark_iqmulus_spark.sources.las_format import LasHeader

    scale, offset = (0.002, 0.002, 0.002), (100.0, 0.0, -5.0)
    df_fn = _regrid_df_fn(
        spark, tiles, scale, offset, flt=F.col("classification") <= 3
    )
    opts = _grid_opts(scale, offset)
    run = fw.plan_fused_save(
        df_fn(), "las", str(tmp_path / "r"), "overwrite", dict(opts)
    )
    assert run is not None, fw._LAST_DECLINE

    outg = str(tmp_path / "rg_general")
    outf = str(tmp_path / "rg_fused")
    w = df_fn().write.format("las").mode("overwrite")
    for k, v in opts.items():
        w = w.option(k, v)
    w.option("fusedWrite", "false").save(outg)
    w2 = df_fn().write.format("las").mode("overwrite")
    for k, v in opts.items():
        w2 = w2.option(k, v)
    w2.save(outf)

    assert _names(outg) == _names(outf) == ["tile_a.las", "tile_b.las"]
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)
    for nm in _names(outf):
        hf = LasHeader.parse_file(os.path.join(outf, nm))
        hg = LasHeader.parse_file(os.path.join(outg, nm))
        assert hf.scale == hg.scale == scale
        assert hf.offset == hg.offset == offset
        assert (hf.pdr_nb, hf.pmin, hf.pmax, hf.pdr_return_nb) == (
            hg.pdr_nb, hg.pmin, hg.pmax, hg.pdr_return_nb
        )


def test_regrid_grid_boundary_rounding_matches(spark, tmp_path):
    """Adversarial .5 ties: halving the grid (0.01 → 0.02) puts every odd
    raw value EXACTLY on a .5 boundary in float64 (fl(0.02) = 2·fl(0.01)).
    Spark rounds HALF_UP (away from zero) — a replay using numpy's
    half-even round would shift points one grid cell.  Asserts exact
    expected raws on both signs AND fused == general."""
    from spark_iqmulus_spark.functions.scaled import regrid
    from spark_iqmulus_spark.sources import fused_write as fw

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1,), (-1,), (0,), (2,), (-2,), (4,)], "x int"
    ).write.format("las").mode("overwrite").save(src)

    scale, offset = (0.02, 0.02, 0.02), (0.0, 0.0, 0.0)
    opts = _grid_opts(scale, offset)

    def df_fn():
        return regrid(spark.read.format("las").load(src), scale, offset)

    assert (
        fw.plan_fused_save(
            df_fn(), "las", str(tmp_path / "p"), "overwrite", dict(opts)
        )
        is not None
    ), fw._LAST_DECLINE
    outg, outf = str(tmp_path / "bg"), str(tmp_path / "bf")
    df_fn().write.format("las").mode("overwrite").options(**opts).option(
        "fusedWrite", "false"
    ).save(outg)
    df_fn().write.format("las").mode("overwrite").options(**opts).save(outf)
    xs_f = sorted(r["x"] for r in spark.read.format("las").load(outf).collect())
    xs_g = sorted(r["x"] for r in spark.read.format("las").load(outg).collect())
    # HALF_UP: 1 → 0.5 → 1; −1 → −0.5 → −1 (away from zero); 2 → 1; 4 → 2
    assert xs_f == xs_g == [-1, -1, 0, 1, 1, 2]


def test_regrid_source_grid_differs_without_compute_falls_back(
    spark, tiles, tmp_path
):
    """scale/offset options WITHOUT recomputed x/y/z: the sink relabels raw
    values onto the option grid — byte-copy is only equivalent when the
    source already sits on that grid, so a differing grid declines."""
    from spark_iqmulus_spark.sources import fused_write as fw

    df = spark.read.format("las").load(tiles)
    opts = _grid_opts((0.5, 0.5, 0.5), (0.0, 0.0, 0.0))
    assert (
        fw.plan_fused_save(df, "las", str(tmp_path / "x"), "overwrite", dict(opts))
        is None
    )
    assert "grid" in (fw._LAST_DECLINE or "")
    # …but matching options (the source's own grid) DO fuse: they are the
    # sink's defaults spelled explicitly
    opts2 = _grid_opts((0.01, 0.01, 0.01), (0.0, 0.0, 0.0))
    assert (
        fw.plan_fused_save(df, "las", str(tmp_path / "y"), "overwrite", dict(opts2))
        is not None
    )


def test_regrid_unreplayable_expressions_fall_back(spark, tiles, tmp_path):
    """Outside the replayable node set → general sink: a non-zero round
    scale, a non-xyz computed target, and a non-correctly-rounded
    function.  (Cross-column references FUSE since round 12 — see
    test_las_rotation_computed_fuses_and_equals_general.)"""
    from spark_iqmulus_spark.sources import fused_write as fw

    df = spark.read.format("las").load(tiles)
    out = str(tmp_path / "o")

    def declined(frame):
        assert (
            fw.plan_fused_save(frame, "las", out, "overwrite", {}) is None
        )
        assert "replay" in (fw._LAST_DECLINE or "") or "computed" in (
            fw._LAST_DECLINE or ""
        ), fw._LAST_DECLINE

    wx2 = F.lit(0.0) + F.lit(0.01) * F.col("x").cast("double")
    declined(df.withColumn("x", F.round(wx2 / F.lit(0.002), 2).cast("int")))
    # storage-width mismatch: an int32-rooted program cannot write the u2
    # intensity field (round 12 allows matching widths — see
    # test_las_reclassify_computed_equals_general)
    declined(
        df.withColumn(
            "intensity",
            F.round(F.col("intensity").cast("double") * F.lit(2.0), 0).cast(
                "int"
            ),
        )
    )
    # log is NOT correctly rounded across platforms — stays outside the
    # node set (sqrt/abs joined it in round 12)
    declined(df.withColumn("x", F.log(F.col("x").cast("double")).cast("int")))


def test_regrid_ansi_overflow_fails_like_general_sink(spark, tiles, tmp_path):
    """A re-grid that overflows int32: under ANSI (Spark 4 default) the
    general sink's job fails with CAST_OVERFLOW — the fused byte path must
    also FAIL (worker-side ArithmeticError), never silently saturate."""
    from py4j.protocol import Py4JJavaError

    from spark_iqmulus_spark.functions.scaled import regrid

    scale, offset = (1e-12, 1e-12, 1e-12), (0.0, 0.0, 0.0)
    opts = _grid_opts(scale, offset)

    def df_fn():
        return regrid(spark.read.format("las").load(tiles), scale, offset)

    with pytest.raises(Exception) as exc_f:
        df_fn().write.format("las").mode("overwrite").options(**opts).save(
            str(tmp_path / "of")
        )
    assert "CAST_OVERFLOW" in str(exc_f.value)
    with pytest.raises((Exception, Py4JJavaError)) as exc_g:
        df_fn().write.format("las").mode("overwrite").options(**opts).option(
            "fusedWrite", "false"
        ).save(str(tmp_path / "og"))
    assert "CAST_OVERFLOW" in str(exc_g.value)


def test_regrid_with_projection_fuses_and_equals_general(spark, tiles, tmp_path):
    """select(subset) + regrid in one Project: re-encode onto the smallest
    covering format AND replay the computed x — both at once."""
    from spark_iqmulus_spark.functions.scaled import regrid
    from spark_iqmulus_spark.sources import fused_write as fw
    from spark_iqmulus_spark.sources.las_format import LasHeader

    scale, offset = (0.005, 0.01, 0.01), (2.0, 0.0, 0.0)
    opts = _grid_opts(scale, offset)

    def df_fn():
        df = (
            spark.read.format("las")
            .load(tiles)
            .where(F.col("intensity") <= 2000)
            .select("fid", "x", "y", "z", "intensity")
        )
        # only x moves grid; y/z stay on the source grid (per-axis gate)
        return regrid(df, scale, offset, names=("x",))

    assert (
        fw.plan_fused_save(
            df_fn(), "las", str(tmp_path / "p"), "overwrite", dict(opts)
        )
        is not None
    ), fw._LAST_DECLINE
    outg, outf = str(tmp_path / "prg"), str(tmp_path / "prf")
    df_fn().write.format("las").mode("overwrite").options(**opts).option(
        "fusedWrite", "false"
    ).save(outg)
    df_fn().write.format("las").mode("overwrite").options(**opts).save(outf)
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)
    for nm in _names(outf):
        hf = LasHeader.parse_file(os.path.join(outf, nm))
        hg = LasHeader.parse_file(os.path.join(outg, nm))
        assert hf.pdr_format == hg.pdr_format == 0
        assert hf.scale == hg.scale == scale
        assert (hf.pdr_nb, hf.pmin, hf.pmax) == (hg.pdr_nb, hg.pmin, hg.pmax)


def test_fused_ply_recenter_write_equals_general(spark, ply_tiles, tmp_path):
    """Round 12 (VERDICT r11 weak #2 follow-through): a computed PLY
    column the exprprog can replay — recenter x, rescale z, both cast
    back to float — takes the byte path and matches the general sink
    row-for-row; the output header keeps f4 storage."""
    from spark_iqmulus_spark.sources import fused_write as fw
    from spark_iqmulus_spark.sources.ply_format import PlyHeader

    def df_fn():
        return (
            spark.read.format("ply")
            .load(ply_tiles)
            .where(F.col("y") < 80.0)
            .withColumn("x", (F.col("x") - F.lit(50.0)).cast("float"))
            .withColumn("z", (F.col("z") * F.lit(0.125)).cast("float"))
        )

    assert (
        fw.plan_fused_save(df_fn(), "ply", str(tmp_path / "pr"), "overwrite", {})
        is not None
    ), fw._LAST_DECLINE
    outg = str(tmp_path / "plyr_general")
    outf = str(tmp_path / "plyr_fused")
    df_fn().write.format("ply").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("ply").mode("overwrite").save(outf)
    assert sorted(os.listdir(outg)) == sorted(os.listdir(outf))  # incl _manifest
    rows = _ply_rows(spark, outf)
    assert rows and rows == _ply_rows(spark, outg)
    for nm in sorted(f for f in os.listdir(outf) if f.endswith(".ply")):
        hf = PlyHeader.parse_file(os.path.join(outf, nm))
        hg = PlyHeader.parse_file(os.path.join(outg, nm))
        lay_f = [(p.name, p.np_char) for p in hf.element("vertex").properties]
        lay_g = [(p.name, p.np_char) for p in hg.element("vertex").properties]
        assert lay_f == lay_g == [("x", "f4"), ("y", "f4"), ("z", "f4")]


def test_fused_ply_computed_double_widens_like_general(spark, ply_tiles, tmp_path):
    """An UNCAST double expression over a float property widens it to f8
    on the general sink; the byte path must produce the same widened
    layout and the same values (f4→f8 leaf widening is exact)."""
    from spark_iqmulus_spark.sources import fused_write as fw
    from spark_iqmulus_spark.sources.ply_format import PlyHeader

    def df_fn():
        return (
            spark.read.format("ply")
            .load(ply_tiles)
            .withColumn("x", F.col("x") * F.lit(0.5) + F.lit(3.0))
        )

    assert (
        fw.plan_fused_save(df_fn(), "ply", str(tmp_path / "pw"), "overwrite", {})
        is not None
    ), fw._LAST_DECLINE
    outg = str(tmp_path / "plyw_general")
    outf = str(tmp_path / "plyw_fused")
    df_fn().write.format("ply").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("ply").mode("overwrite").save(outf)
    rows = _ply_rows(spark, outf)
    assert rows and rows == _ply_rows(spark, outg)
    for nm in sorted(f for f in os.listdir(outf) if f.endswith(".ply")):
        hf = PlyHeader.parse_file(os.path.join(outf, nm))
        lay = [(p.name, p.np_char) for p in hf.element("vertex").properties]
        assert lay == [("x", "f8"), ("y", "f4"), ("z", "f4")]
        hg = PlyHeader.parse_file(os.path.join(outg, nm))
        assert lay == [
            (p.name, p.np_char) for p in hg.element("vertex").properties
        ]


def test_fused_pcd_computed_float_and_int_equals_general(spark, tmp_path):
    """PCD twin: a recentered float field AND an int-rooted computed field
    (round(label·2.5) cast int — ANSI path, the general sink's own cast)
    in one plan, fused and equal to the general sink."""
    from .fixtures import make_pcd
    from spark_iqmulus_spark.sources import fused_write as fw
    from spark_iqmulus_spark.sources.pcd_format import PcdHeader

    d = tmp_path / "pcdr_tiles"
    d.mkdir()
    make_pcd(str(d / "ra.pcd"), n=600, seed=7)
    make_pcd(str(d / "rb.pcd"), n=400, seed=8)

    def df_fn():
        return (
            spark.read.format("pcd")
            .load(str(d))
            .where(F.col("y") >= 10.0)
            .withColumn("x", (F.col("x") - F.lit(50.0)).cast("float"))
            .withColumn("label", F.round(F.col("label") * F.lit(2.5), 0).cast("int"))
        )

    assert (
        fw.plan_fused_save(df_fn(), "pcd", str(tmp_path / "pc"), "overwrite", {})
        is not None
    ), fw._LAST_DECLINE
    outg = str(tmp_path / "pcdr_general")
    outf = str(tmp_path / "pcdr_fused")
    df_fn().write.format("pcd").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("pcd").mode("overwrite").save(outf)

    def _pcd_rows(path):
        return sorted(
            map(
                tuple,
                spark.read.format("pcd").load(path).drop("fid", "pid").collect(),
            )
        )

    rows = _pcd_rows(outf)
    assert rows and rows == _pcd_rows(outg)
    for nm in sorted(f for f in os.listdir(outf) if f.endswith(".pcd")):
        hf = PcdHeader.parse_file(os.path.join(outf, nm))
        hg = PcdHeader.parse_file(os.path.join(outg, nm))
        assert [(f.name, f.np_char) for f in hf.fields] == [
            (f.name, f.np_char) for f in hg.fields
        ] == [("x", "f4"), ("y", "f4"), ("z", "f4"), ("label", "i4")]


def test_fused_ply_cross_column_affine_equals_general(spark, ply_tiles, tmp_path):
    """Round 12 multi-column programs: an affine transform referencing
    SEVERAL columns of the record (x' = x + 0.25·y − 2, y' from x) fuses
    and matches the general sink — both computed columns replay over the
    PRE-projection source values, so y' sees the original x even though
    x is itself recomputed in the same projection."""
    from spark_iqmulus_spark.sources import fused_write as fw

    def df_fn():
        return (
            spark.read.format("ply")
            .load(ply_tiles)
            .where(F.col("z") > 5.0)
            .select(
                "fid",
                (F.col("x") + F.lit(0.25) * F.col("y") - F.lit(2.0))
                .cast("float")
                .alias("x"),
                (F.col("x") * F.lit(0.5)).cast("float").alias("y"),
                "z",
            )
        )

    assert (
        fw.plan_fused_save(df_fn(), "ply", str(tmp_path / "af"), "overwrite", {})
        is not None
    ), fw._LAST_DECLINE
    outg = str(tmp_path / "plyaf_general")
    outf = str(tmp_path / "plyaf_fused")
    df_fn().write.format("ply").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("ply").mode("overwrite").save(outf)
    rows = _ply_rows(spark, outf)
    assert rows and rows == _ply_rows(spark, outg)


def test_las_rotation_computed_fuses_and_equals_general(spark, tiles, tmp_path):
    """Cross-axis LAS programs (rotation las2las): x' computed from BOTH
    x and y in one Project fuses — both programs replay over the
    pre-projection raw record — and matches the general sink, header
    bounds included."""
    from spark_iqmulus_spark.sources import fused_write as fw
    from spark_iqmulus_spark.sources.las_format import LasHeader

    c, s = 0.6, 0.8  # exact-in-double rotation-ish coefficients

    def df_fn():
        xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
        return (
            spark.read.format("las")
            .load(tiles)
            .select(
                "fid",
                F.round(xd * F.lit(c) - yd * F.lit(s), 0).cast("int").alias("x"),
                F.round(xd * F.lit(s) + yd * F.lit(c), 0).cast("int").alias("y"),
                "z",
                "intensity",
            )
        )

    assert (
        fw.plan_fused_save(df_fn(), "las", str(tmp_path / "rot"), "overwrite", {})
        is not None
    ), fw._LAST_DECLINE
    outg = str(tmp_path / "rot_general")
    outf = str(tmp_path / "rot_fused")
    df_fn().write.format("las").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("las").mode("overwrite").save(outf)
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)
    for nm in _names(outf):
        hf = LasHeader.parse_file(os.path.join(outf, nm))
        hg = LasHeader.parse_file(os.path.join(outg, nm))
        assert (hf.pmin, hf.pmax, hf.pdr_nb) == (hg.pmin, hg.pmax, hg.pdr_nb)


def test_las_computed_from_extra_bytes_falls_back(spark, tmp_path):
    """A computed x referencing an ExtraBytes field declines: extras carry
    nodata→NULL read semantics the raw byte replay cannot reproduce."""
    from spark_iqmulus_spark.sources import fused_write as fw

    d = tmp_path / "xtiles"
    d.mkdir()
    make_las(str(d / "e.las"), n=500, fmt=1, extra=True)
    df = spark.read.format("las").load(str(d)).select(
        "fid",
        F.round(F.col("amplitude").cast("double"), 0).cast("int").alias("x"),
        "y", "z", "intensity",
    )
    assert (
        fw.plan_fused_save(df, "las", str(tmp_path / "xb"), "overwrite", {})
        is None
    )
    assert "standard fields" in (fw._LAST_DECLINE or "")


def test_ply_unreplayable_computed_falls_back(spark, ply_tiles, tmp_path):
    """log is outside the closed exprprog node set (not correctly rounded
    across platforms) → decline."""
    from spark_iqmulus_spark.sources import fused_write as fw

    df = (
        spark.read.format("ply")
        .load(ply_tiles)
        .withColumn("x", F.log(F.col("x")).cast("float"))
    )
    assert (
        fw.plan_fused_save(df, "ply", str(tmp_path / "un"), "overwrite", {})
        is None
    )
    assert "cannot replay" in (fw._LAST_DECLINE or "")


def test_fused_ply_distance_sqrt_equals_general(spark, ply_tiles, tmp_path):
    """sqrt/abs joined the node set (IEEE correctly rounded in both the
    JVM and numpy): a computed planar distance column fuses and matches
    the general sink bit-for-bit."""
    from spark_iqmulus_spark.sources import fused_write as fw

    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")

    def df_fn():
        return (
            spark.read.format("ply")
            .load(ply_tiles)
            .select(
                "fid",
                F.sqrt(xd * xd + yd * yd).cast("float").alias("x"),
                F.abs(yd - F.lit(50.0)).cast("float").alias("y"),
                "z",
            )
        )

    assert (
        fw.plan_fused_save(df_fn(), "ply", str(tmp_path / "ds"), "overwrite", {})
        is not None
    ), fw._LAST_DECLINE
    outg = str(tmp_path / "plyds_general")
    outf = str(tmp_path / "plyds_fused")
    df_fn().write.format("ply").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("ply").mode("overwrite").save(outf)
    rows = _ply_rows(spark, outf)
    assert rows and rows == _ply_rows(spark, outg)


def test_affine_helper_fuses_and_equals_general(spark, tiles, tmp_path):
    """functions.scaled.affine builds the world-space transform + re-grid
    as one Project inside the exprprog node set: stock write takes the
    byte path, matches the general sink, and a pure translation shifts
    the world bounds by exactly the translation."""
    from spark_iqmulus_spark.functions.scaled import affine
    from spark_iqmulus_spark.sources import fused_write as fw
    from spark_iqmulus_spark.sources.las_format import LasHeader

    mat = [[0.6, -0.8, 0.0, 12.5], [0.8, 0.6, 0.0, -3.25], [0.0, 0.0, 1.0, 0.5]]
    opts = _grid_opts((0.01, 0.01, 0.01), (0.0, 0.0, 0.0))

    def df_fn():
        return affine(spark.read.format("las").load(tiles), mat)

    assert (
        fw.plan_fused_save(
            df_fn(), "las", str(tmp_path / "afl"), "overwrite", dict(opts)
        )
        is not None
    ), fw._LAST_DECLINE
    outg, outf = str(tmp_path / "afl_general"), str(tmp_path / "afl_fused")
    df_fn().write.format("las").mode("overwrite").options(**opts).option(
        "fusedWrite", "false"
    ).save(outg)
    df_fn().write.format("las").mode("overwrite").options(**opts).save(outf)
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)
    for nm in _names(outf):
        hf = LasHeader.parse_file(os.path.join(outf, nm))
        hg = LasHeader.parse_file(os.path.join(outg, nm))
        assert (hf.pmin, hf.pmax) == (hg.pmin, hg.pmax)

    # translation-only: world bounds shift by exactly the translation
    tr = [[1.0, 0.0, 0.0, 7.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    out_t = str(tmp_path / "afl_tr")
    affine(spark.read.format("las").load(tiles), tr).write.format(
        "las"
    ).mode("overwrite").options(**opts).save(out_t)
    for nm in _names(out_t):
        h0 = LasHeader.parse_file(os.path.join(tiles, nm))
        ht = LasHeader.parse_file(os.path.join(out_t, nm))
        assert abs(ht.pmin[0] - (h0.pmin[0] + 7.0)) < 1e-6
        assert abs(ht.pmax[1] - h0.pmax[1]) < 1e-6


def test_fused_ply_clamp_when_equals_general(spark, ply_tiles, tmp_path):
    """Round 12 conditionals: when/otherwise (CaseWhen) clamping fuses —
    the predicate replays Spark's NaN-largest total order exactly."""
    from spark_iqmulus_spark.sources import fused_write as fw

    xd = F.col("x").cast("double")

    def df_fn():
        return (
            spark.read.format("ply")
            .load(ply_tiles)
            .withColumn(
                "x",
                F.when(xd > F.lit(80.0), F.lit(80.0))
                .when(xd < F.lit(20.0), F.lit(20.0))
                .otherwise(xd)
                .cast("float"),
            )
        )

    assert (
        fw.plan_fused_save(df_fn(), "ply", str(tmp_path / "cl"), "overwrite", {})
        is not None
    ), fw._LAST_DECLINE
    outg = str(tmp_path / "plycl_general")
    outf = str(tmp_path / "plycl_fused")
    df_fn().write.format("ply").option("fusedWrite", "false").mode(
        "overwrite"
    ).save(outg)
    df_fn().write.format("ply").mode("overwrite").save(outf)
    rows = _ply_rows(spark, outf)
    assert rows and rows == _ply_rows(spark, outg)
    xs = [r[0] for r in rows]
    assert min(xs) >= 20.0 and max(xs) <= 80.0  # the clamp actually ran

    # missing otherwise → NULL else branch → decline to the general sink
    df2 = (
        spark.read.format("ply")
        .load(ply_tiles)
        .withColumn("x", F.when(xd > F.lit(80.0), F.lit(80.0)).cast("float"))
    )
    assert (
        fw.plan_fused_save(df2, "ply", str(tmp_path / "cl2"), "overwrite", {})
        is None
    )


def test_las_clamp_if_equals_general(spark, tiles, tmp_path):
    """LAS int-rooted clamp through a conditional, incl. an And predicate."""
    xd = F.col("x").cast("double")

    def df_fn():
        return (
            spark.read.format("las")
            .load(tiles)
            .withColumn(
                "x",
                F.when(
                    (xd > F.lit(-500000.0)) & (xd < F.lit(500000.0)), xd
                )
                .otherwise(F.lit(0.0))
                .cast("int"),
            )
        )

    outg, outf = _both(spark, df_fn, tmp_path, "clamp")
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)


def test_las_reclassify_computed_equals_general(spark, tiles, tmp_path):
    """Round 12 int-width roots: the las2las RECLASSIFY shape — a
    conditional over the tinyint classification written back through a
    tinyint root — and a smallint-rooted intensity rescale, both fused
    and equal to the general sink."""
    from spark_iqmulus_spark.sources import fused_write as fw

    def df_fn():
        return (
            spark.read.format("las")
            .load(tiles)
            .withColumn(
                "classification",
                F.when(F.col("classification") == 3, F.lit(0))
                .otherwise(F.col("classification"))
                .cast("tinyint"),
            )
            .withColumn(
                "intensity",
                F.round(F.col("intensity").cast("double") / F.lit(2.0), 0)
                .cast("smallint"),
            )
        )

    assert (
        fw.plan_fused_save(df_fn(), "las", str(tmp_path / "rc"), "overwrite", {})
        is not None
    ), fw._LAST_DECLINE
    outg, outf = _both(spark, df_fn, tmp_path, "reclass")
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)
    back = spark.read.format("las").load(outf)
    assert back.where(F.col("classification") == 3).count() == 0  # reclassified
    assert back.where(F.col("classification") == 0).count() > 0


def test_computed_from_unsigned_storage_uses_signed_view(spark, tmp_path):
    """Regression (round-12 self-review): a program referencing a column
    with UNSIGNED storage (LAS intensity, u2) must replay the reader's
    same-width SIGNED view — raw 65535 is schema −1; reading the raw
    bits would compute from 65535 and diverge on every sign-bit value."""
    src = str(tmp_path / "neg_src")
    spark.createDataFrame(
        [(i, (-1 if i % 2 else 1000)) for i in range(64)],
        "x int, intensity smallint",
    ).write.format("las").mode("overwrite").save(src)

    def df_fn():
        return (
            spark.read.format("las")
            .load(src)
            .withColumn(
                "y",
                F.round(F.col("intensity").cast("double"), 0).cast("int"),
            )
        )

    from spark_iqmulus_spark.sources import fused_write as fw

    assert (
        fw.plan_fused_save(df_fn(), "las", str(tmp_path / "sv"), "overwrite", {})
        is not None
    ), fw._LAST_DECLINE
    outg, outf = _both(spark, df_fn, tmp_path, "signedview")
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)
    ys = sorted({r[1] for r in rows})
    assert ys == [-1, 1000]  # the signed view, not raw 65535


def test_ply_computed_new_column_falls_back(spark, ply_tiles, tmp_path):
    """Round-12 self-review: a computed NEW column (not a stored source
    property) has no byte-path layout — must DECLINE to the general
    sink, not crash mid-save with a transcode ValueError."""
    from spark_iqmulus_spark.sources import fused_write as fw

    df = (
        spark.read.format("ply")
        .load(ply_tiles)
        .withColumn("range", (F.col("x") * F.lit(2.0)).cast("float"))
    )
    assert (
        fw.plan_fused_save(df, "ply", str(tmp_path / "nc"), "overwrite", {})
        is None
    )
    assert "not a stored source" in (fw._LAST_DECLINE or "")
    out = str(tmp_path / "ply_newcol")
    df.write.format("ply").mode("overwrite").save(out)  # general sink works
    back = spark.read.format("ply").load(out)
    assert "range" in back.columns and back.count() == df.count()


def test_voxelize_write_fuses_and_equals_general(spark, tiles, tmp_path):
    """Round 13 (VERDICT r12 next #3): the voxelize/decimate shape
    ``floor((world − origin)/size).cast('int')`` engages the byte path —
    Floor joined exprprog's node set, and the bigint-rooted cast replays
    with JVM l2i semantics — and matches the general sink row-for-row
    and header-for-header."""
    from spark_iqmulus_spark.functions.scaled import voxelize
    from spark_iqmulus_spark.sources import fused_write as fw
    from spark_iqmulus_spark.sources.las_format import LasHeader

    size, origin = (0.5, 0.25, 0.5), (0.0, 0.0, -5.0)
    opts = _grid_opts(size, origin)

    def df_fn():
        return voxelize(
            spark.read.format("las").load(tiles).where(
                F.col("classification") <= 3
            ),
            size,
            origin,
        )

    assert (
        fw.plan_fused_save(
            df_fn(), "las", str(tmp_path / "v"), "overwrite", dict(opts)
        )
        is not None
    ), fw._LAST_DECLINE
    outg, outf = str(tmp_path / "vx_general"), str(tmp_path / "vx_fused")
    df_fn().write.format("las").mode("overwrite").options(**opts).option(
        "fusedWrite", "false"
    ).save(outg)
    df_fn().write.format("las").mode("overwrite").options(**opts).save(outf)
    assert _names(outg) == _names(outf) == ["tile_a.las", "tile_b.las"]
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)
    for nm in _names(outf):
        hf = LasHeader.parse_file(os.path.join(outf, nm))
        hg = LasHeader.parse_file(os.path.join(outg, nm))
        assert hf.scale == hg.scale == size
        assert hf.offset == hg.offset == origin
        assert (hf.pdr_nb, hf.pmin, hf.pmax, hf.pdr_return_nb) == (
            hg.pdr_nb, hg.pmin, hg.pmax, hg.pdr_return_nb
        )


def test_ceil_write_fuses_and_equals_general(spark, tiles, tmp_path):
    """Ceil is admitted symmetrically with Floor (same correctly-rounded
    argument); ceil(world/s).cast('int') fuses and matches the sink."""
    from spark_iqmulus_spark.sources import fused_write as fw

    opts = _grid_opts((0.5, 0.01, 0.01), (0.0, 0.0, 0.0))

    def df_fn():
        df = spark.read.format("las").load(tiles)
        return df.withColumn(
            "x",
            F.ceil(F.col("x").cast("double") * F.lit(0.01) / F.lit(0.5))
            .cast("int"),
        )

    assert (
        fw.plan_fused_save(
            df_fn(), "las", str(tmp_path / "c"), "overwrite", dict(opts)
        )
        is not None
    ), fw._LAST_DECLINE
    outg, outf = str(tmp_path / "cl_general"), str(tmp_path / "cl_fused")
    df_fn().write.format("las").mode("overwrite").options(**opts).option(
        "fusedWrite", "false"
    ).save(outg)
    df_fn().write.format("las").mode("overwrite").options(**opts).save(outf)
    rows = _rows(spark, outf)
    assert rows and rows == _rows(spark, outg)


def test_floor_over_unreplayable_child_falls_back(spark, tiles, tmp_path):
    """floor over a child OUTSIDE the closed node set (log) declines to
    the general sink — the gate composes, it does not blanket-admit
    floor-rooted trees."""
    from spark_iqmulus_spark.sources import fused_write as fw

    df = spark.read.format("las").load(tiles).withColumn(
        "x",
        F.floor(F.log(F.col("x").cast("double") + F.lit(2.0e9))).cast("int"),
    )
    opts = _grid_opts((0.01, 0.01, 0.01), (0.0, 0.0, 0.0))
    assert (
        fw.plan_fused_save(df, "las", str(tmp_path / "d"), "overwrite", dict(opts))
        is None
    )
    assert "replay" in (fw._LAST_DECLINE or "")
