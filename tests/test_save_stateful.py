"""Tests for direct-save helpers / fid-partitioned write-back (A17/A20) and
the custom stateful streaming operator."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .fixtures import make_las, make_ply_xyz


def test_save_helpers(spark, tmp_path):
    from spark_iqmulus_spark.sources.save import save_las, save_ply

    src = str(tmp_path / "s.las")
    make_las(src, n=500, fmt=1)
    df = spark.read.format("las").load(src)
    out = str(tmp_path / "saved_las")
    save_las(df, out, lasformat=1)
    assert spark.read.format("las").load(out).count() == 500

    psrc = str(tmp_path / "s.ply")
    make_ply_xyz(psrc, n=300)
    pdf = spark.read.format("ply").load(psrc)
    pout = str(tmp_path / "saved_ply")
    save_ply(pdf, pout)
    assert spark.read.format("ply").load(pout).count() == 300


def test_save_partitioned_by_fid_restores_names(spark, tmp_path):
    """A17 rename semantics: one output per source file, original base name,
    from a SINGLE distributed job (no per-fid rescan of the input)."""
    from spark_iqmulus_spark.sources.save import save_partitioned_by_fid

    a, b = str(tmp_path / "tile_a.las"), str(tmp_path / "tile_b.las")
    make_las(a, n=120, fmt=0, seed=1)
    make_las(b, n=80, fmt=0, seed=2)
    df = spark.read.format("las").load([a, b])
    out = str(tmp_path / "writeback")
    written = save_partitioned_by_fid(df, out, fmt="las", lasformat=0)
    assert sorted(os.path.basename(w) for w in written) == [
        "tile_a.las",
        "tile_b.las",
    ]
    assert spark.read.format("las").load(os.path.join(out, "tile_a.las")).count() == 120
    assert spark.read.format("las").load(os.path.join(out, "tile_b.las")).count() == 80

    # xyz path: partitionBy single job + dir rename
    xout = str(tmp_path / "writeback_xyz")
    xw = save_partitioned_by_fid(df, xout, fmt="xyz")
    assert sorted(os.path.basename(w) for w in xw) == ["tile_a", "tile_b"]
    from spark_iqmulus_spark.sources.xyz import read_xyz

    assert (
        read_xyz(spark, os.path.join(xout, "tile_a"), df.drop("fid", "pid").schema).count()
        == 120
    )


def test_ply_writer_restores_source_names(spark, tmp_path):
    """A17 commit-rename parity (PlyRelation.scala:65-72): writing a
    DataFrame that carries fid provenance produces one output .ply per
    source fid, named after the source file; fid-less input keeps one
    data.ply."""
    a, b = str(tmp_path / "tile_a.ply"), str(tmp_path / "tile_b.ply")
    make_ply_xyz(a, n=40)
    make_ply_xyz(b, n=60)
    df = spark.read.format("ply").load([a, b])
    out = str(tmp_path / "writeback")
    df.write.format("ply").mode("overwrite").save(out)
    assert sorted(f for f in os.listdir(out) if f.endswith(".ply")) == [
        "tile_a.ply",
        "tile_b.ply",
    ]
    assert spark.read.format("ply").load(os.path.join(out, "tile_a.ply")).count() == 40
    assert spark.read.format("ply").load(os.path.join(out, "tile_b.ply")).count() == 60

    # fid-less frame (e.g. synthesized) → single merged data.ply, as before
    plain = df.drop("fid", "pid")
    out2 = str(tmp_path / "plain")
    plain.write.format("ply").mode("overwrite").save(out2)
    assert [f for f in os.listdir(out2) if f.endswith(".ply")] == ["data.ply"]
    assert spark.read.format("ply").load(out2).count() == 100

    # LAS writer: same rename semantics, with per-tile header stats
    la, lb = str(tmp_path / "cloud_a.las"), str(tmp_path / "cloud_b.las")
    make_las(la, n=30, fmt=0, seed=3)
    make_las(lb, n=50, fmt=0, seed=4)
    ldf = spark.read.format("las").load([la, lb])
    lout = str(tmp_path / "las_writeback")
    ldf.write.format("las").mode("overwrite").option("lasformat", "0").save(lout)
    assert sorted(f for f in os.listdir(lout) if f.endswith(".las")) == [
        "cloud_a.las",
        "cloud_b.las",
    ]
    back_a = spark.read.format("las").load(os.path.join(lout, "cloud_a.las"))
    assert back_a.count() == 30
    # per-tile header point count is right (metadata catalog agrees)
    from spark_iqmulus_spark.plans.header_catalog import las_headers

    cat = las_headers(spark, [os.path.join(lout, "cloud_b.las")])
    assert cat.collect()[0]["pdr_nb"] == 50


def test_save_tiled_las(spark, tmp_path):
    """Distributed retile: one .las per occupied grid cell from a single
    write job, each with correct per-tile count and header bounds."""
    from spark_iqmulus_spark.sources.las_format import LasHeader
    from spark_iqmulus_spark.sources.save import save_tiled_las

    src = str(tmp_path / "cloud.las")
    make_las(src, n=4000, fmt=0)
    df = spark.read.format("las").load(src)
    out = str(tmp_path / "tiles")
    # x is int32 in raw units; pick cells that split the data into a grid
    xr = df.agg(F.min("x"), F.max("x"), F.min("y"), F.max("y")).collect()[0]
    cx = (xr[1] - xr[0]) / 2 + 1
    cy = (xr[3] - xr[2]) / 2 + 1
    written = save_tiled_las(df, out, (cx, cy), lasformat=0)
    files = sorted(f for f in os.listdir(out) if f.endswith(".las"))
    assert files == sorted(os.path.basename(w) for w in written)
    assert 1 < len(files) <= 9
    total = 0
    for f in files:
        hdr = LasHeader.parse_file(os.path.join(out, f))
        n = spark.read.format("las").load(os.path.join(out, f)).count()
        assert hdr.pdr_nb == n  # per-tile header count is per-tile truth
        total += n
    assert total == 4000  # exhaustive, disjoint
    # tiles are spatially disjoint: each file's x-bounds fit its cell width
    for f in files:
        hdr = LasHeader.parse_file(os.path.join(out, f))
        assert (hdr.pmax[0] - hdr.pmin[0]) <= cx * 0.01 + 1e-6  # scale 0.01


def test_save_tiled_las_is_driver_enumeration_free():
    """Scale pin (VERDICT r4 item 2): the tile path must not enumerate
    occupied tiles on the driver — at 100 TB a fine grid is 10⁶-10⁷ cells.
    The only permitted driver-side listing is the post-write os.listdir for
    the return value."""
    import inspect

    from spark_iqmulus_spark.sources import save

    src = inspect.getsource(save.save_tiled_las)
    assert ".collect()" not in src and ".toPandas()" not in src
    src_fid = inspect.getsource(save.save_partitioned_by_fid)
    # one distributed job: no per-fid filtered writes in a driver loop
    assert ".where(" not in src_fid and ".filter(" not in src_fid


def test_save_tiled_las_invalid_coords(spark, tmp_path):
    """Null coordinates: on_invalid='error' fails loudly (never silent
    drops); on_invalid='drop' filters and writes the rest."""
    import pytest
    from pyspark.sql import functions as F

    from spark_iqmulus_spark.sources.save import save_tiled_las

    src = str(tmp_path / "cloud.las")
    make_las(src, n=200, fmt=0)
    df = (
        spark.read.format("las")
        .load(src)
        .withColumn(
            "x", F.when(F.col("pid") < 5, None).otherwise(F.col("x"))
        )
    )
    with pytest.raises(Exception, match="null destination name"):
        save_tiled_las(df, str(tmp_path / "t_err"), (1e9, 1e9), lasformat=0)
    written = save_tiled_las(
        df, str(tmp_path / "t_drop"), (1e9, 1e9), on_invalid="drop", lasformat=0
    )
    total = sum(
        spark.read.format("las").load(w).count() for w in written
    )
    assert total == 195


def test_writer_overwrite_clears_stale_outputs(spark, tmp_path):
    """mode('overwrite') must remove previous output files even when the
    output NAME differs between runs (rename-commit makes names vary) — a
    stale data.las beside a fresh tile.las would double a re-read."""
    import pytest

    src = str(tmp_path / "tile.las")
    make_las(src, n=40, fmt=0)
    df = spark.read.format("las").load(src)
    out = str(tmp_path / "out")
    df.write.format("las").mode("overwrite").save(out)  # -> tile.las
    df.write.format("las").mode("overwrite").option(
        "restoreNames", "false"
    ).save(out)  # -> data.las, must remove tile.las
    assert sorted(f for f in os.listdir(out) if f.endswith(".las")) == ["data.las"]
    assert spark.read.format("las").load(out).count() == 40

    # non-overwrite into a non-empty dir is an error, not silent mixing
    with pytest.raises(Exception, match="already contains"):
        df.write.format("las").mode("append").save(out)


def test_stateful_running_totals(spark):
    """applyInPandasWithState totals over a replayed stream == batch groupBy."""
    from spark_iqmulus_spark.session import load_tables
    from spark_iqmulus_spark.streaming.stateful import running_user_totals

    sf = "/root/testdata/sf0.001"
    t = load_tables(spark, sf)
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    src = tempfile.mkdtemp(prefix="stateful_src_")
    os.symlink(
        os.path.abspath(f"{sf}/events.parquet"), os.path.join(src, "events.parquet")
    )
    from spark_iqmulus_spark.session import ts_micros_if_long

    stream = ts_micros_if_long(spark.readStream.schema(raw_schema).parquet(src))
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_sink")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_st_"))
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode: keep the LAST emission per key
        got = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.table("totals_sink").collect()
        }
    finally:
        q.stop()
    want = {
        r.user_id: (r.n, r.total)
        for r in t["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    assert got == want


def test_stateful_across_micro_batches(spark, tmp_path):
    """State must persist across micro-batches: 4-file source with
    maxFilesPerTrigger=1 → 4 batches; final per-key totals equal the batch
    aggregate (and some keys must appear in >1 batch for the test to mean
    anything)."""
    from spark_iqmulus_spark.session import load_tables
    from spark_iqmulus_spark.streaming.stateful import running_user_totals

    sf = "/root/testdata/sf0.001"
    t = load_tables(spark, sf)
    src = str(tmp_path / "split_events")
    raw = spark.read.parquet(f"{sf}/events.parquet")
    raw.repartition(4).write.parquet(src)
    raw_schema = raw.schema

    from spark_iqmulus_spark.session import ts_micros_if_long

    stream = ts_micros_if_long(
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_mb")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.table("totals_mb")
    # keys emitted more than once ⇒ state genuinely crossed batches
    multi = sink.groupBy("user_id").count().where(F.col("count") > 1).count()
    assert multi > 0
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .collect()
    }
    want = {
        r.user_id: (r.n, r.total)
        for r in t["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    assert got == want


def test_stream_state_v2_gated_on_protobuf(spark):
    """transformWithStateInPandas registers only where its protobuf
    dependency exists; where it does, it must match the v1 result."""
    from spark_iqmulus_spark.streaming import stateful

    if not stateful._tws_available():
        assert "q_stream_state_v2" not in stateful.QUERIES
        import pytest

        pytest.skip("google.protobuf absent: transformWithState gated off")
    v1 = {r["user_id"]: tuple(r) for r in
          stateful.q_stream_state(spark, "/root/testdata/sf0.001").collect()}
    v2 = {r["user_id"]: tuple(r) for r in
          stateful.q_stream_state_v2(spark, "/root/testdata/sf0.001").collect()}
    assert v1 == v2


def test_compact_tiles(spark, tmp_path):
    """Six small tiles bin-pack into two ~target outputs; counts and
    content survive; header catalog agrees with the scan."""
    import os

    from pyspark.sql import functions as F

    from spark_iqmulus_spark.plans.header_catalog import count_from_headers
    from spark_iqmulus_spark.sources.save import compact_tiles
    from tests.fixtures import make_las

    src = str(tmp_path / "small")
    os.makedirs(src)
    for i in range(6):
        make_las(os.path.join(src, f"t{i}.las"), n=100, fmt=1, seed=i)

    out = str(tmp_path / "big")
    written = compact_tiles(spark, src, out, target_points=250)
    names = [os.path.basename(p) for p in written]
    # 6 x 100 points at target 250 → ceil-packed into 3 files of 200
    assert names == ["compact-00000.las", "compact-00001.las", "compact-00002.las"]
    assert count_from_headers(spark, written) == 600

    a = spark.read.format("las").load(src)
    b = spark.read.format("las").load(out)
    assert b.count() == 600
    sa = a.agg(F.sum("x"), F.sum("intensity")).collect()[0]
    sb = b.agg(F.sum("x"), F.sum("intensity")).collect()[0]
    assert (sa[0], sa[1]) == (sb[0], sb[1])
