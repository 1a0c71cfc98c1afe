"""Transparent read-side header fast path (plans/fused_read.py).

Reference parity: ExtraStrategies.scala:35-76 answers stock ``df.count()``
and global ``min/max(x|y|z)`` from LAS headers with zero point bytes
scanned.  The decisive zero-scan proof here is a file whose header claims
more points than its body holds — the fast path answers the header count,
the real scan cannot."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from .fixtures import make_las, make_pcd, make_ply_xyz


@pytest.fixture()
def tiles(tmp_path):
    d = tmp_path / "tiles"
    d.mkdir()
    make_las(str(d / "a.las"), n=5000, fmt=1)
    make_las(str(d / "b.las"), n=3000, fmt=1, seed=7)
    return str(d)


def _real(df, fn):
    spark = df.sparkSession
    spark.conf.set("spark.iqmulus.fusedRead", "false")
    try:
        return fn(df)
    finally:
        spark.conf.set("spark.iqmulus.fusedRead", "true")


def test_count_matches_scan(spark, tiles):
    df = spark.read.format("las").load(tiles)
    assert df.count() == 8000 == _real(df, lambda d: d.count())


def test_count_zero_scan_proof(spark, tmp_path):
    # header claims 4000 points; the body holds only 1000 — a real scan
    # cannot produce 4000, so getting 4000 proves the headers answered
    d = tmp_path / "lying"
    d.mkdir()
    p = str(d / "t.las")
    make_las(p, n=4000, fmt=1)
    import struct

    with open(p, "rb") as f:
        blob = f.read()
    offset_to_points = struct.unpack_from("<I", blob, 96)[0]
    stride = struct.unpack_from("<H", blob, 105)[0]
    with open(p, "wb") as f:
        f.write(blob[: offset_to_points + 1000 * stride])
    df = spark.read.format("las").load(str(d))
    assert df.count() == 4000


def test_minmax_aggregate_matches_scan(spark, tiles):
    df = spark.read.format("las").load(tiles)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("mnx"),
        F.max("x").alias("mxx"),
        F.min("z").alias("mnz"),
    )
    fast = agg.collect()
    real = _real(agg, lambda d: d.collect())
    assert fast == real
    assert fast[0]["n"] == 8000


def test_sql_count_star_fast_path(spark, tiles):
    df = spark.read.format("las").load(tiles)
    df.createOrReplaceTempView("fused_read_v")
    q = spark.sql("select count(*) as c, min(y) as mn from fused_read_v")
    assert q.collect() == _real(q, lambda d: d.collect())


def test_ply_and_pcd_counts(spark, tmp_path):
    dp = tmp_path / "ply"
    dp.mkdir()
    make_ply_xyz(str(dp / "a.ply"), n=123)
    dfp = spark.read.format("ply").load(str(dp))
    assert dfp.count() == 123 == _real(dfp, lambda d: d.count())
    dc = tmp_path / "pcd"
    dc.mkdir()
    make_pcd(str(dc / "a.pcd"), n=77)
    dfc = spark.read.format("pcd").load(str(dc))
    assert dfc.count() == 77 == _real(dfc, lambda d: d.count())


def test_filter_falls_back_to_scan(spark, tiles):
    df = spark.read.format("las").load(tiles)
    n_all = df.count()
    n_f = df.where(F.col("intensity") > 100).count()
    assert 0 < n_f < n_all
    assert n_f == _real(
        df, lambda d: d.where(F.col("intensity") > 100).count()
    )


def test_projection_chain_count_still_fast(spark, tmp_path):
    # Project nodes are row-preserving: select().count() keeps the fast
    # path (proved via a lying header again)
    d = tmp_path / "lying2"
    d.mkdir()
    p = str(d / "t.las")
    make_las(p, n=2000, fmt=1)
    import struct

    with open(p, "rb") as f:
        blob = f.read()
    offset_to_points = struct.unpack_from("<I", blob, 96)[0]
    stride = struct.unpack_from("<H", blob, 105)[0]
    with open(p, "wb") as f:
        f.write(blob[: offset_to_points + 10 * stride])
    df = spark.read.format("las").load(str(d))
    assert df.select("x", "y").count() == 2000


def test_non_xyz_minmax_falls_back(spark, tiles):
    # intensity bounds are not in the header → must scan (answers match
    # trivially because the scan is the answer; assert it doesn't raise
    # and agrees with the explicit opt-out)
    df = spark.read.format("las").load(tiles)
    agg = df.agg(F.min("intensity").alias("mn"))
    assert agg.collect() == _real(agg, lambda d: d.collect())


def test_heterogeneous_grid_falls_back(spark, tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    make_las(str(d / "a.las"), n=1000, fmt=1, scale=(0.01, 0.01, 0.01))
    make_las(str(d / "b.las"), n=1000, fmt=1, scale=(0.001, 0.001, 0.001), seed=3)
    df = spark.read.format("las").load(str(d))
    agg = df.agg(F.min("x").alias("mn"), F.max("z").alias("mx"))
    assert agg.collect() == _real(agg, lambda d: d.collect())
    # count stays fast — it needs no grid
    assert df.count() == 2000


def test_read_option_opt_out(spark, tmp_path):
    # a lying header + .option("fusedRead","false") → the real scan's
    # (smaller) answer, proving the per-read opt-out reaches the gate
    d = tmp_path / "lying3"
    d.mkdir()
    p = str(d / "t.las")
    make_las(p, n=3000, fmt=1)
    import struct

    with open(p, "rb") as f:
        blob = f.read()
    offset_to_points = struct.unpack_from("<I", blob, 96)[0]
    stride = struct.unpack_from("<H", blob, 105)[0]
    with open(p, "wb") as f:
        f.write(blob[: offset_to_points + 500 * stride])
    fast = spark.read.format("las").load(str(d))
    assert fast.count() == 3000
    slow = (
        spark.read.format("las").option("fusedRead", "false").load(str(d))
    )
    try:
        n = slow.count()
    except Exception:
        n = None  # the real scan hits the truncation and fails the task
    assert n != 3000


def test_distinct_and_grouped_aggregates_fall_back(spark, tiles):
    df = spark.read.format("las").load(tiles)
    a = df.agg(F.count_distinct("fid").alias("d"))
    assert a.collect() == _real(a, lambda d: d.collect())
    g = df.groupBy("fid").agg(F.min("x").alias("mn"))
    assert sorted(map(tuple, g.collect())) == sorted(
        map(tuple, _real(g, lambda d: d.collect()))
    )


def test_minmax_through_projection_stays_fast(spark, tmp_path):
    # Aggregate over Project(attrs) over the scan: ColumnPruning inserts
    # exactly this shape — prove it still answers from headers using a
    # truncated (unscannable) file
    import struct

    d = tmp_path / "lying4"
    d.mkdir()
    p = str(d / "t.las")
    make_las(p, n=1500, fmt=1)
    with open(p, "rb") as f:
        blob = f.read()
    offset_to_points = struct.unpack_from("<I", blob, 96)[0]
    stride = struct.unpack_from("<H", blob, 105)[0]
    with open(p, "wb") as f:
        f.write(blob[: offset_to_points + 5 * stride])
    df = spark.read.format("las").load(str(d))
    row = df.select("x", "z").agg(
        F.count(F.lit(1)).alias("n"), F.min("x").alias("mn")
    ).collect()[0]
    assert row["n"] == 1500  # header count — a scan could not produce this
    assert isinstance(row["mn"], int)


def test_smart_verify_scan_bypasses_fast_path(spark, tiles):
    """Code-review r10: smart_scan(verify=True)'s cross-check scan must
    NOT be answered by the transparent header fast path — that would
    verify the headers against themselves.  The verify frame carries
    fusedRead=false, so the fast-path gate declines it."""
    from spark_iqmulus_spark.plans.fused_read import _try_header_count
    from spark_iqmulus_spark.plans.header_catalog import smart_las

    smart = smart_las(spark, tiles, verify=True)
    assert _try_header_count(smart.toDF()) is None  # real scan path
    assert smart.count() == 8000  # and the verified answer still agrees

    fast = smart_las(spark, tiles, verify=False)
    assert _try_header_count(fast.toDF()) == 8000  # non-verify stays fast
