"""PCD DataSource tests: header codec, all three DATA layouts, COUNT
expansion, write round-trip with fid name restore, LZF codec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from spark_iqmulus_spark.sources.pcd_format import (
    PcdField,
    PcdHeader,
    lzf_compress_literal,
    lzf_decompress,
)


def _write_binary_pcd(path: str, n: int = 100, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    arr = np.empty(
        n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("label", "<u4")]
    )
    arr["x"] = rng.uniform(-50, 50, n).astype(np.float32)
    arr["y"] = rng.uniform(-50, 50, n).astype(np.float32)
    arr["z"] = rng.uniform(0, 20, n).astype(np.float32)
    arr["label"] = rng.integers(0, 10, n, dtype=np.uint32)
    hdr = PcdHeader(
        fields=[
            PcdField("x", "f4"),
            PcdField("y", "f4"),
            PcdField("z", "f4"),
            PcdField("label", "u4"),
        ],
        width=n,
        points=n,
        data_kind="binary",
    )
    with open(path, "wb") as f:
        f.write(hdr.to_bytes())
        f.write(arr.tobytes())
    return arr


def test_header_parse_roundtrip(tmp_path):
    p = str(tmp_path / "a.pcd")
    _write_binary_pcd(p, n=7)
    hdr = PcdHeader.parse_file(p)
    assert [f.name for f in hdr.fields] == ["x", "y", "z", "label"]
    assert [f.np_char for f in hdr.fields] == ["f4", "f4", "f4", "u4"]
    assert hdr.points == 7 and hdr.stride == 16 and hdr.data_kind == "binary"
    assert hdr.info()["points"] == 7


def test_count_expansion():
    buf = (
        b"VERSION 0.7\nFIELDS x normal\nSIZE 4 4\nTYPE F F\nCOUNT 1 3\n"
        b"WIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\nDATA binary\n"
    )
    hdr = PcdHeader.parse(buf)
    assert [f.name for f in hdr.fields] == ["x", "normal_0", "normal_1", "normal_2"]
    assert hdr.stride == 16


def test_lzf_roundtrip():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes()
    assert lzf_decompress(lzf_compress_literal(data), len(data)) == data
    # a stream with real back-references (hand-built): 3 literals then a
    # 4-byte overlapping copy at distance 1 → "abc" + "cccc"
    stream = bytes([0x02]) + b"abc" + bytes([(2 << 5) | 0x00, 0x00])
    assert lzf_decompress(stream, 7) == b"abccccc"[:7]


def test_binary_read(spark, tmp_path):
    p = str(tmp_path / "a.pcd")
    arr = _write_binary_pcd(p, n=4321)
    df = spark.read.format("pcd").load(p)
    assert df.columns == ["fid", "pid", "x", "y", "z", "label"]
    assert df.count() == 4321
    row = df.agg(
        F.min("x"), F.max("x"), F.sum(F.col("z").cast("double")), F.sum("label")
    ).collect()[0]
    assert row[0] == pytest.approx(float(arr["x"].min()))
    assert row[1] == pytest.approx(float(arr["x"].max()))
    assert row[2] == pytest.approx(float(arr["z"].astype(np.float64).sum()), rel=1e-9)
    assert row[3] == int(arr["label"].sum())


def test_binary_read_split_partitions(spark, tmp_path):
    """Record-aligned splits: a small partition_bytes must not change results."""
    p = str(tmp_path / "a.pcd")
    arr = _write_binary_pcd(p, n=5000, seed=1)
    df = spark.read.format("pcd").option("partition_bytes", "4096").load(p)
    assert df.count() == 5000
    got = df.agg(F.sum(F.col("x").cast("double"))).collect()[0][0]
    assert got == pytest.approx(float(arr["x"].astype(np.float64).sum()), rel=1e-9)
    # pid stays a dense 0..n-1 index across splits
    assert df.agg(F.countDistinct("pid")).collect()[0][0] == 5000


def test_ascii_read(spark, tmp_path):
    p = str(tmp_path / "a.pcd")
    hdr = PcdHeader(
        fields=[PcdField("x", "f4"), PcdField("y", "f4"), PcdField("c", "i4")],
        width=3,
        points=3,
        data_kind="ascii",
    )
    with open(p, "wb") as f:
        f.write(hdr.to_bytes())
        f.write(b"1.5 2.5 7\n-3.25 0 8\n10 20 9\n")
    df = spark.read.format("pcd").load(p)
    rows = sorted(df.select("x", "y", "c").collect())
    assert rows[0] == (-3.25, 0.0, 8)
    assert rows[2] == (10.0, 20.0, 9)


def test_binary_compressed_read(spark, tmp_path):
    p = str(tmp_path / "a.pcd")
    n = 500
    rng = np.random.default_rng(5)
    x = rng.uniform(-10, 10, n).astype("<f4")
    lab = rng.integers(0, 100, n).astype("<i4")
    soa = x.tobytes() + lab.tobytes()  # field-major layout
    comp = lzf_compress_literal(soa)
    hdr = PcdHeader(
        fields=[PcdField("x", "f4"), PcdField("label", "i4")],
        width=n,
        points=n,
        data_kind="binary_compressed",
    )
    with open(p, "wb") as f:
        f.write(hdr.to_bytes())
        f.write(struct.pack("<II", len(comp), len(soa)))
        f.write(comp)
    df = spark.read.format("pcd").load(p)
    assert df.count() == n
    row = df.agg(F.sum(F.col("x").cast("double")), F.sum("label")).collect()[0]
    assert row[0] == pytest.approx(float(x.astype(np.float64).sum()), rel=1e-9)
    assert row[1] == int(lab.sum())


def test_write_roundtrip_and_schema_merge(spark, tmp_path):
    src = str(tmp_path / "src")
    p1, p2 = str(tmp_path / "t1.pcd"), str(tmp_path / "t2.pcd")
    a1 = _write_binary_pcd(p1, n=300, seed=1)
    a2 = _write_binary_pcd(p2, n=200, seed=2)
    df = spark.read.format("pcd").load(str(tmp_path))
    out = str(tmp_path / "out")
    df.write.format("pcd").mode("overwrite").save(out)
    # fid provenance restores one output file per source basename
    import os

    assert sorted(f for f in os.listdir(out) if f.endswith(".pcd")) == [
        "t1.pcd",
        "t2.pcd",
    ]
    back = spark.read.format("pcd").load(out)
    assert back.count() == 500
    want = float(np.concatenate([a1["x"], a2["x"]]).astype(np.float64).sum())
    got = back.agg(F.sum(F.col("x").cast("double"))).collect()[0][0]
    assert got == pytest.approx(want, rel=1e-9)
    assert src  # silence unused warning if layout changes


def test_header_catalog(spark, tmp_path):
    from spark_iqmulus_spark.plans.header_catalog import (
        count_from_headers,
        pcd_headers,
        scan_report,
    )

    p1, p2 = str(tmp_path / "a.pcd"), str(tmp_path / "b.pcd")
    _write_binary_pcd(p1, n=120)
    _write_binary_pcd(p2, n=80)
    cat = pcd_headers(spark, [p1, p2])
    assert cat.count() == 2
    assert {r.points for r in cat.collect()} == {120, 80}
    assert count_from_headers(spark, [p1, p2], fmt="pcd") == 200
    rep = scan_report([p1, p2], fmt="pcd")
    assert rep["readable_count"] == 2 and rep["skipped_count"] == 0


def test_corrupt_file_skip_and_strict(spark, tmp_path):
    good = str(tmp_path / "good.pcd")
    bad = str(tmp_path / "bad.pcd")
    _write_binary_pcd(good, n=50)
    with open(bad, "wb") as f:
        f.write(b"not a pcd header at all\n")
    # default: skip with warning
    assert spark.read.format("pcd").load(str(tmp_path)).count() == 50
    # strict: fail fast
    with pytest.raises(Exception):
        spark.read.format("pcd").option(
            "ignoreCorruptFiles", "false"
        ).load(str(tmp_path)).count()


def test_binary_compressed_count_multi(spark, tmp_path):
    """SoA layout of a COUNT=3 field is ONE n*3-element block with each
    point's elements adjacent — not three contiguous n-element blocks
    (regression: expanded scalars decoded scrambled)."""
    p = str(tmp_path / "a.pcd")
    n = 4
    x = np.array([10.0, 20.0, 30.0, 40.0], dtype="<f4")
    # normals per point: point i has (i.1, i.2, i.3)
    normal = np.array(
        [[i + 0.1, i + 0.2, i + 0.3] for i in range(n)], dtype="<f4"
    )
    soa = x.tobytes() + normal.tobytes()  # field-major, point-adjacent
    comp = lzf_compress_literal(soa)
    hdr_text = (
        b"VERSION 0.7\nFIELDS x normal\nSIZE 4 4\nTYPE F F\nCOUNT 1 3\n"
        b"WIDTH 4\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 4\n"
        b"DATA binary_compressed\n"
    )
    with open(p, "wb") as f:
        f.write(hdr_text)
        f.write(struct.pack("<II", len(comp), len(soa)))
        f.write(comp)
    df = spark.read.format("pcd").load(p)
    rows = df.orderBy("pid").select(
        "x", "normal_0", "normal_1", "normal_2"
    ).collect()
    for i, row in enumerate(rows):
        assert row[0] == pytest.approx(x[i])
        assert row[1] == pytest.approx(i + 0.1)
        assert row[2] == pytest.approx(i + 0.2)
        assert row[3] == pytest.approx(i + 0.3)


def test_ascii_int64_precision(spark, tmp_path):
    """8-byte integer ascii columns must not round-trip through float64
    (values above 2^53 would silently round)."""
    p = str(tmp_path / "a.pcd")
    big = 2**60 + 1  # not representable in float64
    hdr = PcdHeader(
        fields=[PcdField("x", "f4"), PcdField("t", "i8")],
        width=2,
        points=2,
        data_kind="ascii",
    )
    with open(p, "wb") as f:
        f.write(hdr.to_bytes())
        f.write(f"1.5 {big}\n2.5 {-big}\n".encode())
    rows = sorted(
        spark.read.format("pcd").load(p).select("x", "t").collect()
    )
    assert rows[0] == (1.5, big)
    assert rows[1] == (2.5, -big)


def test_ascii_zero_points(spark, tmp_path):
    """POINTS 0 must yield an empty result, not ingest trailing bytes."""
    p = str(tmp_path / "a.pcd")
    hdr = PcdHeader(
        fields=[PcdField("x", "f4")], width=0, points=0, data_kind="ascii"
    )
    with open(p, "wb") as f:
        f.write(hdr.to_bytes())
    df = spark.read.format("pcd").schema("fid int, pid long, x float").load(p)
    assert df.count() == 0
