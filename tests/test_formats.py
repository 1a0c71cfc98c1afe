"""Header-parser unit tests (the reference's test strategy, SURVEY.md §5,
replicated on synthetic fixtures) + byte-exactness invariants."""

from __future__ import annotations

import numpy as np
import pytest

from spark_iqmulus_spark.sources.las_format import (
    POINT_FORMATS,
    LasHeader,
    format_from_schema,
    format_stride,
)
from spark_iqmulus_spark.sources.ply_format import PlyHeader

from .fixtures import make_las, make_ply_xyz


# expected strides per the public LAS spec (PlySuite/LasSuite-style asserts)
EXPECTED_STRIDE = {0: 20, 1: 28, 2: 26, 3: 34, 4: 57, 5: 63, 6: 30, 7: 36, 8: 38, 9: 59, 10: 67}


def test_las_format_strides():
    for fmt, want in EXPECTED_STRIDE.items():
        assert format_stride(fmt) == want, fmt


def test_ply_header_roundtrip(tmp_path):
    p = str(tmp_path / "a.ply")
    arr = make_ply_xyz(p, n=500)
    hdr = PlyHeader.parse_file(p)
    assert hdr.little_endian
    el = hdr.element("vertex")
    assert el.count == 500  # PlySuite.scala:41-44 equivalent
    assert [pr.name for pr in el.properties] == ["x", "y", "z"]
    assert el.stride == 12
    # byte-length accounting: section offset must land exactly on the data
    with open(p, "rb") as f:
        f.seek(hdr.section_offset("vertex"))
        first = np.frombuffer(f.read(12), dtype="<f4")
    np.testing.assert_array_equal(first, np.array([arr["x"][0], arr["y"][0], arr["z"][0]]))
    # serialize → reparse is stable
    hdr2 = PlyHeader.parse(__import__("io").BytesIO(hdr.to_bytes()))
    assert hdr2.element("vertex").count == 500
    assert hdr2.header_length == hdr.header_length


def test_ply_crlf_header_length(tmp_path):
    """\r\n terminators count toward the section offset (PlyHeader.scala:171-179)."""
    p = str(tmp_path / "crlf.ply")
    body = b"ply\r\nformat binary_little_endian 1.0\r\nelement vertex 2\r\nproperty float x\r\nend_header\r\n"
    data = np.array([1.5, 2.5], dtype="<f4").tobytes()
    with open(p, "wb") as f:
        f.write(body + data)
    hdr = PlyHeader.parse_file(p)
    assert hdr.header_length == len(body)
    assert hdr.section_offset("vertex") == len(body)


@pytest.mark.parametrize("fmt", [0, 1, 3, 6, 8])
def test_las_header_roundtrip(tmp_path, fmt):
    p = str(tmp_path / f"f{fmt}.las")
    arr = make_las(p, n=2000, fmt=fmt)
    hdr = LasHeader.parse_file(p)
    assert hdr.pdr_format == fmt
    assert hdr.pdr_nb == 2000
    assert hdr.stride == EXPECTED_STRIDE[fmt]
    # LasSuite.scala:107-115 invariant: Σ per-return counts ∈ {pdr_nb, 0}
    assert sum(hdr.pdr_return_nb) in (hdr.pdr_nb, 0)
    # header bounds == scanned world bounds
    scale, offset = hdr.scale, hdr.offset
    for i, c in enumerate("xyz"):
        world = offset[i] + scale[i] * arr[c].astype(np.float64)
        assert hdr.pmin[i] == pytest.approx(world.min())
        assert hdr.pmax[i] == pytest.approx(world.max())
    # serialize → reparse
    hdr2 = LasHeader.parse(hdr.to_bytes())
    assert hdr2.pdr_format == fmt and hdr2.pdr_nb == 2000
    assert hdr2.scale == hdr.scale and hdr2.pmin == hdr.pmin


def test_las_extrabytes(tmp_path):
    p = str(tmp_path / "extra.las")
    make_las(p, n=1000, fmt=0, extra=True)
    hdr = LasHeader.parse_file(p)
    names = [f.name for f in hdr.extra_fields]
    assert names == ["reflectance", "amplitude"]
    refl, amp = hdr.extra_fields
    assert refl.scale == 0.01 and refl.np_char == "f8"
    assert amp.nodata == -9999 and amp.np_char == "i4"
    assert hdr.stride == 20 + 8 + 4


def test_format_from_schema():
    assert format_from_schema({"x", "y", "z", "intensity"}) == 0
    assert format_from_schema({"x", "y", "z", "time"}) == 1
    assert format_from_schema({"x", "y", "z", "red", "green", "blue"}) == 2
    assert format_from_schema({"x", "y", "z", "time", "red", "green", "blue"}) == 3
    assert format_from_schema(set(n for n, _ in POINT_FORMATS[6])) == 6
    with pytest.raises(ValueError):
        format_from_schema({"x", "y", "z", "nonexistent_field"})


def test_las_info(tmp_path):
    p = str(tmp_path / "i.las")
    make_las(p, n=100, fmt=1)
    from spark_iqmulus_spark.plans.header_catalog import las_info

    report = las_info(p)
    assert "point data format:          1" in report
    assert "number of point records:    100" in report
    assert "scale factor x y z:         0.01 0.01 0.01" in report


def test_las14_evlr_extrabytes(tmp_path, spark):
    """LAS 1.4 EVLRs (after point data) are walked and ExtraBytes
    descriptors in them extend the schema, like VLR-hosted ones."""
    import struct

    import numpy as np

    from spark_iqmulus_spark.sources.las_format import (
        ExtraField,
        LasHeader,
        _serialize_extra_bytes,
    )

    n = 200
    stride = 20 + 4  # format 0 + one f4 extra field
    hdr = LasHeader(version_minor=4, pdr_format=0, pdr_nb=n, pdr_length=stride)
    raw = bytearray(hdr.to_bytes())
    rng = np.random.default_rng(7)
    pts = np.zeros(n, dtype=np.dtype([("x", "<i4"), ("y", "<i4"), ("z", "<i4"),
                                      ("intensity", "<u2"), ("flags", "<u1"),
                                      ("classification", "<u1"), ("angle", "<i1"),
                                      ("user", "<u1"), ("source", "<u2"),
                                      ("reflectance", "<f4")]))
    pts["x"] = rng.integers(-1000, 1000, n)
    pts["reflectance"] = rng.normal(0, 1, n).astype(np.float32)
    payload = _serialize_extra_bytes([ExtraField("reflectance", "f4")])
    evlr = bytearray(60)
    evlr[2:18] = b"LASF_Spec".ljust(16, b"\0")
    struct.pack_into("<H", evlr, 18, 4)
    struct.pack_into("<Q", evlr, 20, len(payload))
    start_evlr = len(raw) + n * stride
    struct.pack_into("<Q", raw, 235, start_evlr)
    struct.pack_into("<I", raw, 243, 1)
    p = str(tmp_path / "evlr.las")
    with open(p, "wb") as f:
        f.write(bytes(raw) + pts.tobytes() + bytes(evlr) + payload)

    parsed = LasHeader.parse_file(p)
    assert [f.name for f in parsed.extra_fields] == ["reflectance"]
    assert len(parsed.evlrs) == 1 and parsed.evlrs[0].record_id == 4
    assert parsed.stride == stride

    df = spark.read.format("las").load(p)
    assert "reflectance" in df.columns
    assert df.count() == n
    got = sorted(r[0] for r in df.select("x").collect())
    assert got == sorted(int(v) for v in pts["x"])


def test_laz_detected_and_rejected(tmp_path):
    """laszip-compressed files (high bit of the format id) fail with a
    clear message instead of decoding garbage."""
    import struct

    import pytest as _pytest

    from spark_iqmulus_spark.sources.las_format import LasHeader
    from tests.fixtures import make_las

    p = str(tmp_path / "c.las")
    make_las(p, n=10, fmt=1)
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<B", raw, 104, 0x80 | 1)  # set compression bit
    open(p, "wb").write(bytes(raw))
    with _pytest.raises(ValueError, match="LAZ"):
        LasHeader.parse_file(p)


def test_las14_zero_count14_repair():
    """Nonconforming 1.4 writers can zero the 64-bit count while filling the
    per-return slots; the parser must derive a nonzero point count instead
    of planning zero records from a file that has data (ADVICE r4)."""
    import struct

    from spark_iqmulus_spark.sources.las_format import LasHeader

    ret = (3, 2) + (0,) * 13
    hdr = LasHeader(
        version_minor=4, pdr_format=6, pdr_nb=5, pdr_return_nb=ret
    )
    buf = bytearray(hdr.to_bytes())
    struct.pack_into("<Q", buf, 247, 0)  # zero the 1.4 count field

    # legacy slot still carries 5 → recovered from legacy
    assert LasHeader.parse(bytes(buf)).pdr_nb == 5

    # legacy also zeroed (spec-conformant for fmt 6-10) → sum of returns
    struct.pack_into("<I", buf, 107, 0)
    assert LasHeader.parse(bytes(buf)).pdr_nb == 5  # = sum(ret)
