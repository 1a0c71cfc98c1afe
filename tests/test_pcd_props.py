"""Property-based tests (hypothesis) for the PCD header codec and the LZF
block codec — same contract as test_header_props.py for LAS/PLY:
``parse(to_bytes(h))`` is the identity on every semantic field, and
``lzf_decompress(lzf_compress_literal(b), len(b)) == b`` for arbitrary
bytes.  Pure Python: no SparkSession."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from spark_iqmulus_spark.sources.pcd_format import (
    PCD_TYPES,
    PcdField,
    PcdHeader,
    lzf_compress_literal,
    lzf_decompress,
)

_NP_CHARS = sorted(set(PCD_TYPES.values()))

field_names = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
)


@st.composite
def pcd_headers(draw):
    names = draw(
        st.lists(field_names, min_size=1, max_size=8, unique=True)
    )
    fields = [
        PcdField(n, draw(st.sampled_from(_NP_CHARS))) for n in names
    ]
    n = draw(st.integers(min_value=0, max_value=10**9))
    return PcdHeader(
        fields=fields,
        width=n,
        points=n,
        data_kind=draw(st.sampled_from(["ascii", "binary", "binary_compressed"])),
    )


@settings(max_examples=150, deadline=None)
@given(pcd_headers())
def test_pcd_header_roundtrip(hdr):
    raw = hdr.to_bytes()
    back = PcdHeader.parse(raw)
    assert [(f.name, f.np_char) for f in back.fields] == [
        (f.name, f.np_char) for f in hdr.fields
    ]
    assert back.points == hdr.points
    assert back.data_kind == hdr.data_kind
    assert back.stride == hdr.stride
    # data_offset accounting must equal the serialized header length —
    # the binary section starts there
    assert back.data_offset == len(raw)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=5000))
def test_lzf_literal_roundtrip(data):
    assert lzf_decompress(lzf_compress_literal(data), len(data)) == data


@st.composite
def count_layouts(draw):
    """(names, np_chars, counts, n_points) with at least one COUNT>1."""
    k = draw(st.integers(min_value=1, max_value=4))
    names = draw(st.lists(field_names, min_size=k, max_size=k, unique=True))
    chars = [draw(st.sampled_from(_NP_CHARS)) for _ in range(k)]
    counts = [draw(st.integers(min_value=1, max_value=4)) for _ in range(k)]
    counts[draw(st.integers(min_value=0, max_value=k - 1))] = draw(
        st.integers(min_value=2, max_value=4)
    )
    n = draw(st.integers(min_value=1, max_value=50))
    return names, chars, counts, n


@settings(max_examples=60, deadline=None)
@given(count_layouts())
def test_compressed_count_multi_decode_property(layout):
    """For ANY field layout with COUNT>1, the binary_compressed decoder
    must invert PCL's SoA layout exactly: original field f is ONE
    n*count block with each point's elements adjacent (regression for the
    round-6 ADVICE medium: expanded scalars were read as contiguous
    n-element blocks, silently scrambling columns)."""
    import io
    import struct

    import numpy as np

    from spark_iqmulus_spark.sources.pcd import _decode_whole_file

    names, chars, counts, n = layout
    rng = np.random.default_rng(12345)
    # truth per expanded column, built point-major then laid out SoA
    truth = {}
    soa = bytearray()
    header_lines = (
        "VERSION 0.7\n"
        f"FIELDS {' '.join(names)}\n"
        f"SIZE {' '.join(str(int(c[1:])) for c in chars)}\n"
        f"TYPE {' '.join({'i': 'I', 'u': 'U', 'f': 'F'}[c[0]] for c in chars)}\n"
        f"COUNT {' '.join(map(str, counts))}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        "DATA binary_compressed\n"
    )
    for name, ch, cnt in zip(names, chars, counts):
        if ch[0] == "f":
            block = rng.uniform(-100, 100, n * cnt).astype("<" + ch)
        else:
            info = np.iinfo("<" + ch)
            block = rng.integers(
                info.min, info.max, n * cnt, dtype="<" + ch, endpoint=True
            )
        soa += block.tobytes()  # SoA: whole original field, point-adjacent
        mat = block.reshape(n, cnt)
        if cnt == 1:
            truth[name] = (mat[:, 0], ch)
        else:
            for j in range(cnt):
                truth[f"{name}_{j}"] = (mat[:, j], ch)

    from spark_iqmulus_spark.sources.pcd_format import lzf_compress_literal

    comp = lzf_compress_literal(bytes(soa))
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pcd", delete=False) as f:
        f.write(header_lines.encode())
        f.write(struct.pack("<II", len(comp), len(soa)))
        f.write(comp)
        path = f.name
    try:
        batch = _decode_whole_file(path, fid=0)
        got = {c: batch.column(i).to_numpy(zero_copy_only=False)
               for i, c in enumerate(batch.schema.names)}
        from spark_iqmulus_spark.sources.binary_section import signed_char

        for col, (want, ch) in truth.items():
            # storage is bit-preserved into signed types — compare bitwise
            w = np.ascontiguousarray(want).view(np.dtype("<" + signed_char(ch)))
            np.testing.assert_array_equal(got[col], w, err_msg=col)
    finally:
        import os

        os.unlink(path)
