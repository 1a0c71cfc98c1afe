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
