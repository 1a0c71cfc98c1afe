"""Property-based tests (hypothesis) for the LAS / PLY header codecs.

The binary layouts must be byte-exact for round-trips (SURVEY.md §7 risk
register #2); these properties pin ``parse(to_bytes(h))`` as the identity
on every semantic field over randomized headers — coverage the example
fixtures in test_formats.py can't give.  Pure Python: no SparkSession.
"""

from __future__ import annotations

import io

from hypothesis import given, settings, strategies as st

from spark_iqmulus_spark.sources.las_format import (
    HEADER_SIZE,
    LasHeader,
    format_stride,
)
from spark_iqmulus_spark.sources.ply_format import (
    PLY_TYPES,
    PlyElement,
    PlyHeader,
    PlyProperty,
)

# -- LAS -------------------------------------------------------------------

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
triple = st.tuples(finite, finite, finite)
pos_scale = st.tuples(
    st.sampled_from([0.001, 0.01, 0.1, 1.0]),
    st.sampled_from([0.001, 0.01, 0.1, 1.0]),
    st.sampled_from([0.001, 0.01, 0.1, 1.0]),
)


@st.composite
def las_headers(draw):
    fmt = draw(st.integers(min_value=0, max_value=10))
    # formats 6-10 require 1.4; otherwise any supported minor
    minor = 4 if fmt >= 6 else draw(st.sampled_from([0, 1, 2, 3, 4]))
    pdr_nb = draw(st.integers(min_value=0, max_value=2**31))
    # a zero point count with nonzero per-return counts is the
    # NONCONFORMING-writer shape the parser deliberately repairs
    # (las_format: count14==0 but any(ret14) → derive pdr_nb); the
    # roundtrip identity only holds for spec-consistent headers, so pin
    # returns to zero when the count is zero (repair has its own unit test)
    ret_max = 2**31 if pdr_nb else 0
    return LasHeader(
        version_minor=minor,
        pdr_format=fmt,
        pdr_nb=pdr_nb,
        scale=draw(pos_scale),
        offset=draw(triple),
        pmin=draw(triple),
        pmax=draw(triple),
        pdr_return_nb=tuple(
            draw(
                st.lists(
                    st.integers(min_value=0, max_value=ret_max),
                    min_size=15,
                    max_size=15,
                )
            )
        ),
        file_source_id=draw(st.integers(min_value=0, max_value=65535)),
        global_encoding=draw(st.integers(min_value=0, max_value=65535)),
        creation_doy=draw(st.integers(min_value=1, max_value=366)),
        creation_year=draw(st.integers(min_value=1990, max_value=2100)),
    )


@settings(max_examples=150, deadline=None)
@given(las_headers())
def test_las_header_roundtrip(hdr):
    back = LasHeader.parse(hdr.to_bytes())
    assert back.version_minor == hdr.version_minor
    assert back.pdr_format == hdr.pdr_format
    assert back.pdr_nb == hdr.pdr_nb
    assert back.scale == hdr.scale
    assert back.offset == hdr.offset
    assert back.pmin == hdr.pmin
    assert back.pmax == hdr.pmax
    # 1.0-1.3 headers store only 5 return-count slots
    n_ret = 15 if hdr.version_minor >= 4 else 5
    assert back.pdr_return_nb[:n_ret] == hdr.pdr_return_nb[:n_ret]
    assert back.file_source_id == hdr.file_source_id
    assert back.global_encoding == hdr.global_encoding
    assert back.creation_doy == hdr.creation_doy
    assert back.creation_year == hdr.creation_year
    assert back.stride == format_stride(hdr.pdr_format)
    assert back.header_size == HEADER_SIZE[min(hdr.version_minor, 4)]


@settings(max_examples=50, deadline=None)
@given(las_headers())
def test_las_header_size_invariant(hdr):
    """Serialized length == declared header size (no VLRs in play)."""
    assert len(hdr.to_bytes()) == hdr.header_size


# -- PLY -------------------------------------------------------------------

_prop_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
)
_np_chars = st.sampled_from(sorted({v[0] for v in PLY_TYPES.values()}))


@st.composite
def ply_headers(draw):
    n_elem = draw(st.integers(min_value=1, max_value=3))
    elements = []
    used_elem_names = set()
    for _ in range(n_elem):
        name = draw(
            _prop_name.filter(lambda s: s not in used_elem_names)
        )
        used_elem_names.add(name)
        n_props = draw(st.integers(min_value=1, max_value=6))
        used = set()
        props = []
        for _ in range(n_props):
            pn = draw(_prop_name.filter(lambda s: s not in used))
            used.add(pn)
            props.append(PlyProperty(name=pn, np_char=draw(_np_chars)))
        elements.append(
            PlyElement(
                name=name,
                count=draw(st.integers(min_value=0, max_value=2**40)),
                properties=props,
            )
        )
    return PlyHeader(
        location="",
        little_endian=draw(st.booleans()),
        elements=elements,
        # comments are whitespace-stripped on parse (like every PLY tool);
        # generate canonical form so equality is meaningful
        comments=draw(
            st.lists(
                st.text(
                    alphabet="abcdefghijklmnopqrstuvwxyz 0123456789",
                    max_size=40,
                ).map(str.strip),
                max_size=3,
            )
        ),
    )


@settings(max_examples=150, deadline=None)
@given(ply_headers())
def test_ply_header_roundtrip(hdr):
    raw = hdr.to_bytes()
    back = PlyHeader.parse(io.BytesIO(raw))
    assert back.little_endian == hdr.little_endian
    assert back.comments == hdr.comments
    assert len(back.elements) == len(hdr.elements)
    for be, he in zip(back.elements, hdr.elements):
        assert be.name == he.name
        assert be.count == he.count
        assert [(p.name, p.np_char) for p in be.properties] == [
            (p.name, p.np_char) for p in he.properties
        ]
        assert be.stride == he.stride
    # header_length accounting must equal the serialized byte count —
    # section offsets depend on it (ply_format: section_offset)
    assert back.header_length == len(raw)
