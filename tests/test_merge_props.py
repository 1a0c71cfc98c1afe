"""Property-based tests (hypothesis) for the schema-merge lattice —
the algebraic laws the reference's MergeableStructType relies on
(package.scala:38-151) but never tests.

No Spark session needed: pure type algebra, so hundreds of cases run in
milliseconds.
"""

from __future__ import annotations

from hypothesis import given, strategies as st

from pyspark.sql import types as T

from spark_iqmulus_spark.functions.schema_merge import (
    merge_all,
    merge_schemas,
    merge_types,
)

NUMERIC_TYPES = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
]

numeric = st.sampled_from(NUMERIC_TYPES)

_WIDTH = {  # value-range width used to express "widening never narrows"
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 3,
    T.LongType: 4,
    T.FloatType: 3.5,  # exactly holds byte/short, not int/long
    T.DoubleType: 5,
}

field_names = st.sampled_from(["x", "y", "z", "intensity", "gps", "cls"])


@st.composite
def schemas(draw):
    names = draw(st.lists(field_names, min_size=1, max_size=4, unique=True))
    return T.StructType(
        [
            T.StructField(n, draw(numeric), draw(st.booleans()))
            for n in names
        ]
    )


@given(numeric, numeric)
def test_merge_types_commutative(a, b):
    assert merge_types(a, b) == merge_types(b, a)


@given(numeric, numeric, numeric)
def test_merge_types_associative(a, b, c):
    assert merge_types(merge_types(a, b), c) == merge_types(a, merge_types(b, c))


@given(numeric)
def test_merge_types_idempotent(a):
    assert merge_types(a, a) == a


@given(numeric, numeric)
def test_merge_types_never_narrows(a, b):
    m = merge_types(a, b)
    assert _WIDTH[type(m)] >= _WIDTH[type(a)]
    assert _WIDTH[type(m)] >= _WIDTH[type(b)]


@given(schemas(), schemas())
def test_merge_schemas_field_union(left, right):
    merged = merge_schemas(left, right)
    assert {f.name for f in merged.fields} == {
        f.name for f in left.fields
    } | {f.name for f in right.fields}


@given(schemas(), schemas())
def test_merge_schemas_one_sided_nullable(left, right):
    """A field present on only one side must come out nullable
    (package.scala:135,142)."""
    merged = {f.name: f for f in merge_schemas(left, right).fields}
    lnames = {f.name for f in left.fields}
    rnames = {f.name for f in right.fields}
    for name in lnames ^ rnames:
        assert merged[name].nullable


@given(schemas(), schemas())
def test_merge_schemas_commutative_up_to_order(left, right):
    """Same fields/types/nullability both ways (field order is
    left-biased, so compare as sets)."""
    ab = {
        (f.name, f.dataType.simpleString(), f.nullable)
        for f in merge_schemas(left, right).fields
    }
    ba = {
        (f.name, f.dataType.simpleString(), f.nullable)
        for f in merge_schemas(right, left).fields
    }
    assert ab == ba


@given(st.lists(schemas(), min_size=1, max_size=5))
def test_merge_all_matches_pairwise_fold(schema_list):
    folded = schema_list[0]
    for s in schema_list[1:]:
        folded = merge_schemas(folded, s)
    assert merge_all(schema_list) == folded
