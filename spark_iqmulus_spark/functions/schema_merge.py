"""Cross-file schema merge with numeric widening.

Reimplements the semantics of the reference's ``MergeableStructType``
(``/root/reference/src/main/scala/fr/ign/spark/iqmulus/package.scala:38-151``):
field-by-name union where one-sided fields become nullable
(``package.scala:124-145``) and numeric types widen along a lattice
(``package.scala:83-117``).

Widening rules (documented; Spark types only):

- integral × integral → wider integral (byte → short → int → long)
- fractional × fractional → wider fractional (float → double)
- byte/short × float → float (exactly representable)
- int/long × float, any × double → double
"""

from __future__ import annotations

from pyspark.sql import types as T

_INT_RANK = {T.ByteType: 0, T.ShortType: 1, T.IntegerType: 2, T.LongType: 3}
_FLOAT_RANK = {T.FloatType: 0, T.DoubleType: 1}
_INT_BY_RANK = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()]
_FLOAT_BY_RANK = [T.FloatType(), T.DoubleType()]


def merge_types(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    ta, tb = type(a), type(b)
    if ta in _INT_RANK and tb in _INT_RANK:
        return _INT_BY_RANK[max(_INT_RANK[ta], _INT_RANK[tb])]
    if ta in _FLOAT_RANK and tb in _FLOAT_RANK:
        return _FLOAT_BY_RANK[max(_FLOAT_RANK[ta], _FLOAT_RANK[tb])]
    if ta in _INT_RANK and tb in _FLOAT_RANK:
        int_t, float_t = ta, tb
    elif ta in _FLOAT_RANK and tb in _INT_RANK:
        int_t, float_t = tb, ta
    else:
        raise TypeError(f"cannot merge {a.simpleString()} with {b.simpleString()}")
    if float_t is T.DoubleType or _INT_RANK[int_t] >= _INT_RANK[T.IntegerType]:
        return T.DoubleType()
    return T.FloatType()


def _merge_metadata(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        if k not in out:
            out[k] = v
        elif k == "min" and isinstance(v, (int, float)):
            out[k] = min(out[k], v)
        elif k == "max" and isinstance(v, (int, float)):
            out[k] = max(out[k], v)
    return out


def merge_schemas(left: T.StructType, right: T.StructType) -> T.StructType:
    """Union by name, preserving left-then-new-right field order; a field
    present on only one side becomes nullable (``package.scala:135,142``)."""
    right_by_name = {f.name: f for f in right.fields}
    left_names = {f.name for f in left.fields}
    fields: list[T.StructField] = []
    for lf in left.fields:
        rf = right_by_name.get(lf.name)
        if rf is None:
            fields.append(
                T.StructField(lf.name, lf.dataType, True, metadata=lf.metadata)
            )
        else:
            fields.append(
                T.StructField(
                    lf.name,
                    merge_types(lf.dataType, rf.dataType),
                    lf.nullable or rf.nullable,
                    metadata=_merge_metadata(lf.metadata or {}, rf.metadata or {}),
                )
            )
    for rf in right.fields:
        if rf.name not in left_names:
            fields.append(
                T.StructField(rf.name, rf.dataType, True, metadata=rf.metadata)
            )
    return T.StructType(fields)


def merge_all(schemas: list[T.StructType]) -> T.StructType:
    if not schemas:
        raise ValueError("no schemas to merge")
    out = schemas[0]
    for s in schemas[1:]:
        out = merge_schemas(out, s)
    return out


def union_merged(dfs):
    """Union DataFrames under the merged (widened) schema.

    DataFrame-level counterpart of :func:`merge_all` — the query-side use of
    the reference's cross-file schema merge (``BinarySectionRelation.scala:
    134-137``): each input is aligned to the merged schema (missing fields
    become typed nulls, narrower numerics are cast up the widening lattice)
    and the results are ``unionByName``ed.  Pure column casts — no shuffle,
    no Python; the union is plan-level (Spark concatenates partitions).
    """
    from pyspark.sql import functions as F

    merged = merge_all([df.schema for df in dfs])
    aligned = []
    for df in dfs:
        have = {f.name for f in df.schema.fields}
        cols = [
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in merged.fields
        ]
        aligned.append(df.select(cols))
    out = aligned[0]
    for d in aligned[1:]:
        out = out.unionByName(d)
    return out
