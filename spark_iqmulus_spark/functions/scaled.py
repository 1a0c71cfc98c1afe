"""Scaled-coordinate helpers (A12 — the Spark-first replacement for the
reference's dormant ScaledInteger/OffsetScaledInteger UDTs).

The reference ships LAS x/y/z as plain int32 with scale/offset kept in
header/metadata (ScaledIntegerType.scala UDTs are registered but unused —
LasHeader.scala:351-353 comments them out).  We keep the same storage model
and expose world coordinates as Catalyst column expressions
(``world = offset + scale * raw`` — LasOutputWriter.scala:73-75), which
constant-fold and participate in codegen; the UDT arithmetic would not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def world_coord(df: DataFrame, name: str) -> Column:
    """World-coordinate expression for a scaled integer column, reading
    scale/offset from the column's StructField metadata."""
    field = next(f for f in df.schema.fields if f.name == name)
    meta = field.metadata or {}
    scale = float(meta.get("scale", 1.0))
    offset = float(meta.get("offset", 0.0))
    return (F.lit(offset) + F.lit(scale) * F.col(name).cast("double")).alias(name)


def with_world_coords(df: DataFrame, names: tuple[str, ...] = ("x", "y", "z")) -> DataFrame:
    """Replace raw scaled-int columns with world-coordinate doubles
    (round-trip inverse: ``unscale``)."""
    out = df
    for n in names:
        if n in df.columns:
            out = out.withColumn(n, world_coord(df, n))
    return out


def unscale(col: Column, scale: float, offset: float) -> Column:
    """World → raw int32, the writer-side inverse
    (``(p - offset) / scale`` rounded — ExtraStrategies.scala:53)."""
    return F.round((col - F.lit(offset)) / F.lit(scale), 0).cast("int")


def regrid(
    df: DataFrame,
    scale: tuple[float, float, float],
    offset: tuple[float, float, float] = (0.0, 0.0, 0.0),
    names: tuple[str, ...] = ("x", "y", "z"),
) -> DataFrame:
    """Re-derive raw scaled-int coordinates onto a NEW grid — the las2las
    re-grid shape: ``raw' = round((world − offset') / scale')`` with
    ``world`` read through each column's current scale/offset metadata.

    Writing the result with the matching writer grid engages the fused
    byte path transparently (sources/fused_write.py replays exactly this
    arithmetic in numpy — any equivalent hand-built expression of casts,
    ``+ − × ÷``, and ``round(·, 0)`` over the same column qualifies too)::

        regrid(df, (0.001,) * 3).write.format("las")
            .option("scale", "0.001,0.001,0.001").option("offset", "0,0,0")
            .save(out)
    """
    out = df
    for i, n in enumerate(names):
        if n in df.columns:
            out = out.withColumn(
                n, unscale(world_coord(df, n), scale[i], offset[i])
            )
    return out
