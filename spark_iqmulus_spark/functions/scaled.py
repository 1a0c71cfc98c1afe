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


def voxelize(
    df: DataFrame,
    size: tuple[float, float, float],
    origin: tuple[float, float, float] = (0.0, 0.0, 0.0),
    names: tuple[str, ...] = ("x", "y", "z"),
) -> DataFrame:
    """Voxel-index coordinates — the las2las decimate / clip-to-grid
    shape: ``raw' = floor((world − origin) / size)`` as int32, with
    ``world`` read through each column's scale/offset metadata.

    Unlike ``regrid`` (round-to-NEAREST grid point), floor gives the
    containing cell, so equal raw values = same voxel (feed into
    ``groupBy`` for occupancy grids or ``dropDuplicates`` for decimate).
    Writing the result with ``.option("scale", size)`` /
    ``.option("offset", origin)`` engages the fused byte path —
    ``floor``/``ceil`` are in exprprog's closed node set as of round 13
    (correctly rounded in both ``Math.floor`` and ``np.floor``; the
    bigint-rooted cast finishes with JVM l2i semantics)::

        voxelize(df, (0.5, 0.5, 0.5)).write.format("las")
            .option("scale", "0.5,0.5,0.5").option("offset", "0,0,0")
            .save(out)
    """
    out = df
    for i, n in enumerate(names):
        if n in df.columns:
            out = out.withColumn(
                n,
                F.floor(
                    (world_coord(df, n) - F.lit(float(origin[i])))
                    / F.lit(float(size[i]))
                ).cast("int"),
            )
    return out


def affine(
    df: DataFrame,
    matrix,
    scale: tuple[float, float, float] | None = None,
    offset: tuple[float, float, float] | None = None,
    names: tuple[str, ...] = ("x", "y", "z"),
) -> DataFrame:
    """World-space affine transform re-encoded onto a grid — the las2las
    transformation shape (PDAL ``filters.transformation`` → write):
    ``w_i' = m[i][0]·w_x + m[i][1]·w_y + m[i][2]·w_z + m[i][3]`` with each
    ``w`` read through its column's scale/offset metadata, then
    ``raw' = round((w' − offset') / scale')``.

    ``matrix`` is the 3×4 row-major affine; ``scale``/``offset`` are the
    OUTPUT grid — each defaults from its column's scale/offset metadata
    (ADVICE r12: offset now defaults from metadata exactly like scale, so
    the default really is "keep each column's source grid"; columns with
    no metadata fall back to scale 1, offset 0).  Built as ONE
    ``select``, so every output expression reads the ORIGINAL columns —
    and the whole chain stays inside the exprprog node set (literals,
    widening casts, ``+ − ×``, ``round(·, 0)``, int root), so writing the
    result with the matching writer grid takes the fused byte path::

        affine(df, [[c, -s, 0, tx], [s, c, 0, ty], [0, 0, 1, 0]])
            .write.format("las").option("scale", "0.01,0.01,0.01")
            .option("offset", "0,0,0").save(out)
    """
    if len(matrix) != 3 or any(len(r) != 4 for r in matrix):
        raise ValueError("matrix must be 3x4 row-major")
    missing = [n for n in names if n not in df.columns]
    if missing:
        # unlike regrid (per-axis, degrades gracefully), an affine row
        # references ALL three world coordinates — a missing one is an
        # error worth naming, not a bare StopIteration
        raise ValueError(
            f"affine requires columns {tuple(names)}; missing {missing}"
        )
    worlds = [world_coord(df, n) for n in names]
    if scale is None:
        scale = tuple(
            float((next(f for f in df.schema.fields if f.name == n).metadata
                   or {}).get("scale", 1.0))
            for n in names
        )
    if offset is None:
        offset = tuple(
            float((next(f for f in df.schema.fields if f.name == n).metadata
                   or {}).get("offset", 0.0))
            for n in names
        )
    exprs = {}
    for i, n in enumerate(names):
        row = matrix[i]
        e = F.lit(float(row[0])) * worlds[0]
        e = e + F.lit(float(row[1])) * worlds[1]
        e = e + F.lit(float(row[2])) * worlds[2]
        e = e + F.lit(float(row[3]))
        exprs[n] = unscale(e, scale[i], offset[i])
    return df.select(
        *[
            exprs[c].alias(c) if c in exprs else F.col(c)
            for c in df.columns
        ]
    )
