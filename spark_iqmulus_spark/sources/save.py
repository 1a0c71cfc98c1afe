"""Direct save helpers (A20) + provenance-partitioned write-back (A17).

The reference exposes ``df.saveAsPly/saveAsLas/saveAsXyz`` direct actions
(``ply/package.scala:40-69``, ``las/package.scala:45-98``,
``xyz/package.scala:40-61``) that write one file per partition — and its
LAS variant materializes whole partitions in memory to compute stats
(``las/package.scala:67-68``), a scalability hazard.  Here the same user
intent routes through the DataSource writers (streaming stats, commit-phase
header merge), so ``save_las(df, path)`` is just ergonomic sugar.

``save_partitioned_by_fid`` restores the reference's commit-rename behavior
(``PlyRelation.scala:65-72``: ``fid=N`` partition dirs renamed back to the
original source file names recorded in the ``fid`` column metadata): one
output file per source file, named after the source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def save_ply(df: DataFrame, path: str, little_endian: bool = True, mode: str = "overwrite") -> None:
    (
        df.write.format("ply")
        .mode(mode)
        .option("littleendian", "true" if little_endian else "false")
        .save(path)
    )


def save_las(
    df: DataFrame,
    path: str,
    lasformat: int | None = None,
    minor: int = 2,
    scale: tuple[float, float, float] = (0.01, 0.01, 0.01),
    offset: tuple[float, float, float] = (0.0, 0.0, 0.0),
    mode: str = "overwrite",
) -> None:
    w = (
        df.write.format("las")
        .mode(mode)
        .option("minor", str(minor))
        .option("scale", ",".join(str(v) for v in scale))
        .option("offset", ",".join(str(v) for v in offset))
    )
    if lasformat is not None:
        w = w.option("lasformat", str(lasformat))
    w.save(path)


def save_xyz(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    from .xyz import write_xyz

    write_xyz(df, path, mode=mode)


def save_tiled_las(
    df: DataFrame,
    out_dir: str,
    cell: tuple[float, float],
    x: str = "x",
    y: str = "y",
    **opts,
) -> list[str]:
    """Re-tile a point cloud into a regular (x, y) grid of LAS files —
    the canonical LiDAR "retile" operation.

    Each point maps to tile ``(floor(x/cx), floor(y/cy))``; the output is
    one valid ``.las`` per occupied tile, named ``tile_{gx}_{gy}.las``,
    each with correct per-tile header stats.  Implementation rides the
    writer's fid-grouping commit: occupied tiles are enumerated (one
    aggregate — tile keys are metadata-scale, bounded by occupied cells,
    not points), each point gets its tile's dense index as ``fid`` via a
    broadcast join, and a SINGLE distributed write emits every tile.
    Shuffle cost: one aggregate over tile keys + the write itself; no
    per-tile driver jobs.

    Returns the tile file names in fid order.
    """
    from pyspark.sql import functions as F

    cx, cy = cell
    gx = F.floor(F.col(x) / cx).cast("long")
    gy = F.floor(F.col(y) / cy).cast("long")
    keyed = df.withColumn("__gx", gx).withColumn("__gy", gy)
    tiles = sorted(
        (r["__gx"], r["__gy"])
        for r in keyed.select("__gx", "__gy").distinct().collect()
    )
    names = [f"tile_{tgx}_{tgy}.las" for tgx, tgy in tiles]
    spark = df.sparkSession
    mapping = spark.createDataFrame(
        [(tgx, tgy, i) for i, (tgx, tgy) in enumerate(tiles)],
        "__gx long, __gy long, fid int",
    )
    fid_meta = {"paths": names}  # writer takes basenames from these
    tiled = (
        keyed.drop("fid", "pid")
        .join(F.broadcast(mapping), ["__gx", "__gy"])  # bounded: one row/tile
        .drop("__gx", "__gy")
        .withColumn(
            "fid",
            F.col("fid").alias("fid", metadata=fid_meta),
        )
    )
    # co-locate each tile's points before writing: without this every
    # write task opens one sidecar per tile it sees (10k tiles × 32 tasks
    # = handle explosion); after the shuffle each task holds a few whole
    # tiles and each output file merges from ~1 part
    tiled = tiled.repartition("fid")
    w = tiled.write.format("las").mode("overwrite")
    for k, v in opts.items():
        w = w.option(k, str(v))
    w.save(out_dir)
    return [os.path.join(out_dir, n) for n in names]


def save_partitioned_by_fid(df: DataFrame, out_dir: str, fmt: str = "las", **opts) -> list[str]:
    """Write one output file per source file, restoring original base names.

    Source paths come from the ``fid`` column metadata (populated by the
    readers — the reference keeps them the same way,
    BinarySectionRelation.scala:138-142).  Each fid's rows are filtered and
    written through the normal committing writer; the per-file loop runs on
    the driver but each write is a distributed job, so this scales with the
    *number of files*, not rows.
    """
    fid_field = next(f for f in df.schema.fields if f.name == "fid")
    paths = (fid_field.metadata or {}).get("paths")
    if not paths:
        raise ValueError("fid column has no 'paths' metadata — not a point-cloud read?")
    saver = {"las": save_las, "ply": save_ply, "xyz": save_xyz}[fmt]
    written = []
    for fid, src in enumerate(paths):
        base = os.path.splitext(os.path.basename(src))[0]
        dest = os.path.join(out_dir, base)
        saver(df.where(df.fid == fid), dest, **opts)
        written.append(dest)
    return written
