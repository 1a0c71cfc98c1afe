"""Z-order (Morton) spatial clustering for point-cloud layouts.

At 100 TB the dominant cost of spatial queries is how many files/row-groups
a bounding-box predicate touches.  The reference keeps file layout as-is
(one relation per input tile); the standard scale technique is to re-cluster
by a space-filling curve so nearby points land in the same partition and
min/max statistics become selective.  This module provides:

- :func:`morton_key`: bit-interleaved Morton code of two non-negative int
  columns as a single JVM expression chain (no UDF, fully codegen);
- :func:`cluster_by_morton`: range-repartition + in-partition sort by the
  Morton key — after writing, each file's x/y bounds are tight, so
  header-bounds skipping (LAS source ``pushdown`` option) or parquet
  min/max pruning eliminates most of the data for box queries.

``q_zorder`` puts the key computation under the oracle gate (DuckDB
reproduces the interleaving with integer bit arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

MORTON_BITS = 10


def morton_key(x: Column, y: Column, bits: int = MORTON_BITS) -> Column:
    """Interleave the low ``bits`` bits of non-negative ints ``x`` and ``y``
    into a Morton code (x → even bit positions, y → odd)."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("long")
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1)).cast("long")
        acc = acc + F.shiftleft(xbit, 2 * i) + F.shiftleft(ybit, 2 * i + 1)
    return acc


def cluster_by_morton(
    df: DataFrame, x: str, y: str, num_partitions: int, bits: int = MORTON_BITS
) -> DataFrame:
    """Spatially cluster ``df``: range-partition on the Morton key and sort
    within partitions, so a subsequent write produces files with tight
    per-file x/y bounds.  One range shuffle (sampled boundaries — skew-safe
    for clustered point distributions)."""
    keyed = df.withColumn("__morton", morton_key(F.col(x), F.col(y), bits))
    return (
        keyed.repartitionByRange(num_partitions, "__morton")
        .sortWithinPartitions("__morton")
        .drop("__morton")
    )


def voxel_downsample(
    df: DataFrame,
    cell: tuple[float, float, float],
    x: str = "x",
    y: str = "y",
    z: str = "z",
) -> DataFrame:
    """Voxel-grid thinning — the canonical LiDAR point-cloud reduction.

    Each point maps to the voxel ``(floor(x/cx), floor(y/cy), floor(z/cz))``;
    one output row per occupied voxel carries the centroid and point count.
    A single hash aggregate: shuffle volume is bounded by *occupied voxel*
    count, not input points, so a 100 TB cloud reduces in one pass with
    map-side partial aggregation (no window, no sort).  The reference has
    no reduction operators (it delegates everything past the scan,
    SURVEY.md §2B); this is part of the §2C extension surface.
    """
    cx, cy, cz = cell
    return df.groupBy(
        F.floor(F.col(x) / cx).alias("vx"),
        F.floor(F.col(y) / cy).alias("vy"),
        F.floor(F.col(z) / cz).alias("vz"),
    ).agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.avg(x).alias("cx"),
        F.avg(y).alias("cy"),
        F.avg(z).alias("cz"),
    )


def voxel_pyramid(
    pts: DataFrame,
    base: tuple[float, float],
    levels: int = 4,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Multi-resolution LOD pyramid (the octree/quadtree build step behind
    point-cloud LOD rendering and hypertable-style rollups): per-cell
    ``(count, sum_x, sum_y)`` at ``levels`` resolutions, each level's cell
    side doubling.

    Built as a CASCADE, not repeated scans: level 0 is the only aggregation
    that touches points; every coarser level re-aggregates the previous
    level's cells (counts and sums are mergeable), so shuffle volume after
    the first pass is bounded by occupied-cell counts, which shrink 4× per
    level.  Returns ``(level, vx, vy, n_pts, cx, cy)`` with centroids
    derived from the exact sums.
    """
    bx, by = base
    cur = pts.groupBy(
        F.floor(F.col(x) / bx).alias("vx"),
        F.floor(F.col(y) / by).alias("vy"),
    ).agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
    )
    out = cur.withColumn("level", F.lit(0))
    for lvl in range(1, levels):
        cur = (
            cur.groupBy(
                F.floor(F.col("vx") / 2).alias("vx"),
                F.floor(F.col("vy") / 2).alias("vy"),
            )
            .agg(
                F.sum("n_pts").alias("n_pts"),
                F.sum("sx").alias("sx"),
                F.sum("sy").alias("sy"),
            )
        )
        out = out.unionByName(cur.withColumn("level", F.lit(lvl)))
    return out.select(
        "level",
        "vx",
        "vy",
        "n_pts",
        F.round(F.col("sx") / F.col("n_pts"), 6).alias("cx"),
        F.round(F.col("sy") / F.col("n_pts"), 6).alias("cy"),
    )


def q_pc_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-level LOD pyramid over the part-derived plane (integer coords, so
    cross-engine sums are exact), rolled up per level."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
    )
    pyr = voxel_pyramid(pts, (64.0, 8.0), levels=4)
    return (
        pyr.groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n_pts").alias("n_points"),
            F.max("n_pts").alias("max_cell"),
            F.sum(F.round(F.col("cx") * 1e6, 0).cast("long")).alias(
                "sum_cx_micro"
            ),
        )
        .orderBy("level")
    )


def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton codes over the ``part`` table's (partkey mod 1024, size)
    plane + a per-curve-quadrant rollup — checks both the interleaving
    math and the clustering property (quadrant = top 2 bits)."""
    t = load_tables(spark, sf_dir)
    x = (F.col("p_partkey") % 1024).cast("int")
    y = F.col("p_size").cast("int")
    keyed = t["part"].select(
        "p_partkey",
        morton_key(x, y).alias("morton"),
    )
    return (
        keyed.withColumn(
            "quadrant", F.shiftright(F.col("morton"), 2 * MORTON_BITS - 2)
        )
        .groupBy("quadrant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("morton").alias("min_key"),
            F.max("morton").alias("max_key"),
            F.sum("morton").alias("sum_keys"),
        )
    )


def radius_join(pts: DataFrame, radius: float) -> DataFrame:
    """All point pairs within ``radius`` (2-D), via grid-cell bucketing.

    Input: ``(pid, x, y)``.  Output: ``(pa, pb, d)`` with ``pa < pb``.

    The classic spatial-join decomposition: bucket points into cells of
    side ``radius``; any pair within ``radius`` must lie in the same or an
    adjacent cell.  One side is expanded into its 3×3 cell neighborhood
    (explode — a bounded 9× row expansion), the other side keeps only its
    home cell, and the join is a plain equi-join on the cell key — so it
    hash-partitions, AQE handles dense-cell skew, and no cartesian or
    theta-join ever appears.  Each qualifying pair matches exactly once
    (the right row sits in its unique home cell; ``pa < pb`` picks one
    orientation), so no dedup pass is needed.
    """
    r = float(radius)
    cell_x = F.floor(F.col("x") / r).cast("long")
    cell_y = F.floor(F.col("y") / r).cast("long")
    home = pts.select(
        F.col("pid").alias("pb"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        cell_x.alias("cx"),
        cell_y.alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    expanded = (
        pts.select(
            F.col("pid").alias("pa"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            cell_x.alias("hx"),
            cell_y.alias("hy"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "pa",
            "ax",
            "ay",
            (F.col("hx") + F.col("o.dx")).alias("cx"),
            (F.col("hy") + F.col("o.dy")).alias("cy"),
        )
    )
    d = F.sqrt(
        (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
        + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
    )
    return (
        expanded.join(home, ["cx", "cy"])
        .where(F.col("pa") < F.col("pb"))
        .withColumn("d", d)
        .where(F.col("d") <= r)
        .select("pa", "pb", "d")
    )


def _structure_sums(pts: DataFrame, radius: float) -> DataFrame:
    """Per-point neighborhood moment sums for the 2-D structure tensor:
    the :func:`radius_join` pair set (both directions, plus each point as
    its own neighbor) joined to coordinates and aggregated to
    ``(pid, n_nb, sx, sy, sxx, sxy, syy)`` for points with >= 3
    neighborhood members.  Two shuffles total; integer-valued coordinates
    keep every double sum exact (and therefore engine-portable)."""
    # localCheckpoint: pairs feeds BOTH direction projections of the union and
    # Spark plans no ReusedExchange across them — without this the whole
    # grid-bucketed radius join executes twice
    pairs = radius_join(pts, radius).localCheckpoint()
    # undirected neighbor relation, plus each point as its own neighbor
    nb = (
        pairs.select(F.col("pa").alias("pid"), F.col("pb").alias("nb"))
        .union(pairs.select(F.col("pb").alias("pid"), F.col("pa").alias("nb")))
        .union(pts.select(F.col("pid"), F.col("pid").alias("nb")))
    )
    coords = pts.select(
        F.col("pid").alias("nb"), F.col("x").alias("nx"), F.col("y").alias("ny")
    )
    return (
        nb.join(coords, "nb")
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n_nb"),
            F.sum("nx").alias("sx"),
            F.sum("ny").alias("sy"),
            F.sum(F.col("nx") * F.col("nx")).alias("sxx"),
            F.sum(F.col("nx") * F.col("ny")).alias("sxy"),
            F.sum(F.col("ny") * F.col("ny")).alias("syy"),
        )
        .where(F.col("n_nb") >= 3)
    )


def dimensionality_features(pts: DataFrame, radius: float) -> DataFrame:
    """Per-point local-PCA dimensionality features (2-D structure tensor).

    The distributed version of the reference's published use case —
    Brédif/Vallet/Ferrand 2015, *Distributed dimensionality-based rendering
    of lidar point clouds* (cited `README.md:62-67` of the reference):
    each point's neighborhood (here: the :func:`radius_join` pair set plus
    the point itself) yields a covariance matrix whose eigenvalue spectrum
    classifies the point as linear / planar / scattered.  Everything is
    closed-form column arithmetic — neighbor sums via one groupBy over the
    pair list, 2×2 eigenvalues via the trace/determinant formula — so the
    whole feature pipeline is two shuffles (cell join + point groupBy) and
    stays in whole-stage codegen.

    Output: ``(pid, n_nb, lam1, lam2, linearity)`` for points with >= 3
    neighborhood members; ``linearity = (λ1-λ2)/λ1`` in [0, 1].
    """
    sums = _structure_sums(pts, radius)
    n = F.col("n_nb").cast("double")
    cxx = F.col("sxx") / n - (F.col("sx") / n) * (F.col("sx") / n)
    cxy = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    cyy = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    tr = cxx + cyy
    disc = F.sqrt(
        F.greatest((cxx - cyy) * (cxx - cyy) + 4 * cxy * cxy, F.lit(0.0))
    )
    lam1 = (tr + disc) / 2
    lam2 = (tr - disc) / 2
    return sums.select(
        "pid",
        "n_nb",
        F.round(lam1, 6).alias("lam1"),
        F.round(lam2, 6).alias("lam2"),
        F.round((lam1 - lam2) / lam1, 6).alias("linearity"),
    )


def q_pc_dimensionality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimensionality features (r=3) on the part-derived plane, rolled up
    per linearity decile so the result is compact and the eigen math is
    certified across every neighborhood."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").alias("pid"),
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
    )
    feats = dimensionality_features(pts, 3.0)
    return feats.groupBy(
        F.least(F.floor(F.col("linearity") * 10), F.lit(9))
        .cast("int")
        .alias("lin_decile")
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("lam1"), 4).alias("sum_lam1"),
        F.round(F.sum("lam2"), 4).alias("sum_lam2"),
        F.sum("n_nb").alias("sum_nb"),
    )


def q_pc_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-neighbor self-join (r=3) on the part-derived point plane
    (same deterministic derivation as the LAS fixtures: x=partkey,
    y=size), summarized so the result is one auditable row."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").alias("pid"),
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
    )
    pairs = radius_join(pts, 3.0)
    touched = pairs.select(F.col("pa").alias("pid")).union(
        pairs.select(F.col("pb").alias("pid"))
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("d"), 6).alias("avg_dist"),
        F.round(F.max("d"), 6).alias("max_dist"),
    ).crossJoin(
        touched.agg(F.count_distinct("pid").alias("n_points_with_neighbor"))
    )



def height_above_ground(
    pts: DataFrame, cell: tuple[float, float], x="x", y="y", z="z"
) -> DataFrame:
    """Normalize point heights against a per-cell ground estimate.

    The standard LiDAR DTM-normalization step: grid the cloud, take each
    cell's minimum z as local ground, and report every point's height
    above it.  One hash aggregate (bounded by occupied cells) + one
    equi-join back on the cell key — the ground table is tiny relative to
    the cloud, so at scale it broadcasts and the cloud never shuffles.
    Adds ``hag`` (>= 0) to the input rows.
    """
    cx, cy = cell
    cell_x = F.floor(F.col(x) / cx).alias("gx")
    cell_y = F.floor(F.col(y) / cy).alias("gy")
    keyed = pts.withColumn("gx", cell_x).withColumn("gy", cell_y)
    ground = keyed.groupBy("gx", "gy").agg(F.min(z).alias("ground_z"))
    # ground is per-occupied-cell — usually tiny, but grows with coverage
    # area; no hint, AQE broadcasts while small
    return keyed.join(ground, ["gx", "gy"]).withColumn(
        "hag", F.col(z) - F.col("ground_z")
    )


def q_pc_hag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Height-above-ground histogram over the part-derived cloud (cells
    64×8, the voxel grid of `q_pc_voxel`): per-bucket point counts and
    exact integer hag sums certify the ground join end-to-end."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("z"),
    )
    hag = height_above_ground(pts, (64.0, 8.0))
    bucket = F.least(F.floor(F.col("hag") / 250), F.lit(9)).cast("int")
    return hag.groupBy(bucket.alias("hag_bucket")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("hag").alias("sum_hag"),
        F.max("hag").alias("max_hag"),
    )



def q_pc_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terrain slope from the rasterized ground surface: per-cell ground
    elevation (min z, as in `height_above_ground`), finite-difference
    gradient against the +x and +y neighbor cells via two self-joins on
    shifted cell keys, slope magnitude bucketed into a histogram.  The
    raster is O(occupied cells) — tiny next to the cloud — so both
    neighbor joins broadcast; this is the DTM→slope-map step of every
    terrain pipeline."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("z"),
    )
    cs_x, cs_y = 64.0, 8.0
    ground = pts.groupBy(
        F.floor(F.col("x") / cs_x).cast("long").alias("gx"),
        F.floor(F.col("y") / cs_y).cast("long").alias("gy"),
    ).agg(F.min("z").alias("gz"))
    right = ground.select(
        (F.col("gx") - 1).alias("gx"), "gy", F.col("gz").alias("gz_xp")
    )
    up = ground.select(
        "gx", (F.col("gy") - 1).alias("gy"), F.col("gz").alias("gz_yp")
    )
    grad = (
        ground.join(right, ["gx", "gy"])  # same-cardinality cell frames — no hint
        .join(up, ["gx", "gy"])
        .select(
            "gx",
            "gy",
            ((F.col("gz_xp") - F.col("gz")) / F.lit(cs_x)).alias("dzdx"),
            ((F.col("gz_yp") - F.col("gz")) / F.lit(cs_y)).alias("dzdy"),
        )
    )
    slope = F.sqrt(F.col("dzdx") * F.col("dzdx") + F.col("dzdy") * F.col("dzdy"))
    bucket = F.least(F.floor(slope / 100), F.lit(9)).cast("int")
    return grad.groupBy(bucket.alias("slope_bucket")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.avg(slope), 4).alias("mean_slope"),
        F.round(F.max(slope), 4).alias("max_slope"),
    )


def euclidean_cluster(pts: DataFrame, radius: float) -> DataFrame:
    """Euclidean cluster extraction (the PCL/PDAL segmentation primitive):
    connected components of the radius-neighbor graph.

    ``radius_join`` builds the edge set (grid-cell bucketed equi-join — no
    theta join, AQE handles dense-cell skew); components come from the
    shared Hash-Min label propagation (``dedup.dedup_components``) —
    O(cluster diameter) rounds of one keyed shuffle each, lineage truncated
    per round.  Points with no neighbor within ``radius`` are singleton
    clusters.  ``cluster_id`` is the min pid in the component, so labels
    are stable across engines and runs.

    Input ``(pid, x, y)``; returns ``(pid, cluster_id)``.
    """
    from .dedup import dedup_components

    pairs = radius_join(pts, radius).select(
        F.col("pa").alias("doc_a"), F.col("pb").alias("doc_b")
    )
    labels = dedup_components(pairs, max_rounds=20)
    return (
        pts.select("pid")
        .join(labels.withColumnRenamed("node", "pid"), "pid", "left")
        .select("pid", F.coalesce("label", F.col("pid")).alias("cluster_id"))
    )


def statistical_outlier_removal(
    pts: DataFrame, radius: float, t: float = 2.0
) -> DataFrame:
    """Statistical outlier removal (the PCL ``SOR`` filter, radius flavor):
    score each point by its mean distance to neighbors within ``radius``
    (no-neighbor points get +inf), then drop points whose score exceeds
    ``corpus_mean + t · corpus_stddev``.

    Plan: one ``radius_join`` (grid-bucketed equi-join), one groupBy on pid
    for per-point means, one 1-row global aggregate broadcast back via
    cross-join — the cloud itself shuffles once, on the cell key.  Input
    ``(pid, x, y)``; returns the inlier subset with ``mean_d``.
    """
    pairs = radius_join(pts, radius).localCheckpoint()
    per_pt = (
        pairs.select(F.col("pa").alias("pid"), "d")
        .union(pairs.select(F.col("pb").alias("pid"), "d"))
        .groupBy("pid")
        .agg(F.avg("d").alias("mean_d"))
    )
    scored = pts.join(per_pt, "pid", "left")  # null mean_d = isolated point
    stats = per_pt.agg(
        F.avg("mean_d").alias("mu"), F.stddev_pop("mean_d").alias("sigma")
    )
    return (
        scored.crossJoin(stats)  # 1-row stats frame — broadcast by AQE
        .where(
            F.col("mean_d").isNotNull()
            & (F.col("mean_d") <= F.col("mu") + t * F.col("sigma"))
        )
        .select("pid", "x", "y", F.round("mean_d", 6).alias("mean_d"))
    )


def q_pc_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOR over the sparse deterministic plane (same derivation as
    q_pc_cluster): isolated points and abnormally-far-neighbor points are
    dropped; result rolled up to counts + an exact-micro-unit distance sum
    so the hash is scale-stable."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").alias("pid"),
        ((F.col("p_partkey") * 7) % 2000).cast("double").alias("x"),
        ((F.col("p_partkey") * 13) % 1000).cast("double").alias("y"),
    )
    kept = statistical_outlier_removal(pts, 3.0, t=2.0)
    n_in = pts.count()
    return kept.agg(
        F.lit(n_in).alias("n_input"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.round(F.col("mean_d") * 1e6, 0).cast("long")).alias(
            "sum_mean_d_micro"
        ),
        F.min("pid").alias("min_pid"),
        F.max("pid").alias("max_pid"),
    )


def affine_transform(
    pts: DataFrame,
    matrix: list[list[float]],
    x: str = "x",
    y: str = "y",
    z: str = "z",
) -> DataFrame:
    """Apply a 3×4 affine transform (PDAL ``filters.transformation``):
    ``p' = A·p + t`` with the matrix riding in the plan as literals —
    map-only codegen arithmetic, no UDF, fuses into any scan.  Replaces
    the x/y/z columns (as double) and keeps everything else."""
    cols = [F.col(c).cast("double") for c in (x, y, z)]
    out = {}
    for i, name in enumerate((x, y, z)):
        row = matrix[i]
        expr = F.lit(row[3])
        for j in range(3):
            if row[j]:
                expr = expr + F.lit(row[j]) * cols[j]
        out[name] = expr
    # one simultaneous select: sequential withColumn would feed already-
    # transformed x into y's expression
    others = [c for c in pts.columns if c not in (x, y, z)]
    return pts.select(
        *others, out[x].alias(x), out[y].alias(y), out[z].alias(z)
    )


def q_pc_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90°-rotation + translation of the part plane (exact integer-valued
    matrix so cross-engine sums are exact), verified by aggregate."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").alias("pid"),
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
        (F.col("p_partkey") % 100).cast("double").alias("z"),
    )
    # rotate 90° about z (x,y → -y,x), lift z by 500, shift x by 10000
    m = [
        [0.0, -1.0, 0.0, 10000.0],
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 500.0],
    ]
    out = affine_transform(pts, m)
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum("z").cast("long").alias("sum_z"),
        F.min("x").cast("long").alias("min_x"),
        F.max("y").cast("long").alias("max_y"),
    )


#: crop polygon for q_pc_crop — a convex-ish pentagon over the part plane
CROP_POLY: list[tuple[float, float]] = [
    (100.0, 100.0),
    (1800.0, 50.0),
    (1950.0, 600.0),
    (1000.0, 950.0),
    (150.0, 700.0),
]


def crop_polygon(
    pts: DataFrame, polygon: list[tuple[float, float]], x: str = "x", y: str = "y"
) -> DataFrame:
    """Polygon crop (the PDAL ``filters.crop`` primitive): keep points
    inside a 2-D polygon by even-odd ray casting, expressed entirely as
    codegen'd per-edge expressions — the polygon rides in the plan as
    literals, so the crop is a map-only filter that fuses into any scan at
    any scale (no join, no UDF, no shuffle).

    Edge test (crossing number): an upward ray from the point crosses edge
    ((x1,y1),(x2,y2)) iff the edge straddles the point's y and the
    intersection lies right of the point; odd crossings = inside.
    Boundary points follow the formula's half-open convention — identical
    arithmetic on any engine.
    """
    px, py = F.col(x).cast("double"), F.col(y).cast("double")
    crossings = None
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        straddles = (F.lit(y1) > py) != (F.lit(y2) > py)
        xint = F.lit(x2 - x1) * (py - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
        c = F.when(straddles & (px < xint), 1).otherwise(0)
        crossings = c if crossings is None else crossings + c
    return pts.where(crossings % 2 == 1)


def q_pc_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crop the deterministic part plane to CROP_POLY and roll up — the
    oracle evaluates the same per-edge crossing arithmetic in SQL."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").alias("pid"),
        ((F.col("p_partkey") * 7) % 2000).cast("double").alias("x"),
        ((F.col("p_partkey") * 13) % 1000).cast("double").alias("y"),
    )
    kept = crop_polygon(pts, CROP_POLY)
    return kept.agg(
        F.count(F.lit(1)).alias("n_inside"),
        F.sum("pid").alias("sum_pid"),
        F.round(F.sum("x"), 4).alias("sum_x"),
        F.round(F.sum("y"), 4).alias("sum_y"),
    )


def _crop_oracle_sql() -> str:
    n = len(CROP_POLY)
    terms = []
    for i in range(n):
        x1, y1 = CROP_POLY[i]
        x2, y2 = CROP_POLY[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1} > y) != ({y2} > y)) AND "
            f"(x < ({x2} - {x1}) * (y - {y1}) / ({y2} - {y1}) + {x1}) "
            f"THEN 1 ELSE 0 END)"
        )
    crossings = " + ".join(terms)
    return f"""
        WITH pts AS (
            SELECT p_partkey AS pid,
                   CAST((p_partkey * 7) % 2000 AS DOUBLE) AS x,
                   CAST((p_partkey * 13) % 1000 AS DOUBLE) AS y
            FROM part
        ), kept AS (
            SELECT * FROM pts WHERE ({crossings}) % 2 = 1
        )
        SELECT count(*) AS n_inside,
               CAST(sum(pid) AS BIGINT) AS sum_pid,
               round(sum(x), 4) AS sum_x,
               round(sum(y), 4) AS sum_y
        FROM kept
    """


def q_pc_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean clustering of a sparse deterministic point plane
    (x = partkey*7 mod 2000, y = partkey*13 mod 1000 → ~0.1% area density,
    so radius 3 yields many singletons plus small clusters), rolled up to
    cluster-size distribution stats."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").alias("pid"),
        ((F.col("p_partkey") * 7) % 2000).cast("double").alias("x"),
        ((F.col("p_partkey") * 13) % 1000).cast("double").alias("y"),
    )
    labeled = euclidean_cluster(pts, 3.0)
    sizes = labeled.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("size").alias("n_points"),
        F.sum(F.when(F.col("size") == 1, 1).otherwise(0)).alias("n_singletons"),
        F.max("size").alias("max_size"),
        F.sum("cluster_id").alias("label_checksum"),
    )


def knn_within(pts: DataFrame, radius: float, k: int) -> DataFrame:
    """k nearest neighbors within ``radius`` per point (the PCL/PDAL
    neighborhood primitive behind normals / feature estimation): the
    `radius_join` pair set expanded to both directions, then a per-point
    ``row_number`` window ordered by (distance, neighbor id) — fully
    deterministic, each point keeps its k closest in-radius neighbors.

    Scale shape: the candidate set is bounded by the radius (grid-cell
    equi-join, never theta), and the window partitions by pid, so
    per-partition work is capped by in-radius density — corpus size never
    enters.  Output: ``(pid, nid, d, nn_rank)`` with ``nn_rank <= k``.
    """
    from pyspark.sql import Window

    pairs = radius_join(pts, radius).localCheckpoint()
    directed = pairs.select(
        F.col("pa").alias("pid"), F.col("pb").alias("nid"), "d"
    ).unionAll(
        pairs.select(F.col("pb").alias("pid"), F.col("pa").alias("nid"), "d")
    )
    w = Window.partitionBy("pid").orderBy("d", "nid")
    return directed.withColumn("nn_rank", F.row_number().over(w)).where(
        F.col("nn_rank") <= k
    )


def q_pc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-within-radius over the sparse deterministic point plane of
    `q_pc_cluster` (integer-valued coordinates → squared distances are
    exact when rounded): per-rank neighbor counts, exact integer
    distance-squared sums, distinct-neighbor counts."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").alias("pid"),
        ((F.col("p_partkey") * 7) % 2000).cast("double").alias("x"),
        ((F.col("p_partkey") * 13) % 1000).cast("double").alias("y"),
    )
    nn = knn_within(pts, 40.0, 3)
    return nn.groupBy("nn_rank").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.round(F.col("d") * F.col("d"), 0).cast("long")).alias("sum_d2"),
        F.count_distinct("nid").alias("n_distinct_neighbors"),
        F.min("pid").alias("first_pid"),
    )


def _morph_scatter(surface: DataFrame, axis: str, r: int, fn) -> DataFrame:
    """One separable morphology pass: scatter each cell's value to the
    (2r+1) positions along ``axis`` and take ``fn`` (min = erosion half,
    max = dilation half) per target cell.  Offsets are symmetric, so the
    scatter formulation equals the usual gather; cost is (2r+1)x the
    raster (O(occupied cells), tiny next to the cloud)."""
    shifted = surface.select(
        "gx", "gy", "v", F.explode(F.sequence(F.lit(-r), F.lit(r))).alias("d")
    )
    if axis == "gx":
        proj = shifted.select((F.col("gx") + F.col("d")).alias("gx"), "gy", "v")
    else:
        proj = shifted.select("gx", (F.col("gy") + F.col("d")).alias("gy"), "v")
    return proj.groupBy("gx", "gy").agg(fn("v").alias("v"))


def _morph_open(surface: DataFrame, r: int) -> DataFrame:
    """Morphological opening (erosion then dilation) with a square
    (2r+1)-cell window, decomposed separably: two 1-D min passes then two
    1-D max passes — 4·(2r+1) fan-out instead of (2r+1)^2.  Missing
    raster cells simply don't contribute (sparse-raster semantics; the
    support the opening grows into is clipped by the caller)."""
    er = _morph_scatter(_morph_scatter(surface, "gx", r, F.min), "gy", r, F.min)
    return _morph_scatter(_morph_scatter(er, "gx", r, F.max), "gy", r, F.max)


def pmf_ground(
    pts: DataFrame,
    cell: tuple[float, float],
    stages: list[tuple[int, int]],
    tol: int,
    x: str = "x",
    y: str = "y",
    z: str = "z",
) -> DataFrame:
    """Progressive morphological filter ground classification (Zhang et
    al. 2003; PDAL ``filters.pmf``).  Rasterize min-z per cell, then run
    morphological openings with progressively larger windows; cells whose
    surface drops by more than that stage's threshold are flagged
    non-ground (buildings/vegetation pop out at the matching window
    scale).  Points within ``tol`` of the final opened surface are
    classified ground.

    ``stages`` is ``[(window_radius_cells, dz_threshold), ...]``; z and
    the thresholds must be integer units so both engines agree exactly.
    Scale shape: the cloud is touched twice (one grid aggregate, one
    equi-join back on the cell key — broadcastable raster); all morphology
    runs on the O(cells) raster.

    Adds ``gx``, ``gy``, ``ground_z``, ``is_ground`` and one boolean
    ``flag_<k>`` per stage to the input rows.
    """
    cx, cy = cell
    keyed = pts.withColumn(
        "gx", F.floor(F.col(x) / cx).cast("long")
    ).withColumn("gy", F.floor(F.col(y) / cy).cast("long"))
    surface = keyed.groupBy("gx", "gy").agg(F.min(z).alias("v"))
    support = surface.select("gx", "gy")
    cell_flags = support
    for k, (r, dz) in enumerate(stages, start=1):
        opened = _morph_open(surface, r).join(support, ["gx", "gy"])
        stage = (
            surface.alias("s")
            .join(opened.alias("o"), ["gx", "gy"])
            .select(
                "gx",
                "gy",
                F.col("o.v").alias("v"),
                (F.col("s.v") - F.col("o.v") > dz).alias(f"flag_{k}"),
            )
        )
        cell_flags = cell_flags.join(
            stage.select("gx", "gy", f"flag_{k}"), ["gx", "gy"]
        )
        surface = stage.select("gx", "gy", "v")
    ground = surface.select("gx", "gy", F.col("v").alias("ground_z"))
    return (
        keyed.join(ground, ["gx", "gy"])
        .join(cell_flags, ["gx", "gy"])
        .withColumn("is_ground", F.col(z) - F.col("ground_z") <= tol)
    )


def q_pc_ground(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMF ground classification audit over the part-derived cloud (the
    64x8 grid of `q_pc_hag`, integer micro-unit z): two stages (3x3 then
    5x5 windows), one-row rollup of flagged-cell counts, ground/non-ground
    point counts, and the exact integer residual sum above ground."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("z"),
    )
    cls = pmf_ground(pts, (64.0, 8.0), [(1, 500), (2, 700)], 300)
    cell_id = F.col("gx") * 1024 + F.col("gy")
    return cls.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.count_distinct(cell_id).alias("n_cells"),
        F.count_distinct(F.when(F.col("flag_1"), cell_id)).alias("n_flag1_cells"),
        F.count_distinct(F.when(F.col("flag_2"), cell_id)).alias("n_flag2_cells"),
        F.sum(F.col("is_ground").cast("long")).alias("n_ground"),
        F.sum((~F.col("is_ground")).cast("long")).alias("n_nonground"),
        F.sum(
            F.when(F.col("is_ground"), F.col("z") - F.col("ground_z")).otherwise(
                F.lit(0)
            )
        ).alias("sum_ground_residual"),
    )


QUERIES = {
    "q_zorder": q_zorder,
    "q_pc_ground": q_pc_ground,
    "q_pc_knn": q_pc_knn,
    "q_pc_radius_join": q_pc_radius_join,
    "q_pc_dimensionality": q_pc_dimensionality,
    "q_pc_hag": q_pc_hag,
    "q_pc_slope": q_pc_slope,
    "q_pc_cluster": q_pc_cluster,
    "q_pc_outliers": q_pc_outliers,
    "q_pc_pyramid": q_pc_pyramid,
    "q_pc_crop": q_pc_crop,
    "q_pc_transform": q_pc_transform,
}

ORACLES = {
    "q_pc_knn": """
        WITH pts AS (
            SELECT p_partkey AS pid,
                   CAST((p_partkey * 7) % 2000 AS DOUBLE) AS x,
                   CAST((p_partkey * 13) % 1000 AS DOUBLE) AS y
            FROM part
        ),
        offs AS (
            SELECT dxs.dx, dys.dy
            FROM (SELECT unnest(generate_series(-1, 1)) AS dx) dxs,
                 (SELECT unnest(generate_series(-1, 1)) AS dy) dys
        ),
        home AS (
            SELECT pid AS pb, x AS bx, y AS by,
                   CAST(floor(x / 40.0) AS BIGINT) AS cx,
                   CAST(floor(y / 40.0) AS BIGINT) AS cy
            FROM pts
        ),
        expanded AS (
            SELECT pid AS pa, x AS ax, y AS ay,
                   CAST(floor(x / 40.0) AS BIGINT) + dx AS cx,
                   CAST(floor(y / 40.0) AS BIGINT) + dy AS cy
            FROM pts CROSS JOIN offs
        ),
        pairs AS (
            SELECT pa, pb,
                   sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) AS d
            FROM expanded JOIN home USING (cx, cy)
            WHERE pa < pb
              AND sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) <= 40.0
        ),
        directed AS (
            SELECT pa AS pid, pb AS nid, d FROM pairs
            UNION ALL SELECT pb, pa, d FROM pairs
        ),
        nn AS (
            SELECT pid, nid, d,
                   row_number() OVER (PARTITION BY pid ORDER BY d, nid)
                       AS nn_rank
            FROM directed
        )
        SELECT nn_rank, count(*) AS n_points,
               CAST(sum(round(d * d)) AS BIGINT) AS sum_d2,
               count(DISTINCT nid) AS n_distinct_neighbors,
               min(pid) AS first_pid
        FROM nn WHERE nn_rank <= 3 GROUP BY nn_rank
    """,
    "q_pc_ground": """
        WITH pts AS (
            SELECT CAST(p_partkey AS DOUBLE) AS x, CAST(p_size AS DOUBLE) AS y,
                   CAST(round(p_retailprice * 100, 0) AS BIGINT) AS z
            FROM part
        ), keyed AS (
            SELECT CAST(floor(x / 64.0) AS BIGINT) AS gx,
                   CAST(floor(y / 8.0) AS BIGINT) AS gy, z
            FROM pts
        ), s0 AS (
            SELECT gx, gy, min(z) AS v FROM keyed GROUP BY 1, 2
        ), o1 AS (SELECT unnest([-1, 0, 1]) AS d),
        o2 AS (SELECT unnest([-2, -1, 0, 1, 2]) AS d),
        e1x AS (SELECT gx + d AS gx, gy, min(v) AS v FROM s0, o1 GROUP BY 1, 2),
        e1 AS (SELECT gx, gy + d AS gy, min(v) AS v FROM e1x, o1 GROUP BY 1, 2),
        d1x AS (SELECT gx + d AS gx, gy, max(v) AS v FROM e1, o1 GROUP BY 1, 2),
        d1 AS (SELECT gx, gy + d AS gy, max(v) AS v FROM d1x, o1 GROUP BY 1, 2),
        st1 AS (
            SELECT s.gx, s.gy, o.v AS v, s.v - o.v > 500 AS flag_1
            FROM s0 s JOIN d1 o USING (gx, gy)
        ),
        e2x AS (SELECT gx + d AS gx, gy, min(v) AS v FROM st1, o2 GROUP BY 1, 2),
        e2 AS (SELECT gx, gy + d AS gy, min(v) AS v FROM e2x, o2 GROUP BY 1, 2),
        d2x AS (SELECT gx + d AS gx, gy, max(v) AS v FROM e2, o2 GROUP BY 1, 2),
        d2 AS (SELECT gx, gy + d AS gy, max(v) AS v FROM d2x, o2 GROUP BY 1, 2),
        st2 AS (
            SELECT s.gx, s.gy, o.v AS ground_z, s.flag_1,
                   s.v - o.v > 700 AS flag_2
            FROM st1 s JOIN d2 o USING (gx, gy)
        ),
        cls AS (
            SELECT k.gx, k.gy, k.z, c.ground_z, c.flag_1, c.flag_2,
                   k.z - c.ground_z <= 300 AS is_ground
            FROM keyed k JOIN st2 c USING (gx, gy)
        )
        SELECT count(*) AS n_points,
               count(DISTINCT gx * 1024 + gy) AS n_cells,
               count(DISTINCT CASE WHEN flag_1 THEN gx * 1024 + gy END)
                   AS n_flag1_cells,
               count(DISTINCT CASE WHEN flag_2 THEN gx * 1024 + gy END)
                   AS n_flag2_cells,
               CAST(sum(CASE WHEN is_ground THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ground,
               CAST(sum(CASE WHEN is_ground THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_nonground,
               CAST(sum(CASE WHEN is_ground THEN z - ground_z ELSE 0 END)
                    AS BIGINT) AS sum_ground_residual
        FROM cls
    """,
    "q_pc_transform": """
        WITH pts AS (
            SELECT CAST(p_partkey AS DOUBLE) AS x,
                   CAST(p_size AS DOUBLE) AS y,
                   CAST(p_partkey % 100 AS DOUBLE) AS z
            FROM part
        ), t AS (
            SELECT 10000.0 - y AS x, x AS y, z + 500.0 AS z FROM pts
        )
        SELECT count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sum_x,
               CAST(sum(y) AS BIGINT) AS sum_y,
               CAST(sum(z) AS BIGINT) AS sum_z,
               CAST(min(x) AS BIGINT) AS min_x,
               CAST(max(y) AS BIGINT) AS max_y
        FROM t
    """,
    "q_pc_crop": _crop_oracle_sql(),
    "q_pc_pyramid": """
        WITH pts AS (
            SELECT CAST(p_partkey AS DOUBLE) AS x, CAST(p_size AS DOUBLE) AS y
            FROM part
        ),
        lv AS (SELECT unnest(generate_series(0, 3)) AS level),
        cells AS (
            SELECT level,
                   floor(x / (64.0 * pow(2, level))) AS vx,
                   floor(y / (8.0 * pow(2, level))) AS vy,
                   count(*) AS n_pts,
                   sum(x) AS sx
            FROM pts CROSS JOIN lv
            GROUP BY 1, 2, 3
        )
        SELECT level,
               count(*) AS n_cells,
               CAST(sum(n_pts) AS BIGINT) AS n_points,
               CAST(max(n_pts) AS BIGINT) AS max_cell,
               CAST(sum(CAST(round(round(sx / n_pts, 6) * 1e6, 0) AS BIGINT))
                    AS BIGINT) AS sum_cx_micro
        FROM cells GROUP BY level
    """,
    "q_pc_outliers": """
        WITH pts AS (
            SELECT p_partkey AS pid,
                   CAST((p_partkey * 7) % 2000 AS DOUBLE) AS x,
                   CAST((p_partkey * 13) % 1000 AS DOUBLE) AS y
            FROM part
        ),
        offs AS (
            SELECT dxs.dx, dys.dy
            FROM (SELECT unnest(generate_series(-1, 1)) AS dx) dxs,
                 (SELECT unnest(generate_series(-1, 1)) AS dy) dys
        ),
        home AS (
            SELECT pid AS pb, x AS bx, y AS by,
                   CAST(floor(x / 3.0) AS BIGINT) AS cx,
                   CAST(floor(y / 3.0) AS BIGINT) AS cy
            FROM pts
        ),
        expanded AS (
            SELECT pid AS pa, x AS ax, y AS ay,
                   CAST(floor(x / 3.0) AS BIGINT) + dx AS cx,
                   CAST(floor(y / 3.0) AS BIGINT) + dy AS cy
            FROM pts CROSS JOIN offs
        ),
        pairs AS (
            SELECT pa, pb,
                   sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) AS d
            FROM expanded JOIN home USING (cx, cy)
            WHERE pa < pb
              AND sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) <= 3.0
        ),
        per_pt AS (
            SELECT pid, avg(d) AS mean_d FROM (
                SELECT pa AS pid, d FROM pairs
                UNION ALL SELECT pb, d FROM pairs
            ) GROUP BY pid
        ),
        stats AS (
            SELECT avg(mean_d) AS mu, stddev_pop(mean_d) AS sigma FROM per_pt
        ),
        kept AS (
            SELECT p.pid, p.mean_d
            FROM per_pt p, stats s
            WHERE p.mean_d <= s.mu + 2.0 * s.sigma
        )
        SELECT (SELECT count(*) FROM pts) AS n_input,
               count(*) AS n_kept,
               CAST(sum(CAST(round(mean_d * 1e6, 0) AS BIGINT)) AS BIGINT)
                   AS sum_mean_d_micro,
               min(pid) AS min_pid,
               max(pid) AS max_pid
        FROM kept
    """,
    "q_pc_cluster": """
        WITH RECURSIVE pts AS (
            SELECT p_partkey AS pid,
                   CAST((p_partkey * 7) % 2000 AS DOUBLE) AS x,
                   CAST((p_partkey * 13) % 1000 AS DOUBLE) AS y
            FROM part
        ),
        offs AS (
            SELECT dxs.dx, dys.dy
            FROM (SELECT unnest(generate_series(-1, 1)) AS dx) dxs,
                 (SELECT unnest(generate_series(-1, 1)) AS dy) dys
        ),
        home AS (
            SELECT pid AS pb, x AS bx, y AS by,
                   CAST(floor(x / 3.0) AS BIGINT) AS cx,
                   CAST(floor(y / 3.0) AS BIGINT) AS cy
            FROM pts
        ),
        expanded AS (
            SELECT pid AS pa, x AS ax, y AS ay,
                   CAST(floor(x / 3.0) AS BIGINT) + dx AS cx,
                   CAST(floor(y / 3.0) AS BIGINT) + dy AS cy
            FROM pts CROSS JOIN offs
        ),
        pairs AS (
            SELECT pa, pb
            FROM expanded JOIN home USING (cx, cy)
            WHERE pa < pb
              AND sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) <= 3.0
        ),
        edges AS (
            SELECT pa AS a, pb AS b FROM pairs
            UNION SELECT pb, pa FROM pairs
        ),
        reach AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        lab AS (
            SELECT a AS node, least(a, min(b)) AS cluster_id
            FROM reach GROUP BY a
        ),
        labeled AS (
            SELECT p.pid, coalesce(l.cluster_id, p.pid) AS cluster_id
            FROM pts p LEFT JOIN lab l ON l.node = p.pid
        ),
        sizes AS (
            SELECT cluster_id, count(*) AS size
            FROM labeled GROUP BY cluster_id
        )
        SELECT count(*) AS n_clusters,
               CAST(sum(size) AS BIGINT) AS n_points,
               CAST(sum(CASE WHEN size = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_singletons,
               CAST(max(size) AS BIGINT) AS max_size,
               CAST(sum(cluster_id) AS BIGINT) AS label_checksum
        FROM sizes
    """,
    "q_zorder": f"""
        WITH keyed AS (
            SELECT p_partkey,
                   CAST(list_sum(list_transform(generate_series(0, {MORTON_BITS - 1}),
                       i -> ((((p_partkey % 1024) >> i) & 1) << (2*i))
                            + (((p_size >> i) & 1) << (2*i + 1))
                   )) AS BIGINT) AS morton
            FROM part
        )
        SELECT morton >> {2 * MORTON_BITS - 2} AS quadrant,
               count(*) AS n,
               CAST(min(morton) AS BIGINT) AS min_key,
               CAST(max(morton) AS BIGINT) AS max_key,
               CAST(sum(morton) AS BIGINT) AS sum_keys
        FROM keyed GROUP BY 1
    """,
    "q_pc_hag": """
        WITH pts AS (
            SELECT CAST(p_partkey AS DOUBLE) AS x,
                   CAST(p_size AS DOUBLE) AS y,
                   CAST(round(p_retailprice * 100, 0) AS BIGINT) AS z
            FROM part
        ),
        keyed AS (
            SELECT *, CAST(floor(x / 64.0) AS BIGINT) AS gx,
                      CAST(floor(y / 8.0) AS BIGINT) AS gy
            FROM pts
        ),
        ground AS (
            SELECT gx, gy, min(z) AS ground_z FROM keyed GROUP BY gx, gy
        )
        SELECT CAST(least(floor((k.z - g.ground_z) / 250.0), 9) AS INT)
                   AS hag_bucket,
               count(*) AS n_points,
               CAST(sum(k.z - g.ground_z) AS BIGINT) AS sum_hag,
               max(k.z - g.ground_z) AS max_hag
        FROM keyed k JOIN ground g USING (gx, gy)
        GROUP BY 1
    """,
    "q_pc_slope": """
        WITH pts AS (
            SELECT CAST(p_partkey AS DOUBLE) AS x,
                   CAST(p_size AS DOUBLE) AS y,
                   CAST(round(p_retailprice * 100, 0) AS BIGINT) AS z
            FROM part
        ),
        ground AS (
            SELECT CAST(floor(x / 64.0) AS BIGINT) AS gx,
                   CAST(floor(y / 8.0) AS BIGINT) AS gy,
                   min(z) AS gz
            FROM pts GROUP BY 1, 2
        ),
        grad AS (
            SELECT g.gx, g.gy,
                   (r.gz - g.gz) / 64.0 AS dzdx,
                   (u.gz - g.gz) / 8.0 AS dzdy
            FROM ground g
            JOIN ground r ON r.gx = g.gx + 1 AND r.gy = g.gy
            JOIN ground u ON u.gx = g.gx AND u.gy = g.gy + 1
        )
        SELECT CAST(least(floor(sqrt(dzdx*dzdx + dzdy*dzdy) / 100), 9) AS INT)
                   AS slope_bucket,
               count(*) AS n_cells,
               round(avg(sqrt(dzdx*dzdx + dzdy*dzdy)), 4) AS mean_slope,
               round(max(sqrt(dzdx*dzdx + dzdy*dzdy)), 4) AS max_slope
        FROM grad GROUP BY 1
    """,
    "q_pc_radius_join": """
        WITH pts AS (
            SELECT p_partkey AS pid,
                   CAST(p_partkey AS DOUBLE) AS x,
                   CAST(p_size AS DOUBLE) AS y
            FROM part
        ),
        offs AS (
            SELECT dxs.dx, dys.dy
            FROM (SELECT unnest(generate_series(-1, 1)) AS dx) dxs,
                 (SELECT unnest(generate_series(-1, 1)) AS dy) dys
        ),
        home AS (
            SELECT pid AS pb, x AS bx, y AS by,
                   CAST(floor(x / 3.0) AS BIGINT) AS cx,
                   CAST(floor(y / 3.0) AS BIGINT) AS cy
            FROM pts
        ),
        expanded AS (
            SELECT pid AS pa, x AS ax, y AS ay,
                   CAST(floor(x / 3.0) AS BIGINT) + dx AS cx,
                   CAST(floor(y / 3.0) AS BIGINT) + dy AS cy
            FROM pts CROSS JOIN offs
        ),
        pairs AS (
            SELECT pa, pb,
                   sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) AS d
            FROM expanded JOIN home USING (cx, cy)
            WHERE pa < pb
              AND sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) <= 3.0
        )
        SELECT (SELECT count(*) FROM pairs) AS n_pairs,
               (SELECT round(avg(d), 6) FROM pairs) AS avg_dist,
               (SELECT round(max(d), 6) FROM pairs) AS max_dist,
               (SELECT count(DISTINCT pid) FROM
                   (SELECT pa AS pid FROM pairs
                    UNION ALL SELECT pb FROM pairs)) AS n_points_with_neighbor
    """,
    "q_pc_dimensionality": """
        WITH pts AS (
            SELECT p_partkey AS pid,
                   CAST(p_partkey AS DOUBLE) AS x,
                   CAST(p_size AS DOUBLE) AS y
            FROM part
        ),
        offs AS (
            SELECT dxs.dx, dys.dy
            FROM (SELECT unnest(generate_series(-1, 1)) AS dx) dxs,
                 (SELECT unnest(generate_series(-1, 1)) AS dy) dys
        ),
        home AS (
            SELECT pid AS pb, x AS bx, y AS by,
                   CAST(floor(x / 3.0) AS BIGINT) AS cx,
                   CAST(floor(y / 3.0) AS BIGINT) AS cy
            FROM pts
        ),
        expanded AS (
            SELECT pid AS pa, x AS ax, y AS ay,
                   CAST(floor(x / 3.0) AS BIGINT) + dx AS cx,
                   CAST(floor(y / 3.0) AS BIGINT) + dy AS cy
            FROM pts CROSS JOIN offs
        ),
        pairs AS (
            SELECT pa, pb
            FROM expanded JOIN home USING (cx, cy)
            WHERE pa < pb
              AND sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) <= 3.0
        ),
        nb AS (
            SELECT pa AS pid, pb AS nb FROM pairs
            UNION ALL SELECT pb, pa FROM pairs
            UNION ALL SELECT pid, pid FROM pts
        ),
        sums AS (
            SELECT nb.pid, count(*) AS n_nb,
                   sum(c.nx) AS sx, sum(c.ny) AS sy,
                   sum(c.nx * c.nx) AS sxx, sum(c.nx * c.ny) AS sxy,
                   sum(c.ny * c.ny) AS syy
            FROM nb JOIN (SELECT pid AS nb, x AS nx, y AS ny FROM pts) c
                 USING (nb)
            GROUP BY nb.pid
            HAVING count(*) >= 3
        ),
        feats AS (
            SELECT pid, n_nb,
                   round((tr + disc) / 2, 6) AS lam1,
                   round((tr - disc) / 2, 6) AS lam2,
                   round(((tr + disc) / 2 - (tr - disc) / 2)
                         / ((tr + disc) / 2), 6) AS linearity
            FROM (
                SELECT pid, n_nb, cxx + cyy AS tr,
                       sqrt(greatest((cxx - cyy) * (cxx - cyy)
                                     + 4 * cxy * cxy, 0.0)) AS disc
                FROM (
                    SELECT pid, n_nb,
                           sxx / n - (sx / n) * (sx / n) AS cxx,
                           sxy / n - (sx / n) * (sy / n) AS cxy,
                           syy / n - (sy / n) * (sy / n) AS cyy
                    FROM (SELECT *, CAST(n_nb AS DOUBLE) AS n FROM sums)
                )
            )
        )
        SELECT CAST(least(CAST(floor(linearity * 10) AS BIGINT), 9) AS INT)
                   AS lin_decile,
               count(*) AS n_points,
               round(sum(lam1), 4) AS sum_lam1,
               round(sum(lam2), 4) AS sum_lam2,
               CAST(sum(n_nb) AS BIGINT) AS sum_nb
        FROM feats GROUP BY 1
    """,
}


# hillshade illumination constants (GDAL `gdaldem hillshade` defaults):
# azimuth 315°, altitude 45°.  Pre-evaluated in Python and injected as the
# SAME double literals into both engines so only sqrt/trig evaluation
# (sub-ulp identical in practice, and rounded before compare) remains.
import math as _math

_HS_COS_ZEN = _math.cos(_math.radians(90.0 - 45.0))
_HS_SIN_ZEN = _math.sin(_math.radians(90.0 - 45.0))
_HS_AZ_RAD = _math.radians(315.0)


def q_pc_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terrain hillshade (Horn's method, as in GDAL ``gdaldem
    hillshade``): the `q_pc_slope` finite-difference gradient raster →
    slope/aspect → illumination under a 315°/45° light, clipped at 0 and
    bucketed into an 8-bin brightness histogram.  Everything runs on the
    O(cells) ground raster — the cloud is touched once for the min-z
    grid; the two neighbor joins and the trig are raster-sized."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("z"),
    )
    cs_x, cs_y = 64.0, 8.0
    ground = pts.groupBy(
        F.floor(F.col("x") / cs_x).cast("long").alias("gx"),
        F.floor(F.col("y") / cs_y).cast("long").alias("gy"),
    ).agg(F.min("z").alias("gz"))
    right = ground.select(
        (F.col("gx") - 1).alias("gx"), "gy", F.col("gz").alias("gz_xp")
    )
    up = ground.select(
        "gx", (F.col("gy") - 1).alias("gy"), F.col("gz").alias("gz_yp")
    )
    grad = (
        ground.join(right, ["gx", "gy"])
        .join(up, ["gx", "gy"])
        .select(
            ((F.col("gz_xp") - F.col("gz")) / F.lit(cs_x)).alias("dzdx"),
            ((F.col("gz_yp") - F.col("gz")) / F.lit(cs_y)).alias("dzdy"),
        )
    )
    slope_rad = F.atan(
        F.sqrt(
            F.col("dzdx") * F.col("dzdx") + F.col("dzdy") * F.col("dzdy")
        )
    )
    aspect = F.atan2(F.col("dzdy"), -F.col("dzdx"))
    shade = F.greatest(
        F.lit(255.0)
        * (
            F.lit(_HS_COS_ZEN) * F.cos(slope_rad)
            + F.lit(_HS_SIN_ZEN)
            * F.sin(slope_rad)
            * F.cos(F.lit(_HS_AZ_RAD) - aspect)
        ),
        F.lit(0.0),
    )
    bucket = F.least(F.floor(F.col("shade") / 32), F.lit(7)).cast("int")
    return grad.select(shade.alias("shade")).groupBy(
        bucket.alias("shade_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.avg("shade"), 4).alias("mean_shade"),
        F.round(F.min("shade"), 4).alias("min_shade"),
        F.round(F.max("shade"), 4).alias("max_shade"),
    )


QUERIES["q_pc_hillshade"] = q_pc_hillshade

ORACLES["q_pc_hillshade"] = f"""
    WITH pts AS (
        SELECT CAST(p_partkey AS DOUBLE) AS x, CAST(p_size AS DOUBLE) AS y,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS z
        FROM part
    ), ground AS (
        SELECT CAST(floor(x / 64.0) AS BIGINT) AS gx,
               CAST(floor(y / 8.0) AS BIGINT) AS gy, min(z) AS gz
        FROM pts GROUP BY 1, 2
    ), grad AS (
        SELECT (r.gz - g.gz) / 64.0 AS dzdx,
               (u.gz - g.gz) / 8.0 AS dzdy
        FROM ground g
        JOIN ground r ON r.gx = g.gx + 1 AND r.gy = g.gy
        JOIN ground u ON u.gx = g.gx AND u.gy = g.gy + 1
    ), sh AS (
        SELECT greatest(
            255.0 * ({_HS_COS_ZEN!r} * cos(atan(sqrt(dzdx*dzdx + dzdy*dzdy)))
                   + {_HS_SIN_ZEN!r} * sin(atan(sqrt(dzdx*dzdx + dzdy*dzdy)))
                     * cos({_HS_AZ_RAD!r} - atan2(dzdy, -dzdx))),
            0.0) AS shade
        FROM grad
    )
    SELECT CAST(least(floor(shade / 32), 7) AS INTEGER) AS shade_bucket,
           count(*) AS n_cells,
           round(avg(shade), 4) AS mean_shade,
           round(min(shade), 4) AS min_shade,
           round(max(shade), 4) AS max_shade
    FROM sh GROUP BY 1
"""


#: shared plan/oracle literals for the normal-orientation math (evaluated
#: once in Python, injected identically into both engines).
_PI = _math.pi
_HALF_PI = _math.pi / 2
_NORMAL_BIN = _math.pi / 8


def normal_angles(pts: DataFrame, radius: float) -> DataFrame:
    """Per-point 2-D normal estimation (PCL ``NormalEstimation`` in the
    plane): the neighborhood structure tensor's principal direction is
    ``0.5*atan2(2*cxy, cxx - cyy)`` (closed form — no iterative eigen
    solve), the normal is its perpendicular, reported as an orientation in
    ``[0, pi)`` (normals are sign-less).  Also returns ``anisotropy``
    (= linearity) as the confidence of the direction.

    Same cost profile as :func:`dimensionality_features`: one cell join +
    one point groupBy, everything else map-side closed-form arithmetic.
    """
    sums = _structure_sums(pts, radius)
    n = F.col("n_nb").cast("double")
    cxx = F.col("sxx") / n - (F.col("sx") / n) * (F.col("sx") / n)
    cxy = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    cyy = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    tr = cxx + cyy
    disc = F.sqrt(
        F.greatest((cxx - cyy) * (cxx - cyy) + 4 * cxy * cxy, F.lit(0.0))
    )
    lam1 = (tr + disc) / 2
    lam2 = (tr - disc) / 2
    theta_p = F.lit(0.5) * F.atan2(F.lit(2.0) * cxy, cxx - cyy)
    theta_n = F.pmod(theta_p + F.lit(_HALF_PI), F.lit(_PI))
    return sums.where(lam1 > 0).select(
        "pid",
        "n_nb",
        theta_n.alias("normal_theta"),
        ((lam1 - lam2) / lam1).alias("anisotropy"),
    )


def q_pc_normals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normal orientations (r=3) on the part-derived plane, rolled up into
    an 8-bin orientation histogram with anisotropy confidence — certifies
    the closed-form eigenvector math across every neighborhood."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").alias("pid"),
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
    )
    na = normal_angles(pts, 3.0)
    bucket = F.least(
        F.floor(F.col("normal_theta") / F.lit(_NORMAL_BIN)), F.lit(7)
    ).cast("int")
    return na.groupBy(bucket.alias("theta_bin")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("normal_theta"), 4).alias("sum_theta"),
        F.round(F.avg("anisotropy"), 4).alias("mean_anisotropy"),
        F.sum("n_nb").alias("sum_nb"),
    )


QUERIES["q_pc_normals"] = q_pc_normals

ORACLES["q_pc_normals"] = f"""
    WITH pts AS (
        SELECT p_partkey AS pid,
               CAST(p_partkey AS DOUBLE) AS x,
               CAST(p_size AS DOUBLE) AS y
        FROM part
    ),
    offs AS (
        SELECT dxs.dx, dys.dy
        FROM (SELECT unnest(generate_series(-1, 1)) AS dx) dxs,
             (SELECT unnest(generate_series(-1, 1)) AS dy) dys
    ),
    home AS (
        SELECT pid AS pb, x AS bx, y AS by,
               CAST(floor(x / 3.0) AS BIGINT) AS cx,
               CAST(floor(y / 3.0) AS BIGINT) AS cy
        FROM pts
    ),
    expanded AS (
        SELECT pid AS pa, x AS ax, y AS ay,
               CAST(floor(x / 3.0) AS BIGINT) + dx AS cx,
               CAST(floor(y / 3.0) AS BIGINT) + dy AS cy
        FROM pts CROSS JOIN offs
    ),
    pairs AS (
        SELECT pa, pb
        FROM expanded JOIN home USING (cx, cy)
        WHERE pa < pb
          AND sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) <= 3.0
    ),
    nb AS (
        SELECT pa AS pid, pb AS nb FROM pairs
        UNION ALL SELECT pb, pa FROM pairs
        UNION ALL SELECT pid, pid FROM pts
    ),
    sums AS (
        SELECT nb.pid, count(*) AS n_nb,
               sum(c.nx) AS sx, sum(c.ny) AS sy,
               sum(c.nx * c.nx) AS sxx, sum(c.nx * c.ny) AS sxy,
               sum(c.ny * c.ny) AS syy
        FROM nb JOIN (SELECT pid AS nb, x AS nx, y AS ny FROM pts) c
             USING (nb)
        GROUP BY nb.pid
        HAVING count(*) >= 3
    ),
    feats AS (
        SELECT pid, n_nb,
               fmod(0.5 * atan2(2.0 * cxy, cxx - cyy) + {_HALF_PI!r},
                    {_PI!r}) AS normal_theta,
               ((tr + disc) / 2 - (tr - disc) / 2) / ((tr + disc) / 2)
                   AS anisotropy,
               (tr + disc) / 2 AS lam1
        FROM (
            SELECT pid, n_nb, cxx, cxy, cyy, cxx + cyy AS tr,
                   sqrt(greatest((cxx - cyy) * (cxx - cyy)
                                 + 4 * cxy * cxy, 0.0)) AS disc
            FROM (
                SELECT pid, n_nb,
                       sxx / n - (sx / n) * (sx / n) AS cxx,
                       sxy / n - (sx / n) * (sy / n) AS cxy,
                       syy / n - (sy / n) * (sy / n) AS cyy
                FROM (SELECT *, CAST(n_nb AS DOUBLE) AS n FROM sums)
            )
        )
    )
    SELECT CAST(least(CAST(floor(normal_theta / {_NORMAL_BIN!r}) AS BIGINT),
                      7) AS INT) AS theta_bin,
           count(*) AS n_points,
           round(sum(normal_theta), 4) AS sum_theta,
           round(avg(anisotropy), 4) AS mean_anisotropy,
           CAST(sum(n_nb) AS BIGINT) AS sum_nb
    FROM feats WHERE lam1 > 0 GROUP BY 1
"""


def mls_residuals(pts: DataFrame, radius: float) -> DataFrame:
    """Moving-least-squares surface fit (PCL ``MovingLeastSquares``,
    plane flavor): per point, fit ``z = z̄ + b·(x-x̄) + c·(y-ȳ)`` by least
    squares over the radius neighborhood (closed-form 2×2 solve on
    centered moments — no iteration, no UDF) and report the point's
    residual against its own fitted surface.  Degenerate neighborhoods
    (|det| <= 1e-9: collinear supports) fall back to the neighborhood
    mean.  Cost profile = `dimensionality_features` (one cell join + one
    keyed aggregate); the solve is map-side arithmetic.

    Input ``(pid, x, y, z)``; output ``(pid, n_nb, residual)`` for
    points with >= 3 neighborhood members."""
    pairs = radius_join(pts.select("pid", "x", "y"), radius).localCheckpoint()
    nb = (
        pairs.select(F.col("pa").alias("pid"), F.col("pb").alias("nb"))
        .union(pairs.select(F.col("pb").alias("pid"), F.col("pa").alias("nb")))
        .union(pts.select(F.col("pid"), F.col("pid").alias("nb")))
    )
    coords = pts.select(
        F.col("pid").alias("nb"),
        F.col("x").alias("nx"),
        F.col("y").alias("ny"),
        F.col("z").cast("double").alias("nz"),
    )
    sums = (
        nb.join(coords, "nb")
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n_nb"),
            F.sum("nx").alias("sx"),
            F.sum("ny").alias("sy"),
            F.sum("nz").alias("sz"),
            F.sum(F.col("nx") * F.col("nx")).alias("sxx"),
            F.sum(F.col("nx") * F.col("ny")).alias("sxy"),
            F.sum(F.col("ny") * F.col("ny")).alias("syy"),
            F.sum(F.col("nx") * F.col("nz")).alias("sxz"),
            F.sum(F.col("ny") * F.col("nz")).alias("syz"),
        )
        .where(F.col("n_nb") >= 3)
    )
    own = pts.select(
        "pid", F.col("x").alias("px"), F.col("y").alias("py"),
        F.col("z").cast("double").alias("pz"),
    )
    j = sums.join(own, "pid")
    n = F.col("n_nb").cast("double")
    mxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    mxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    myy = F.col("syy") - F.col("sy") * F.col("sy") / n
    mxz = F.col("sxz") - F.col("sx") * F.col("sz") / n
    myz = F.col("syz") - F.col("sy") * F.col("sz") / n
    det = mxx * myy - mxy * mxy
    b = (myy * mxz - mxy * myz) / det
    c = (mxx * myz - mxy * mxz) / det
    zbar = F.col("sz") / n
    fitted = F.when(
        F.abs(det) > 1e-9,
        zbar
        + b * (F.col("px") - F.col("sx") / n)
        + c * (F.col("py") - F.col("sy") / n),
    ).otherwise(zbar)
    return j.select(
        "pid", "n_nb", (F.col("pz") - fitted).alias("residual")
    )


def q_pc_mls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLS plane-fit residuals (r=40) over the sparse deterministic
    plane of `q_pc_cluster` with a position-uncorrelated height
    (z = (partkey mod 97)*100 — rough terrain, so the local fit has real
    residuals to measure): |residual| histogram with
    conservative rounding so cross-engine double-summation order can
    never move a digit."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").alias("pid"),
        ((F.col("p_partkey") * 7) % 2000).cast("double").alias("x"),
        ((F.col("p_partkey") * 13) % 1000).cast("double").alias("y"),
        ((F.col("p_partkey") % 97) * 100).cast("long").alias("z"),
    )
    res = mls_residuals(pts, 40.0)
    bucket = F.least(
        F.floor(F.abs(F.col("residual")) / 500), F.lit(7)
    ).cast("int")
    return res.groupBy(bucket.alias("resid_bucket")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum(F.abs(F.col("residual"))), 2).alias("sum_abs_resid"),
        F.round(F.max(F.abs(F.col("residual"))), 4).alias("max_abs_resid"),
        F.sum("n_nb").alias("sum_nb"),
    )


QUERIES["q_pc_mls"] = q_pc_mls

ORACLES["q_pc_mls"] = """
    WITH pts AS (
        SELECT p_partkey AS pid,
               CAST((p_partkey * 7) % 2000 AS DOUBLE) AS x,
               CAST((p_partkey * 13) % 1000 AS DOUBLE) AS y,
               CAST((p_partkey % 97) * 100 AS DOUBLE) AS z
        FROM part
    ),
    offs AS (
        SELECT dxs.dx, dys.dy
        FROM (SELECT unnest(generate_series(-1, 1)) AS dx) dxs,
             (SELECT unnest(generate_series(-1, 1)) AS dy) dys
    ),
    home AS (
        SELECT pid AS pb, x AS bx, y AS by,
               CAST(floor(x / 40.0) AS BIGINT) AS cx,
               CAST(floor(y / 40.0) AS BIGINT) AS cy
        FROM pts
    ),
    expanded AS (
        SELECT pid AS pa, x AS ax, y AS ay,
               CAST(floor(x / 40.0) AS BIGINT) + dx AS cx,
               CAST(floor(y / 40.0) AS BIGINT) + dy AS cy
        FROM pts CROSS JOIN offs
    ),
    pairs AS (
        SELECT pa, pb
        FROM expanded JOIN home USING (cx, cy)
        WHERE pa < pb
          AND sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) <= 40.0
    ),
    nb AS (
        SELECT pa AS pid, pb AS nb FROM pairs
        UNION ALL SELECT pb, pa FROM pairs
        UNION ALL SELECT pid, pid FROM pts
    ),
    sums AS (
        SELECT nb.pid, count(*) AS n_nb,
               sum(c.nx) AS sx, sum(c.ny) AS sy, sum(c.nz) AS sz,
               sum(c.nx * c.nx) AS sxx, sum(c.nx * c.ny) AS sxy,
               sum(c.ny * c.ny) AS syy, sum(c.nx * c.nz) AS sxz,
               sum(c.ny * c.nz) AS syz
        FROM nb JOIN (SELECT pid AS nb, x AS nx, y AS ny, z AS nz FROM pts) c
             USING (nb)
        GROUP BY nb.pid
        HAVING count(*) >= 3
    ),
    resid AS (
        SELECT s.pid, s.n_nb,
               p.z - (CASE WHEN abs(det) > 1e-9
                      THEN sz / n + ((myy * mxz - mxy * myz) / det)
                               * (p.x - sx / n)
                           + ((mxx * myz - mxy * mxz) / det)
                               * (p.y - sy / n)
                      ELSE sz / n END) AS residual
        FROM (
            SELECT *,
                   sxx - sx * sx / n AS mxx,
                   sxy - sx * sy / n AS mxy,
                   syy - sy * sy / n AS myy,
                   sxz - sx * sz / n AS mxz,
                   syz - sy * sz / n AS myz,
                   (sxx - sx * sx / n) * (syy - sy * sy / n)
                       - (sxy - sx * sy / n) * (sxy - sx * sy / n) AS det
            FROM (SELECT *, CAST(n_nb AS DOUBLE) AS n FROM sums)
        ) s
        JOIN pts p USING (pid)
    )
    SELECT CAST(least(CAST(floor(abs(residual) / 500) AS BIGINT), 7) AS INT)
               AS resid_bucket,
           count(*) AS n_points,
           round(sum(abs(residual)), 2) AS sum_abs_resid,
           round(max(abs(residual)), 4) AS max_abs_resid,
           CAST(sum(n_nb) AS BIGINT) AS sum_nb
    FROM resid GROUP BY 1
"""


# range-image binning constants: grid width (azimuth) × height (elevation),
# and π injected as the SAME double literal into both engines (the _HS_
# playbook — Spark and DuckDB trig agree on identical double inputs).
_RI_W = 64
_RI_H = 16
_RI_PI = _math.pi


def q_pc_rangeimage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical range-image projection — the LiDAR preprocessing step
    behind range-image compression, spinning-sensor ordering, and
    RangeNet-style learning: each point maps to an (azimuth, elevation)
    pixel from the sensor origin; per pixel keep the closest return and
    occupancy stats.

    Plan shape: pure codegen trig per point (atan2/sqrt — no UDF), one
    hash aggregate on the pixel key.  At 100 TB this is a single map +
    combine-heavy shuffle of at most W×H×files rows.  Ranges compare as
    exact integer tenth-millimeter units so min() is engine-portable."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("zi"),
    ).withColumn("z", F.col("zi").cast("double"))
    r = F.sqrt(F.col("x") * F.col("x") + F.col("y") * F.col("y") + F.col("z") * F.col("z"))
    az = F.atan2(F.col("y"), F.col("x"))
    el = F.atan2(F.col("z"), F.sqrt(F.col("x") * F.col("x") + F.col("y") * F.col("y")))
    pi = F.lit(_RI_PI)
    az_bin = F.least(
        F.floor((az + pi) / (2 * pi) * _RI_W), F.lit(_RI_W - 1)
    ).cast("int")
    el_bin = F.least(
        F.floor((el + pi / 2) / pi * _RI_H), F.lit(_RI_H - 1)
    ).cast("int")
    range_tmm = F.floor(r * 1e4 + 0.5)  # tenth-millimeter integer units
    return (
        pts.select(az_bin.alias("az_bin"), el_bin.alias("el_bin"), range_tmm.alias("rt"))
        .groupBy("az_bin", "el_bin")
        .agg(
            F.count(F.lit(1)).alias("n_returns"),
            F.min("rt").alias("min_range_tmm"),
            F.max("rt").alias("max_range_tmm"),
            F.sum("rt").alias("sum_range_tmm"),
        )
    )


QUERIES["q_pc_rangeimage"] = q_pc_rangeimage

ORACLES["q_pc_rangeimage"] = f"""
    WITH pts AS (
        SELECT CAST(p_partkey AS DOUBLE) AS x,
               CAST(p_size AS DOUBLE) AS y,
               CAST(CAST(round(p_retailprice * 100, 0) AS BIGINT) AS DOUBLE) AS z
        FROM part
    ),
    px AS (
        SELECT CAST(least(floor((atan2(y, x) + {_RI_PI!r}) / (2 * {_RI_PI!r}) * {_RI_W}),
                          {_RI_W - 1}) AS INTEGER) AS az_bin,
               CAST(least(floor((atan2(z, sqrt(x*x + y*y)) + {_RI_PI!r} / 2)
                                / {_RI_PI!r} * {_RI_H}),
                          {_RI_H - 1}) AS INTEGER) AS el_bin,
               CAST(floor(sqrt(x*x + y*y + z*z) * 1e4 + 0.5) AS BIGINT) AS rt
        FROM pts
    )
    SELECT az_bin, el_bin,
           count(*) AS n_returns,
           CAST(min(rt) AS BIGINT) AS min_range_tmm,
           CAST(max(rt) AS BIGINT) AS max_range_tmm,
           CAST(sum(rt) AS BIGINT) AS sum_range_tmm
    FROM px GROUP BY az_bin, el_bin
"""


# corridor segment endpoints + width, injected as identical double literals
# into both engines
_COR_AX, _COR_AY = 0.0, 0.0
_COR_BX, _COR_BY = 20000.0, 50.0
_COR_LEN2 = (_COR_BX - _COR_AX) ** 2 + (_COR_BY - _COR_AY) ** 2
_COR_WIDTH = 30.0
_COR_BUCKET = 5.0


def q_pc_corridor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corridor extraction — the power-line / road / rail inspection query:
    keep points within ``_COR_WIDTH`` of the survey line AB and histogram
    them by distance band.  Point-to-segment distance is the classic
    clamped projection (t = clamp(((p−a)·(b−a))/|b−a|², 0, 1)) — pure
    codegen arithmetic per point, then a filter and one hash aggregate;
    at scale this composes with header-bounds file skipping (tiles whose
    bbox misses the corridor are never read)."""
    t = load_tables(spark, sf_dir)
    pts = t["part"].select(
        F.col("p_partkey").cast("double").alias("x"),
        F.col("p_size").cast("double").alias("y"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("z"),
    )
    px = F.col("x") - F.lit(_COR_AX)
    py = F.col("y") - F.lit(_COR_AY)
    dx = F.lit(_COR_BX - _COR_AX)
    dy = F.lit(_COR_BY - _COR_AY)
    tpar = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), (px * dx + py * dy) / F.lit(_COR_LEN2))
    )
    cx = px - tpar * dx
    cy = py - tpar * dy
    dist = F.sqrt(cx * cx + cy * cy)
    band = F.floor(dist / F.lit(_COR_BUCKET)).cast("int")
    return (
        pts.withColumn("dist", dist)
        .where(F.col("dist") <= F.lit(_COR_WIDTH))
        .groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("z").alias("sum_z"),
            F.floor(F.min("dist") * 1e4 + 0.5).alias("min_dist_tmm"),
            F.floor(F.max("dist") * 1e4 + 0.5).alias("max_dist_tmm"),
        )
    )


QUERIES["q_pc_corridor"] = q_pc_corridor

ORACLES["q_pc_corridor"] = f"""
    WITH pts AS (
        SELECT CAST(p_partkey AS DOUBLE) AS x,
               CAST(p_size AS DOUBLE) AS y,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS z
        FROM part
    ),
    proj AS (
        SELECT x, y, z,
               greatest(0.0, least(1.0,
                   ((x - {_COR_AX!r}) * {_COR_BX - _COR_AX!r}
                    + (y - {_COR_AY!r}) * {_COR_BY - _COR_AY!r})
                   / {_COR_LEN2!r})) AS tpar
        FROM pts
    ),
    d AS (
        SELECT z,
               sqrt(((x - {_COR_AX!r}) - tpar * {_COR_BX - _COR_AX!r})
                    * ((x - {_COR_AX!r}) - tpar * {_COR_BX - _COR_AX!r})
                    + ((y - {_COR_AY!r}) - tpar * {_COR_BY - _COR_AY!r})
                      * ((y - {_COR_AY!r}) - tpar * {_COR_BY - _COR_AY!r}))
                   AS dist
        FROM proj
    )
    SELECT CAST(floor(dist / {_COR_BUCKET!r}) AS INTEGER) AS band,
           count(*) AS n_points,
           CAST(sum(z) AS BIGINT) AS sum_z,
           CAST(floor(min(dist) * 1e4 + 0.5) AS BIGINT) AS min_dist_tmm,
           CAST(floor(max(dist) * 1e4 + 0.5) AS BIGINT) AS max_dist_tmm
    FROM d WHERE dist <= {_COR_WIDTH!r}
    GROUP BY 1
"""
