"""Partitioning strategies for 100 TB-scale joins: bucketing and skew salting.

The reference delegates all join planning to the host engine (SURVEY.md §2B);
at cluster scale the two patterns that decide whether a repeated big join is
feasible are:

- **bucketing** (:func:`write_bucketed`): pre-shuffle both fact tables into
  the same bucket layout once at write time; every subsequent equi-join on
  the bucket key reads co-located buckets and plans with **zero Exchange**
  (verified in tests/test_partitioning.py).  This is the Spark-native
  equivalent of the reference's `fid=N` directory partitioning on write
  (`ply/PlyRelation.scala:65-72`) generalized to arbitrary keys.
- **skew salting** (:func:`salted_join`): when one join key carries a
  disproportionate share of rows, AQE's skew-join split handles moderate
  skew; for pathological keys, salting splits each hot key into ``n_salt``
  sub-keys on the large side and replicates the matching small-side rows,
  bounding every shuffle partition at ``1/n_salt`` of the hot key.  The
  salt is derived deterministically from a caller-chosen column so results
  are reproducible.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..session import load_tables


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``bucket_cols``.

    Joins between two tables written with the same ``bucket_cols`` and
    ``num_buckets`` require no shuffle.  ``num_buckets`` should be sized so
    one bucket of the largest table fits an executor core's working memory
    (at 100 TB / 32768 buckets ≈ 3 GB per bucket before column pruning).
    """
    w = df.write.mode("overwrite").option("path", path).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 8,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to heavy key skew on ``large``.

    The large side gets ``salt = pmod(hash(salt_from), n_salt)`` (defaults
    to a per-row deterministic hash of all large-side columns); the small
    side is replicated ``n_salt`` times via ``explode``.  The join key
    becomes ``(on, salt)`` so a hot key's rows spread over ``n_salt``
    shuffle partitions instead of one.  Semantically identical to
    ``large.join(small, on, how)`` (asserted in tests).

    Replication cost: ``n_salt × |small|`` rows shuffled — keep ``small``
    the dimension side.  For broadcast-able dims prefer ``F.broadcast``;
    salting is for mid-size tables above the broadcast threshold.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt_src = F.col(salt_from) if salt_from else F.struct(*large.columns)
    lg = large.withColumn("__salt", F.pmod(F.abs(F.hash(salt_src)), F.lit(n_salt)))
    sm = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = lg.join(sm, [on, "__salt"], how)
    return out.drop("__salt")


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within: list[str] | None = None,
) -> int:
    """Rewrite a parquet dataset into ≈``target_file_bytes`` files.

    Long-running ingest (streaming sinks, per-task point-cloud writers)
    accretes small files; at cluster scale the resulting per-file open/seek
    overhead and scheduler pressure dominate scan time.  Sizing from the
    *source bytes on disk* (not row counts) keeps output files near the
    parquet row-group sweet spot; optional ``sort_within`` re-clusters rows
    so min/max page stats stay selective after compaction.  Returns the
    number of output files.  Uses coalesce when only merging (no shuffle);
    a full repartition only when re-sorting.
    """
    import os

    df = spark.read.parquet(src)
    total = _dir_bytes(src)  # local FS; on HDFS/S3 swap in the FileSystem API
    n_files = max(1, -(-total // target_file_bytes))
    if sort_within:
        out = df.repartition(n_files).sortWithinPartitions(*sort_within)
    else:
        out = df.coalesce(n_files)
    out.write.mode("overwrite").parquet(dest)
    return sum(1 for f in os.listdir(dest) if f.endswith(".parquet"))


def _dir_bytes(path: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def with_global_row_number(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    num_buckets: int = 32,
    rn_col: str = "rn",
) -> DataFrame:
    """Exact global row number WITHOUT a single-partition window.

    ``Window.orderBy`` with no partition key moves the entire table into one
    task (Spark warns about it); at 100 TB that is a non-starter.  Standard
    two-phase distributed ranking instead:

    1. one cheap pass computes ``num_buckets - 1`` approximate range
       boundaries on ``order_col`` (``approxQuantile`` — driver holds only
       O(num_buckets) values);
    2. rows are assigned a bucket by *value* (ties always share a bucket, so
       ordering across buckets stays total regardless of boundary error);
       per-bucket counts (O(num_buckets) rows) turn into cumulative offsets
       on the driver-sized side of a broadcast join;
    3. ``row_number`` runs per bucket in parallel; global rank = bucket
       offset + local rank, ordered by ``(order_col, tiebreak_col)``.

    Boundary imprecision affects only balance, never correctness.
    """
    qs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(df.approxQuantile(order_col, qs, 0.001)))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
    bdf = df.withColumn("__bucket", bucket)
    offsets = (
        bdf.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    W.orderBy("__bucket").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__bucket", "__offset")
    )
    w = W.partitionBy("__bucket").orderBy(order_col, tiebreak_col)
    return (
        bdf.join(F.broadcast(offsets), "__bucket")
        .withColumn(rn_col, F.row_number().over(w) + F.col("__offset"))
        .drop("__bucket", "__offset")
    )


def partition_stats(df):
    """Physical-layout introspection: rows per partition via
    ``spark_partition_id()`` — one cheap aggregate that answers the first
    question of every skew investigation (how unbalanced are my tasks?)
    without touching the Spark UI.  Returns a DataFrame of
    ``(partition_id, n_rows)``; pair with `salted_join`/`repartition`
    when max/median row counts diverge."""
    from pyspark.sql import functions as F

    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.col("__pid").alias("partition_id"), "n_rows")
    )


def observe_counts(df, name: str, exprs: dict):
    """Attach single-pass observability metrics to ``df``.

    Wraps ``DataFrame.observe``: the returned :class:`Observation` yields
    the metric values after the next action, computed *during* that action
    — no second scan.  At 100 TB this is the difference between free
    pipeline-health counters (rows kept, nulls seen, bytes summed) and
    re-running the job to count; the idiom every curation stage here
    should use instead of ``df.count()`` bookkeeping.

    Returns ``(observed_df, observation)``.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[v.alias(k) for k, v in exprs.items()])
    return out, obs


def q_window_ntile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE(4) via :func:`with_global_row_number` — value-identical
    to ``q_window_ntile`` (same oracle) but with no single-partition stage:
    the only unpartitioned window runs over the O(num_buckets) offsets
    table.  This is the 100 TB path for any global-order operator (ntile,
    percent_rank, median-by-rank, global top-k with rank)."""
    t = load_tables(spark, sf_dir)
    ranked = with_global_row_number(
        t["orders"], "o_totalprice", "o_orderkey", num_buckets=32
    )
    total = ranked.agg(F.count(F.lit(1)).alias("__total"))
    # SQL NTILE: with n rows and k tiles, q = n div k and r = n % k; the
    # first r tiles get q+1 rows.  Expressed closed-form over the rank.
    quart = (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            "quartile",
            F.expr(
                "CASE WHEN rn <= (__total % 4) * ((__total div 4) + 1) "
                "THEN ceil(rn / ((__total div 4) + 1)) "
                "ELSE (__total % 4) + ceil((rn - (__total % 4) * ((__total div 4) + 1)) "
                "/ (__total div 4)) END"
            ),
        )
    )
    return quart.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )


# ---------------------------------------------------------------------------
# declared queries — the utilities under the driver's correctness gate

_BUCKET_CACHE: dict[str, bool] = {}


def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over pre-bucketed tables: both sides written once in
    the same bucket layout (the pay-the-shuffle-once pattern for repeated
    100 TB joins), then joined with **zero Exchange** — plan pinned in
    tests/test_partitioning.py.  Result is byte-identical to the plain
    join, which is what the oracle checks."""
    t = load_tables(spark, sf_dir)
    if not _BUCKET_CACHE.get(sf_dir):
        base = tempfile.mkdtemp(prefix="bucketed_q_")
        write_bucketed(
            t["lineitem"].select("l_orderkey", "l_quantity"),
            "q_li_bucketed", f"{base}/li", ["l_orderkey"], 8,
            sort_cols=["l_orderkey"],
        )
        write_bucketed(
            t["orders"].select(
                F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
            ),
            "q_ord_bucketed", f"{base}/ord", ["l_orderkey"], 8,
            sort_cols=["l_orderkey"],
        )
        _BUCKET_CACHE[sf_dir] = True
    joined = spark.table("q_li_bucketed").join(
        spark.table("q_ord_bucketed"), "l_orderkey"
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-robust salted equi-join (hot keys split across n_salt shuffle
    partitions); semantically identical to the plain join — the oracle is
    the plain-join SQL."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_quantity", "l_linenumber")
    ords = t["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = salted_join(li, ords, "l_orderkey", n_salt=8, salt_from="l_linenumber")
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


_JOIN_ORACLE = """
    SELECT o_orderstatus, count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
"""

_NTILE_ORACLE = """
    SELECT quartile, count(*) AS n,
           round(min(o_totalprice), 4) AS lo, round(max(o_totalprice), 4) AS hi
    FROM (
        SELECT o_totalprice,
               ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders
    ) GROUP BY quartile
"""

QUERIES = {
    "q_join_bucketed": q_join_bucketed,
    "q_join_salted": q_join_salted,
    "q_window_ntile_scalable": q_window_ntile_scalable,
}

ORACLES = {
    "q_join_bucketed": _JOIN_ORACLE,
    "q_join_salted": _JOIN_ORACLE,
    "q_window_ntile_scalable": _NTILE_ORACLE,
}
