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

QUERIES = {
    "q_join_bucketed": q_join_bucketed,
    "q_join_salted": q_join_salted,
}

ORACLES = {
    "q_join_bucketed": _JOIN_ORACLE,
    "q_join_salted": _JOIN_ORACLE,
}
