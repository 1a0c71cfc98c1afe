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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
