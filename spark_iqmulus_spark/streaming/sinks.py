"""Streaming sinks: idempotent foreachBatch → parquet.

Structured Streaming's file sink is append-only; pipelines that need
partition overwrite / upsert semantics use ``foreachBatch``.  The contract
for exactly-once output is *idempotence per micro-batch*: a retried batch
re-runs ``write_batch`` with the same ``batch_id``, so writes must land in a
batch-keyed location that overwrite makes safe.

Scale notes: each micro-batch write is an ordinary distributed parquet
write (task-parallel); the only driver work is the commit.  Dynamic
partition overwrite touches just the retried batch's partition, so retries
stay O(batch), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parquet_batch_sink(out_dir: str):
    """Return a ``foreachBatch`` function writing each micro-batch to
    ``out_dir`` partitioned by batch id — idempotent under batch retry
    (same batch id → same partition dynamically overwritten)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(out_dir)
        )

    return write_batch


def stream_to_parquet(stream_df: DataFrame, out_dir: str, checkpoint: str):
    """Start an availableNow foreachBatch stream writing ``stream_df`` to
    ``out_dir``; returns the StreamingQuery (caller awaits termination)."""
    return (
        stream_df.writeStream.foreachBatch(parquet_batch_sink(out_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def upsert_batch_sink(
    spark,
    state_dir: str,
    key: str,
    order_col: str,
    n_buckets: int = 16,
):
    """``foreachBatch`` upsert into a bucket-partitioned parquet state
    table — the keyed-materialized-view sink (MERGE INTO semantics without
    a table format).

    Layout: ``state_dir/b=<hash-bucket>/``.  Per micro-batch:

    1. reduce the batch to its last row per key (``row_number`` by
       ``order_col`` desc — deterministic),
    2. read ONLY the buckets the batch touches (partition pruning — the
       untouched state is never scanned),
    3. anti-join current-bucket state against the batch keys, union the
       batch rows, write to a staging dir,
    4. atomically swap each affected bucket directory into place
       (driver-side rename, O(touched buckets) metadata ops).

    Retry-safe: a replayed batch anti-joins against already-updated state
    and re-unions identical rows — the merge is idempotent.  Work per
    batch is O(touched buckets + batch), never O(history); with uniform
    key hashing, bucket count bounds both the prune fan-in and the swap
    cost.  (Production systems get this from a table format's MERGE; this
    is the same plan shape expressed on plain parquet.)
    """
    import os
    import shutil

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        w = Window.partitionBy(key).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("b", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))
        )
        latest = latest.localCheckpoint()  # break lineage before the swap
        touched = sorted(r["b"] for r in latest.select("b").distinct().collect())
        if not touched:
            return
        existing = [
            b
            for b in touched
            if os.path.isdir(os.path.join(state_dir, f"b={b}"))
        ]
        if existing:
            current = spark.read.parquet(
                *[os.path.join(state_dir, f"b={b}") for b in existing]
            )
            # re-derive b (partition column is not in the files) and drop
            # rows whose key is replaced by this batch
            current = current.withColumn(
                "b", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
            )
            keep = current.join(latest.select(key), key, "left_anti")
            merged = keep.unionByName(latest)
        else:
            merged = latest
        staging = os.path.join(state_dir, f"__staging_{batch_id}")
        merged.write.mode("overwrite").partitionBy("b").parquet(staging)
        for b in touched:
            src = os.path.join(staging, f"b={b}")
            dst = os.path.join(state_dir, f"b={b}")
            if not os.path.isdir(src):  # key hashed to bucket with no rows
                continue
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.replace(src, dst)
        shutil.rmtree(staging, ignore_errors=True)

    return write_batch


def stream_upsert(spark, stream_df: DataFrame, state_dir: str,
                  checkpoint: str, key: str, order_col: str):
    """Start an availableNow foreachBatch stream upserting ``stream_df``
    into the bucketed state table; returns the StreamingQuery."""
    return (
        stream_df.writeStream.foreachBatch(
            upsert_batch_sink(spark, state_dir, key, order_col)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
