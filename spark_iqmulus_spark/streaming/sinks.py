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
