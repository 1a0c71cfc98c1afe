"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all; this provides the "custom stateful
operator" building block (SURVEY.md §2B streaming block) the way Structured
Streaming intends: per-key state in the state store, Arrow-batched user
logic, update-mode emission.

Scale notes: state is one small tuple per key, partitioned by the grouping
key — the shuffle is the same one any groupBy(user_id) needs; state-store
size is O(distinct keys), independent of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema of running_user_totals
OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Running per-user (count, Σvalue) maintained in the state store;
    emits the updated totals for keys seen in each micro-batch."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def q_stream_state(spark, sf_dir: str) -> DataFrame:
    """End-to-end custom stateful operator with a full oracle match: replay
    the ``events`` table through a file stream into
    :func:`running_user_totals` (update-mode memory sink), then reduce the
    per-batch emissions to the final per-key state — ``n_events`` is
    monotonically increasing, so the last emission per key is the row with
    the maximal count.  Oracle = plain ``GROUP BY user_id`` totals, which is
    exactly what the state store must converge to."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    src = tempfile.mkdtemp(prefix="qss_src_")
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, "events.parquet")),
        os.path.join(src, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    sink = f"qss_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="qss_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )


QUERIES = {"q_stream_state": q_stream_state}

ORACLES = {
    "q_stream_state": """
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY user_id
    """,
}
