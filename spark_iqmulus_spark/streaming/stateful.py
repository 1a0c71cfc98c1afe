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

    from ..session import normalize_session, ts_micros_if_long

    normalize_session(spark)  # nanosAsLong/UTC before the raw parquet read
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    src = tempfile.mkdtemp(prefix="qss_src_")
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, "events.parquet")),
        os.path.join(src, "events.parquet"),
    )
    stream = ts_micros_if_long(spark.readStream.schema(raw_schema).parquet(src))
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


def running_user_totals_v2(events_stream: DataFrame) -> DataFrame:
    """Same running totals on the Spark 4 ``transformWithStateInPandas``
    API (the successor to applyInPandasWithState): state lives in named
    typed handles (here one ValueState tuple per user), timers and
    list/map state are available, and the state store contract is the
    same — O(distinct keys), partitioned by the grouping key."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            prev = self._totals.get() if self._totals.exists() else (0, 0.0)
            n, total = prev
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    return events_stream.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def q_stream_state_v2(spark, sf_dir: str) -> DataFrame:
    """`q_stream_state` on the transformWithStateInPandas API — same
    replay harness, same oracle (the state store must converge to plain
    GROUP BY totals regardless of which stateful API maintains it)."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from ..compat import ensure_protobuf_on_workers
    from ..session import normalize_session, ts_micros_if_long

    normalize_session(spark)  # nanosAsLong/UTC before the raw parquet read
    ensure_protobuf_on_workers(spark)  # vendored protobuf for worker procs
    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    src = tempfile.mkdtemp(prefix="qss2_src_")
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, "events.parquet")),
        os.path.join(src, "events.parquet"),
    )
    stream = ts_micros_if_long(spark.readStream.schema(raw_schema).parquet(src))
    sink = f"qss2_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals_v2(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="qss2_ckpt_"))
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


def _tws_available() -> bool:
    """transformWithStateInPandas drives state through a protobuf-based
    sidecar protocol.  ``ensure_protobuf`` vendors a minimal pure-Python
    protobuf runtime (``spark_iqmulus_spark._vendor``) when no real
    distribution is installed, which makes the protocol work in this
    container too; the gate stays for environments where even the shim
    cannot load."""
    from ..compat import ensure_protobuf

    if not ensure_protobuf():
        return False
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False


if _tws_available():
    QUERIES["q_stream_state_v2"] = q_stream_state_v2
    ORACLES["q_stream_state_v2"] = """
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY user_id
    """
