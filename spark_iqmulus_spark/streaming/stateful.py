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
