"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference is stateless per message (its only state is the
uncommitted producer batch, reference main.go:373-375); these operators
are the Spark-native extension for per-key running state: the state
store is checkpointed with the query, partitioned by the grouping key,
and survives restarts — semantics the reference's in-memory batches
could never give.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _running_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in the state store across
    micro-batches. Input needs ``user_id`` and ``value`` columns.

    Scale: state is hash-partitioned by user_id exactly like a streaming
    aggregation; each micro-batch touches only keys present in the batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
