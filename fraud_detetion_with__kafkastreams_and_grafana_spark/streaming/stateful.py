"""Custom stateful streaming operator via applyInPandasWithState: per-user
running fraud totals that survive across micro-batches.

The reference has no stateful ops (its topology is stateless,
TransactionProcessor.java:27-54); this is the engine's capability superset
for 'running aggregate per key, emitted every batch' semantics that plain
streaming groupBy can't express in append mode.

State scale: one (sum, count) pair per user in the state store —
constant per key, partitioned by the grouping key across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "userId STRING, total_amount DOUBLE, n_tx LONG"
STATE_SCHEMA = "total DOUBLE, cnt LONG"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, cnt = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["amount"].sum())
        cnt += int(len(pdf))
    state.update((total, cnt))
    yield pd.DataFrame(
        {"userId": [key[0]], "total_amount": [total], "n_tx": [cnt]}
    )


def running_user_totals(fraud: DataFrame) -> DataFrame:
    """Streaming per-user running totals, one updated row per user per
    micro-batch in which that user appears."""
    return fraud.groupBy("userId").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
