"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 — the "custom stateful operators" slot).

The reference has no streaming state at all (DoAction Unimplemented,
main.go:121-124); this is the Spark-native capability: per-key mutable
state maintained across micro-batches with Arrow-batched Python hooks.

The example operator keeps a running (count, sum) per user and emits the
updated totals each batch — the minimal shape of sessionization, CDC
rollups, or feature-store refresh. State is two longs + a double per key:
at 1000 executors the state store shards by the grouping key, so the
operator scales with keys, not events.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def _update_running_totals(
    key: Any, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge this batch's rows into the per-key (count, sum) state and
    emit the updated totals once per batch.

    The sum accumulates as integer cents (values are 2-decimal money,
    FIXTURES.md) — exact, order-independent, so the result hash-matches a
    DECIMAL(18,2) oracle regardless of batch/partition order."""
    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [cents / 100.0]}
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Apply the stateful running-totals operator to a (streaming or
    batch-staged) events frame grouped by user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
