"""Custom stateful streaming operator via ``applyInPandasWithState``.

Per-user running aggregates (event count + value sum in exact cents)
maintained as explicit keyed state across micro-batches — the shape
Structured Streaming cannot express with builtin windowed aggregates
when the state transition is custom code (reference README.md:41-45
aspires to exactly this "long-term tracking" capability).

State is Arrow-batched per key group: the user function sees all new
rows for a key in the micro-batch plus that key's state, updates it,
and emits the refreshed snapshot — Spark shuffles by key, so each
key's state lives on exactly one executor (horizontal scale = more
keys per executor, never cross-executor coordination)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents (2-dp values): order-stable, overflow-safe;
        # null values arrive as NaN in the float64 series — skip them
        # (SQL SUM semantics) instead of crashing the streaming query
        vals = pdf["value"].dropna()
        cents += int(sum(int(round(v * 100)) for v in vals))
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value_cents": [cents]})


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Keyed running totals over the events stream (update mode)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
