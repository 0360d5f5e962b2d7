"""Custom stateful streaming via ``transformWithStateInPandas`` —
the Spark-4 successor to ``applyInPandasWithState`` (streaming/
stateful.py keeps the classic API for comparison).

Same operator semantics as stateful.py (per-user running event count
+ exact-cents value total), expressed as a :class:`StatefulProcessor`
with a typed ``ValueState`` handle.  What the new API buys at scale:
named state variables with independent schemas/TTLs, timers, and a
state store contract designed for the RocksDB provider (changelog
checkpointing — state snapshots no longer rewrite per batch).

Runtime requirements: the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``) and a working
``google.protobuf`` on the Python workers (the API's state wire
format).  The test skips when protobuf is unavailable; the classic
``applyInPandasWithState`` path (stateful.py) has no such dependency
and stays the default.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

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


class UserTotalsProcessor(StatefulProcessor):
    """Running (count, cents) per user as a single ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, cents = (
            tuple(self._totals.get()) if self._totals.exists() else (0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            vals = pdf["value"].dropna()
            cents += int(sum(int(round(v * 100)) for v in vals))
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [cents],
            }
        )

    def close(self) -> None:
        pass


def user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals through transformWithStateInPandas.

    Requires the RocksDB state store provider (set by the caller's
    session conf for streaming queries); grouping shuffles once on
    user_id, then each key's state lives on exactly one executor.
    """
    return (
        events.withColumn(
            "value_cents", F.round(F.col("value") * 100).cast("long")
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
