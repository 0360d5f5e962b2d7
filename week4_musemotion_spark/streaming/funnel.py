"""Stateful streaming funnel via ``applyInPandasWithState``.

Tracks each user's progress through the strictly-ordered
view → click → purchase funnel as events arrive — the streaming twin
of the batch ``q_funnel_conversion`` (queries/lifecycle.py), with
first-touch semantics: stage k's entry time is the earliest event of
its type that is strictly AFTER the stage-k-1 entry time.

Reference parity: the reference aspires to "long-term tracking"
analytics (/root/reference/README.md:41-45) with no streaming code;
this is that capability on Structured Streaming's keyed-state model.

State per user: the three entry timestamps in epoch-micros longs
(-1 = not reached).  Rows within a micro-batch are applied in
timestamp order, so with all of a user's events in one batch (or
in-order delivery across batches) the result is EXACTLY the batch
query's — pinned by tests/test_streaming_funnel.py.  Cross-batch
OUT-OF-ORDER delivery is resolved conservatively: an earlier view
arriving after a click was already discarded cannot resurrect that
click (discarded rows are not retained in state — retaining them
would make state grow with the stream, the thing bounded-state
streaming exists to avoid); a late event can therefore under-report
a stage until a later qualifying event arrives, never over-report.

Scale: state is three longs per user, shuffled by user_id so each
key lives on one executor; horizontal scale = more keys per
executor, no cross-executor coordination.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_STAGES = ("view", "click", "purchase")

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.LongType()),
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
        T.StructField("t3_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
        T.StructField("t3_us", T.LongType()),
    ]
)


def _advance(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
    rows = pd.concat(list(pdfs), ignore_index=True)
    # in-batch ordering: apply events in event-time order so one batch
    # containing a user's whole history replays it exactly
    rows = rows.sort_values("ts_us", kind="mergesort")
    for ts, etype in zip(rows["ts_us"], rows["event_type"]):
        ts = int(ts)
        if etype == FUNNEL_STAGES[0]:
            if t1 < 0 or ts < t1:
                t1 = ts  # lowering t1 never invalidates t2/t3 (> old t1 > new t1)
        elif etype == FUNNEL_STAGES[1]:
            if t1 >= 0 and ts > t1 and (t2 < 0 or ts < t2):
                t2 = ts
        elif etype == FUNNEL_STAGES[2]:
            if t2 >= 0 and ts > t2 and (t3 < 0 or ts < t3):
                t3 = ts
    state.update((t1, t2, t3))
    stage = 3 if t3 >= 0 else 2 if t2 >= 0 else 1 if t1 >= 0 else 0
    yield pd.DataFrame(
        {"user_id": [key[0]], "stage": [stage], "t1_us": [t1], "t2_us": [t2], "t3_us": [t3]}
    )


def streaming_funnel(stream: DataFrame) -> DataFrame:
    """Per-user funnel stage over the events stream (update mode).

    ``stream`` needs ``user_id``, ``event_type``, and an event-time
    column convertible to epoch micros (uses functions/eventtime so
    MICROS-NTZ and legacy BIGINT encodings both work).
    """
    from week4_musemotion_spark.functions.eventtime import epoch_micros

    keyed = stream.select(
        "user_id", "event_type", epoch_micros(stream, "ts").alias("ts_us")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _advance,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
