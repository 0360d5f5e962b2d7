"""Streaming daily-count store: a ``foreachBatch``-maintained
append-only log of per-batch (group, day) count partials — the
unbounded-stream feeder for the daily-grid drift monitors
(CUSUM / seasonal residuals), in O(groups × days) read-side state.

This is the ADDITIVE branch of the engine's streaming design rule
(see streaming/sketches.py): counts are NOT an idempotent monoid —
re-adding a replayed micro-batch double-counts — so algebra cannot
give exactly-once and the store uses the near-dup gate's txn-marker
protocol instead (the Delta ``txnAppId``/``txnVersion`` idea at file
granularity):

1. each batch appends its per-(group, day) partial counts as
   ``bid-<batch_id>-*`` files via staging + rename;
2. a commit marker ``_count_commits/<batch_id>`` is published only
   AFTER the append — marker present ⇒ replay returns immediately;
3. marker absent ⇒ torn files from the failed attempt are purged by
   prefix before the batch is re-aggregated.

The store itself is a LOG of committed partials, not a materialized
total: totals fold at read time (``read_daily_counts``) — sum over
committed batch partials is exactly the map-side-combine shape, and
keeping the store append-only is what makes the per-batch write
O(batch) instead of O(history) (a read-modify-republish total table
would re-write the whole history every micro-batch; the HLL store
can afford republish because its state is capped at m rows/group).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.eventtime import US_PER_DAY, epoch_micros
from week4_musemotion_spark.functions.exact import int_div_trunc
from week4_musemotion_spark.streaming.neardup import _append_keyed, _purge_keyed


def make_count_sink(group_cols: list[str], store_path: str, ts_col: str = "ts"):
    """The ``foreachBatch`` body maintaining the count log, exposed so
    tests can drive replays deterministically (call it twice with the
    same batch_id).

        stream.writeStream.foreachBatch(
            make_count_sink(["event_type"], store)
        ).option("checkpointLocation", ckpt).start()
    """
    commit_dir = os.path.join(store_path, "_count_commits")
    data_dir = os.path.join(store_path, "counts")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tag = str(batch_id)
        marker = os.path.join(commit_dir, tag)
        if os.path.exists(marker):
            return  # fully committed batch replayed: nothing to do
        _purge_keyed(data_dir, tag)  # torn previous attempt
        day = int_div_trunc(epoch_micros(batch_df, ts_col), F.lit(US_PER_DAY))
        partial = batch_df.groupBy(
            *group_cols, day.alias("day_idx")
        ).agg(F.count(F.lit(1)).alias("cnt"))
        _append_keyed(partial, data_dir, tag)
        os.makedirs(commit_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("committed\n")

    return _sink


def stream_daily_counts(
    stream: DataFrame,
    group_cols: list[str],
    store_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
):
    """Start the count-log maintenance query over ``stream``
    (append-only source).  Returns the ``StreamingQuery``."""
    return (
        stream.writeStream.foreachBatch(make_count_sink(group_cols, store_path, ts_col))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_daily_counts(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold the committed partial log to per-(group, day) totals.

    Only files of COMMITTED batches are folded: a torn attempt's
    files sit in the data dir until the replay purges them, so a
    reader racing a failed attempt could otherwise double-read its
    partials.  Filtering to marker-present batch ids (the same bid
    the file-name prefix carries) makes reads correct under that
    race — committed ⇒ counted exactly once, torn ⇒ not counted."""
    commit_dir = os.path.join(store_path, "_count_commits")
    data_dir = os.path.join(store_path, "counts")
    committed = set(os.listdir(commit_dir)) if os.path.isdir(commit_dir) else set()
    if not committed or not os.path.isdir(data_dir):
        return spark.createDataFrame([], "day_idx long, cnt long")
    files = [
        os.path.join(data_dir, name)
        for name in os.listdir(data_dir)
        if name.startswith("bid-") and name.split("-")[1] in committed
    ]
    if not files:
        return spark.createDataFrame([], "day_idx long, cnt long")
    df = spark.read.parquet(*files)
    keys = [c for c in df.columns if c not in ("cnt",)]
    return df.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))
