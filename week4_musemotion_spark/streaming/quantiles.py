"""Streaming quantile-sketch store: a ``foreachBatch``-maintained
append-only log of per-batch log-bucket count partials
(``operators/qsketch.py``) — unbounded-stream quantiles in
O(groups × ~260 buckets) read-side state.

Design-rule placement (see streaming/sketches.py): bucket counts are
an ADDITIVE monoid, not an idempotent one — re-adding a replayed
micro-batch double-counts a bucket exactly like it double-counts a
daily total — so exactly-once comes from the txn-marker protocol,
and this store deliberately reuses the daily-count store's machinery
verbatim (same ``bid-`` file naming, same ``_count_commits`` marker
dir, same ``_compacted`` manifest-flip): ``counts.read_daily_counts``
folds it and ``counts.compact_counts`` compacts it UNCHANGED, because
both are generic over "all non-``cnt`` columns are keys".  The only
new code is the per-batch partial (a bucket count instead of a day
count) and the quantile readout on top of the fold.

Exactness: folding per-batch bucket counts with SUM is identical to
bucketing the union of all batches — the sketch's merge IS addition —
so the streamed quantile readout equals the batch query's to the
digit, and the same DuckDB oracle pins both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from week4_musemotion_spark.operators.qsketch import bucket_counts, quantiles_from_counts
from week4_musemotion_spark.streaming.neardup import _append_keyed, _purge_keyed


def make_qsketch_sink(group_cols: list[str], value_col: str, store_path: str):
    """The ``foreachBatch`` body maintaining the sketch log, exposed
    so tests can drive replays deterministically (call it twice with
    the same batch_id).

        stream.writeStream.foreachBatch(
            make_qsketch_sink(["source"], "doc_len", store)
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
        partial = bucket_counts(
            batch_df.select(*group_cols, value_col), group_cols, value_col
        )
        _append_keyed(partial, data_dir, tag)
        os.makedirs(commit_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("committed\n")

    return _sink


def read_qsketch_counts(
    spark: SparkSession, store_path: str, empty_schema: str
) -> DataFrame:
    """Fold the committed partial log to per-(group, bucket) totals —
    delegates to the count store's reader (marker + compaction-
    manifest filtering included), since the log layout is identical."""
    from week4_musemotion_spark.streaming.counts import read_daily_counts

    return read_daily_counts(spark, store_path, empty_schema)


def read_quantiles(
    spark: SparkSession,
    store_path: str,
    group_cols: list[str],
    empty_schema: str | None = None,
) -> DataFrame:
    """Quantile readout over the folded store: ``(*group_cols, n,
    p50, p90, p99)`` — byte-identical to running the batch quantile
    query over the union of every committed micro-batch."""
    schema = empty_schema or ", ".join(
        [f"{c} string" for c in group_cols] + ["bucket int", "cnt long"]
    )
    counts = read_qsketch_counts(spark, store_path, schema)
    return quantiles_from_counts(counts, group_cols)
