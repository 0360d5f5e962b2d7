"""Streaming → snapshot upsert via ``foreachBatch``.

The CDC-style ingest loop: each micro-batch of events merges into a
parquet snapshot with last-write-wins semantics (operators.upsert),
so the snapshot always holds one current row per key while the
stream keeps arriving.  ``foreachBatch`` is the idiomatic bridge from
Structured Streaming to batch-only sinks — the batch DataFrame it
hands over supports the full API, including our merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from week4_musemotion_spark.operators.upsert import upsert_parquet_snapshot


def stream_upsert_to_snapshot(
    stream: DataFrame,
    snapshot_path: str,
    keys: list[str],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Run the stream, merging each micro-batch into the snapshot.

    Returns the StreamingQuery (caller awaits termination).  The
    checkpoint dir gives exactly-once batch tracking: a replayed
    micro-batch merges idempotently (last-write-wins on the same
    keys), so the snapshot converges even across restarts.
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        upsert_parquet_snapshot(batch_df.sparkSession, snapshot_path, batch_df, keys)

    writer = stream.writeStream.foreachBatch(_merge).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
