"""Streaming near-dup ingest: every micro-batch of documents is
LSH-checked against the persisted corpus index, flagged rows are
diverted to a quarantine sink, clean rows are appended to BOTH the
corpus parquet and the LSH index — the continuously-ingesting form
of ``operators/lsh_index``.

Dataflow per micro-batch (``foreachBatch`` — the idiomatic bridge to
batch-only logic like our index):

    batch ──query_index──> near-dup pairs vs corpus-so-far
          ├─ flagged  (batch ids that matched)  → quarantine/
          └─ clean    (the rest)                → corpus/ + index append

Cost per batch is O(batch): the corpus side is a parquet scan of the
band index, never a recompute — which is what makes the loop viable
on an unbounded stream.  Batch-internal duplicates are NOT resolved
here (two near-identical docs arriving in the same micro-batch both
pass); run ``minhash_lsh_pairs`` inside the batch first if that
matters for the workload — at production batch sizes the
corpus-check dominates.

Exactly-once: foreachBatch replays a failed batch with the same
batch_id; the quarantine/corpus appends are NOT idempotent across a
replay (parquet append), so production deployments wrap the three
writes in ``operators/versioned`` snapshots or a batch_id-keyed
commit log.  The test pins the single-run semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from week4_musemotion_spark.operators.lsh_index import append_index, query_index


def stream_neardup_ingest(
    stream: DataFrame,
    index_path: str,
    corpus_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Run the near-dup-gated ingest loop; returns the StreamingQuery
    (caller awaits termination).  The index at ``index_path`` must
    already exist (``lsh_index.build_index`` on the seed corpus, or
    on an empty frame)."""

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            pairs = query_index(
                batch_df, index_path, threshold=threshold, text_col=text_col, id_col=id_col
            )
            flagged_ids = pairs.select(F.col("doc_a").alias(id_col)).distinct()
            flagged = batch_df.join(flagged_ids, id_col, "left_semi")
            clean = batch_df.join(flagged_ids, id_col, "left_anti")
            flagged.write.mode("append").parquet(os.path.join(quarantine_path, "docs"))
            clean.persist()
            clean.write.mode("append").parquet(os.path.join(corpus_path, "docs"))
            append_index(clean, index_path, text_col=text_col, id_col=id_col)
            clean.unpersist()
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
