"""Round-13 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: see the verify-skill
rotation note).

Wave seed: streaming quantiles.

- q_stream_len_quantiles — per-source document-length quantiles read
  from the STREAMING log-bucket sketch store
  (``streaming/quantiles.py``): the corpus is replayed as micro-
  batches through the txn-marker ``foreachBatch`` sink (one batch
  deliberately REPLAYED to pin exactly-once, the log compacted
  mid-stream to pin the manifest flip), then the readout folds the
  committed partials.  Because the sketch's merge IS addition, the
  streamed result equals the batch q_len_quantiles to the digit —
  one DuckDB oracle pins both the sketch math AND the store's
  exactly-once protocol end to end.

Differential evidence: tests/test_staged_r13.py (conftest.staged_diff
at sf0.001; sf0.01/sf0.1 via ``tools/check_correctness.py --staged``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.operators.qsketch import quantiles_sql
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

# chains staged_r12 -> r11 -> r10 -> r9 registration
import week4_musemotion_spark.queries.staged_r12  # noqa: F401

#: Micro-batch count for the replayed corpus stream.
_QS_BATCHES = 6


def _build_qsketch_store(spark: SparkSession, sf_dir: str, tmp: str) -> None:
    """Drive the sink exactly as a foreachBatch stream would, plus the
    two fault-injection moves a test must pin: one batch REPLAYED
    (marker short-circuit) and one mid-stream compaction (manifest
    flip) — if either broke exactly-once, the oracle diff would
    catch it as a wrong bucket count."""
    from week4_musemotion_spark.streaming.counts import compact_counts
    from week4_musemotion_spark.streaming.quantiles import make_qsketch_sink

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("doc_len")
    )
    store = os.path.join(tmp, "store")
    sink = make_qsketch_sink(["source"], "doc_len", store)
    for b in range(_QS_BATCHES):
        batch = d.filter(F.col("doc_id") % _QS_BATCHES == b)
        sink(batch, b)
        if b == 1:
            sink(batch, b)  # replay: the commit marker must no-op it
        if b == 3:
            compact_counts(spark, store)  # fold the first four batches
    open(os.path.join(tmp, "_SUCCESS"), "w").close()


def _qsketch_store_fixture(spark: SparkSession, sf_dir: str) -> str:
    from week4_musemotion_spark.queries.pipeline_ops import cached_fixture

    return cached_fixture(
        "musemotion_qsketch_store",
        sf_dir,
        f"qsketch_store:{_QS_BATCHES}".encode(),
        lambda tmp: _build_qsketch_store(spark, sf_dir, tmp),
        table="documents",  # fingerprint the table the store is BUILT from
    )


@query(
    "q_stream_len_quantiles",
    covers=("X-STREAM-QSKETCH",),
    oracle="WITH src AS (SELECT source, length(text) AS v FROM documents)"
    + quantiles_sql("src", ["source"], "v"),
)
def q_stream_len_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length quantiles from the STREAMING sketch store —
    the unbounded-corpus form of q_len_quantiles.  The fixture
    replays the corpus as micro-batches through the txn-marker sink
    (one batch duplicated, the log compacted mid-stream), and the
    readout folds only committed, not-yet-folded partials; the
    oracle is the BATCH quantile SQL over the whole table, which the
    streamed result must match to the digit because bucket-count
    merge is exact addition.  One oracle therefore pins the sketch
    arithmetic, the marker protocol, and the compaction manifest
    flip in a single hash.

    Scale shape: each micro-batch writes O(|batch| → buckets) rows;
    read-side state is O(sources × ~260) regardless of stream
    length; compaction keeps the log's file count bounded."""
    from week4_musemotion_spark.streaming.quantiles import read_quantiles

    tmp = _qsketch_store_fixture(spark, sf_dir)
    return read_quantiles(
        spark,
        os.path.join(tmp, "store"),
        ["source"],
        empty_schema="source string, bucket int, cnt long",
    )
