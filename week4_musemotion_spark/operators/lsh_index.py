"""Persisted MinHash-LSH index: build once, append batches, query
batches — the materialized form of the band table that
``dedup.minhash_lsh_join`` recomputes per call.

Layout under ``path`` (plain parquet; note ``spark.read.parquet`` does
NOT check ``_SUCCESS`` — reads are not commit-gated, see the crash
contract below):

- ``bands/``     — ``(_id, band, bh)``: one row per document per LSH
  band; the candidate-generation index.  The band join is an
  equi-join on ``(band, bh)``; at warehouse scale write this with
  ``bucketBy(bh)`` into a table so batch lookups join with zero
  exchange on the corpus side — plain parquet here keeps the sandbox
  dependency-free while the dataflow is identical.
- ``shingles/``  — ``(_id, shingle)``: the distinct shingle-hash sets
  the exact-Jaccard verification needs (candidates are verified, so
  index false positives never surface).

Append-only contract: ids must be unique across all builds/appends
(the ingest pipeline's natural monotonic doc ids).  Crash contract:
``_materialize`` writes ``shingles/`` (the verification data) BEFORE
``bands/`` (the candidate index), so a crash between the two leaves
shingle sets with no band rows — those ids simply never become
candidates, which is safe; the reverse order would leave band rows
whose exact-Jaccard verification data is missing, silently dropping
true near-dups in the inner ``_intersections`` join.  A crash
mid-write can still leave partial part-files that a later read will
see (parquet reads are not ``_SUCCESS``-gated); for replay-exact
multi-writer semantics wrap the directory in ``operators/versioned``
snapshots or use the streaming gate's batch-id commit log.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.operators.dedup import (
    _intersections,
    _jaccard_e4,
    BANDS,
    ROWS_PER_BAND,
    minhash_signatures,
    shingle_sets,
)


def _band_rows(sigs: DataFrame) -> DataFrame:
    """Explode a signature frame to ``(_id, band, bh)`` rows."""
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.lit(10_000 + b),
                *[F.col(f"mh_{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
            ).alias("bh"),
        )
        for b in range(BANDS)
    ]
    return sigs.select("_id", F.explode(F.array(*bands)).alias("k")).select(
        "_id", F.col("k.band").alias("band"), F.col("k.bh").alias("bh")
    )


def _materialize(df: DataFrame, path: str, mode: str, text_col: str, id_col: str, n: int) -> None:
    sh = shingle_sets(df, text_col, id_col, n).persist()
    # shingles (verification data) FIRST: a crash after this write but
    # before the band write only hides the batch from candidate
    # generation; bands-first would emit candidates that verification
    # silently drops (see module docstring crash contract).
    sh.write.mode(mode).parquet(os.path.join(path, "shingles"))
    _band_rows(minhash_signatures(sh)).write.mode(mode).parquet(os.path.join(path, "bands"))
    sh.unpersist()


def build_index(
    df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> None:
    """Materialize the LSH index for a corpus (overwrite)."""
    _materialize(df, path, "overwrite", text_col, id_col, n)


def append_index(
    df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> None:
    """Append a new batch's bands+shingles to an existing index —
    cost is O(batch), the corpus is never recomputed (the whole point
    of materializing)."""
    _materialize(df, path, "append", text_col, id_col, n)


def query_index(
    batch: DataFrame,
    path: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Near-dup pairs between ``batch`` and the indexed corpus:
    ``(doc_a=batch id, doc_b=corpus id, jaccard_e4)`` with exact
    verification, identical output contract to
    ``dedup.minhash_lsh_join`` — but the corpus side is a parquet
    scan of the index, not a recompute.  Batch ids must not collide
    with indexed ids."""
    spark: SparkSession = batch.sparkSession
    idx_bands = spark.read.parquet(os.path.join(path, "bands"))
    idx_sh = spark.read.parquet(os.path.join(path, "shingles"))
    bsh = shingle_sets(batch, text_col, id_col, n).persist()
    bband = _band_rows(minhash_signatures(bsh))
    cands = (
        bband.alias("a")
        .join(
            idx_bands.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")),
        )
        .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .distinct()
    )
    sh_all = bsh.unionByName(idx_sh)
    verified = _intersections(cands, sh_all).filter(F.col("jac") >= threshold)
    return verified.select("doc_a", "doc_b", _jaccard_e4())
