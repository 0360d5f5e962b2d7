"""Scale-path smoke: the LSH operators must degrade gracefully when
the corpus grows well beyond the fixture (20× here), with candidate
counts driven by collisions — not corpus² — and outputs staying
consistent with the base corpus's planted structure."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _amplified_docs(spark, factor: int):
    """Corpus ×factor with EVERY token suffixed by the replica id, so
    replicas live in disjoint vocabularies: near-dup pairs exist only
    within a replica and the expected answer is exactly base × factor.
    (Salting only one token leaves cross-replica copies of the same
    doc at Jaccard ≈ 0.99 — 105k genuine pairs, which the operator
    correctly finds; that's an answer-structure problem, not a bug.)"""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    salted = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("_"), F.col("rep").cast("string")),
        ),
    )
    return docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000).alias("doc_id"), salted.alias("text")
    )


def test_minhash_scales_linearly_in_structure(spark):
    from week4_musemotion_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs

    base_pairs = jaccard_pairs(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"), 0.8).count()
    big = _amplified_docs(spark, 20)  # 10,000 docs
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(big, 0.8).collect()
    elapsed = time.perf_counter() - t0
    # every replica carries its own copy of the planted near-dup pairs;
    # the one salt token shifts Jaccard a hair but not across the
    # 0.8 threshold (planted pairs sit at >= 0.9)
    assert len(pairs) == base_pairs * 20, (len(pairs), base_pairs)
    # loose wall-clock sanity: candidate generation must not go
    # quadratic (10k docs -> ~50M naive pairs would take minutes)
    assert elapsed < 120, f"minhash at 20x took {elapsed:.0f}s"


def test_knn_scales_with_broadcast_queries(spark):
    from week4_musemotion_spark.operators.similarity import knn_brute_force

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    reps = spark.range(20).select(F.col("id").alias("rep"))
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 10_000).alias("vec_id"), "embedding"
    )  # 10,000 vectors
    queries = big.filter(F.col("vec_id") < 3)
    got = knn_brute_force(big, queries, k=5).collect()
    assert len(got) == 15
    # replicas of the query vector itself are perfect matches
    assert all(r.cosine_e6 == 1_000_000 for r in got if r.neighbor_id % 10_000 == r.query_id)
