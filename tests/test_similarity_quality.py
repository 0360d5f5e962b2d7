"""ANN quality: measure hyperplane-LSH recall against brute force.

Not a correctness oracle (LSH is approximate by contract) — this
documents the accuracy/cost trade and guards against a silent recall
collapse (e.g. a broken sketch that buckets everything apart).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_lsh_recall_floor(spark):
    from week4_musemotion_spark.operators.similarity import knn_brute_force, knn_lsh

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 50)
    exact = {
        (r.query_id, r.neighbor_id) for r in knn_brute_force(emb, queries, k=3).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in knn_lsh(emb, queries, k=3).collect()}
    assert approx, "LSH produced no candidates at all"
    # multi-table sign-LSH (16×6) measures ≈0.59 on these high-entropy
    # embeddings; a broken sketch scores ~k/corpus ≈ 0.6%
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"LSH recall collapsed: {recall:.3f}"
