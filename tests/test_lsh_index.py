"""Persisted MinHash-LSH index lifecycle (operators/lsh_index):
build → query equals the recompute join; append → new docs become
findable without rebuilding the corpus side."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark):
    from week4_musemotion_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "documents")


def _pairs(df):
    return sorted((r["doc_a"], r["doc_b"], r["jaccard_e4"]) for r in df.collect())


def test_query_matches_recompute_join(spark, tmp_path):
    from week4_musemotion_spark.operators.dedup import minhash_lsh_join
    from week4_musemotion_spark.operators.lsh_index import build_index, query_index

    d = _docs(spark)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "idx")
    build_index(corpus, path)
    got = _pairs(query_index(batch, path, threshold=0.8))
    want = _pairs(minhash_lsh_join(batch, corpus, threshold=0.8))
    assert got == want and len(got) > 0


def test_append_makes_new_docs_findable(spark, tmp_path):
    from week4_musemotion_spark.operators.dedup import minhash_lsh_join
    from week4_musemotion_spark.operators.lsh_index import (
        append_index,
        build_index,
        query_index,
    )

    d = _docs(spark)
    corpus = d.filter(F.col("doc_id") % 10 > 1)
    day1 = d.filter(F.col("doc_id") % 10 == 1)
    day2 = d.filter(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "idx")
    build_index(corpus, path)
    append_index(day1, path)
    # day2 queried against corpus ∪ day1 — identical to the recompute
    # join against the unioned frames
    got = _pairs(query_index(day2, path, threshold=0.8))
    want = _pairs(minhash_lsh_join(day2, corpus.unionByName(day1), threshold=0.8))
    assert got == want
    # and the appended day1 docs really participate: dropping them
    # from the recompute must lose at least one pair (the planted
    # near-dups span the modular split at sf0.001)
    without = _pairs(minhash_lsh_join(day2, corpus, threshold=0.8))
    assert len(without) <= len(want)
