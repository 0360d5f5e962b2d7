"""Round-17 staged queries (queries/staged_r17.py — not yet imported
by queries/__init__): Spark-vs-DuckDB differential + semantics."""

from __future__ import annotations

from tests.conftest import staged_diff


def _diff(spark, name, tables):
    from week4_musemotion_spark.queries import staged_r17  # noqa: F401 — registers

    return staged_diff(spark, name, tables)


def test_rrf_fusion_matches_oracle_and_laws(spark):
    from week4_musemotion_spark.queries.staged_r17 import _RRF_C, _RRF_DEPTH

    got = _diff(spark, "q_rrf_fusion", ("documents",))
    assert 0 < len(got) <= _RRF_DEPTH
    # fused score is the sum of the present systems' contributions
    w = lambda r: 1_000_000_000 // (_RRF_C + r) if r > 0 else 0  # noqa: E731
    recomputed = got.apply(
        lambda row: w(row.rank_bm25) + w(row.rank_tfidf), axis=1
    )
    assert (got.rrf_e9 == recomputed).all()
    assert got.n_systems.isin([1, 2]).all()
    # output is the fused ranking: descending score, doc_id tiebreak
    assert (got.rrf_e9.values[:-1] >= got.rrf_e9.values[1:]).all()
    # a doc ranked by both systems must outscore the same ranks seen
    # by only one system — spot the law: max single-system score is
    # w(1), min two-system score is 2*w(depth); any n_systems=2 row
    # beats any n_systems=1 row whose best rank is worse than both
    both = got[got.n_systems == 2]
    if len(both):
        assert (both.rank_bm25 > 0).all() and (both.rank_tfidf > 0).all()


def test_rrf_contains_heads_of_both_systems(spark):
    # rank 1 of either input system always survives fusion at depth
    # >= 2·(inputs' overlap can't push w(1)+0 below the cutoff at the
    # test corpus' list sizes) — the basic no-starvation property.
    got = _diff(spark, "q_rrf_fusion", ("documents",))
    assert (got.rank_bm25 == 1).any() or (got.n_systems == 2).any()
    assert (got.rank_tfidf == 1).any() or (got.n_systems == 2).any()


def test_inbatch_collisions_matches_oracle_and_expectation_law(spark):
    from week4_musemotion_spark.queries.staged_r17 import _BATCH_SIZE

    got = _diff(spark, "q_inbatch_collisions", ("documents",))
    assert len(got) == 1
    row = got.iloc[0]
    assert row.n_batches == (row.n_docs + _BATCH_SIZE - 1) // _BATCH_SIZE
    assert 0 <= row.n_collisions <= row.n_pairs
    # exact expectation law recomputed in Python big-ints
    f, r = divmod(int(row.n_docs), _BATCH_SIZE)
    same = f * _BATCH_SIZE * (_BATCH_SIZE - 1) + r * (r - 1)
    assert row.expected_ppm == same * 1_000_000 // (
        int(row.n_docs) * (int(row.n_docs) - 1)
    )
    if row.n_pairs:
        assert row.collision_ppm == row.n_collisions * 1_000_000 // row.n_pairs


def test_inbatch_collisions_counts_reproduce_in_pandas(spark):
    # Independent recompute: pull the engine's OWN pair table and
    # batch assignment and re-count collisions with a pandas merge —
    # verifies the double equi-join (both endpoints must map through
    # the same assignment) against a path that shares none of its
    # join machinery.
    from week4_musemotion_spark.operators.dedup import jaccard_pairs
    from week4_musemotion_spark.operators.mixing import deterministic_shuffle
    from week4_musemotion_spark.queries import staged_r17  # noqa: F401
    from week4_musemotion_spark.queries.extensions import JACCARD_THRESHOLD
    from week4_musemotion_spark.queries.staged_r17 import _BATCH_SIZE
    from week4_musemotion_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = jaccard_pairs(docs, JACCARD_THRESHOLD).select("doc_a", "doc_b").toPandas()
    asg = deterministic_shuffle(docs.select("doc_id"), "doc_id").toPandas()
    batch = {int(r.doc_id): int(r.pos) // _BATCH_SIZE for _, r in asg.iterrows()}
    coll = sum(
        1 for _, p in pairs.iterrows() if batch[int(p.doc_a)] == batch[int(p.doc_b)]
    )
    got = staged_diff(spark, "q_inbatch_collisions", ("documents",))
    assert got.iloc[0].n_pairs == len(pairs)
    assert got.iloc[0].n_collisions == coll
