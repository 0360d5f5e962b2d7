"""Second staged wave (queries/staged_r7.py additions — not yet
imported by queries/__init__): full Spark-vs-DuckDB differential
checks here, so activation ships with evidence already in hand."""

from __future__ import annotations

from tests.conftest import staged_diff

TABLES = ("documents", "embeddings", "lineitem", "part", "supplier")


def _diff(spark, name):
    from week4_musemotion_spark.queries import staged_r7  # noqa: F401 — registers

    return staged_diff(spark, name, TABLES)


def test_distinct_sketch_matches_oracle(spark):
    got = _diff(spark, "q_distinct_sketch")
    assert len(got) == 20, "one row per source"
    # raw-regime guard: every source's cardinality must clear 2.5m,
    # or the query's no-linear-counting design assumption broke
    assert (got.exact_distinct > 2.5 * 256).all()
    # sketch error within ~3 standard errors (1.04/sqrt(256) ≈ 6.5%)
    assert (got.err_ppm < 200_000).all()
    assert got.zero_regs.between(0, 256).all()


def test_bloom_pruned_join_matches_oracle(spark):
    got = _diff(spark, "q_bloom_pruned_join")
    assert len(got) > 0 and (got.n_items > 0).all()
    assert (got.revenue_e4 > 0).all()


def test_leakage_split_matches_oracle(spark):
    got = _diff(spark, "q_leakage_split")
    assert set(got.split) <= {"train", "val", "test"}
    assert (got.straddle_pairs == 0).all(), "near-dup pair crossed a split"
    assert got.n_docs.sum() == 500, "every document assigned exactly once"
    assert (got.n_clusters <= got.n_docs).all()
    # hash-bucketing should land near 80/10/10 (loose: binomial noise)
    frac = got.set_index("split").n_docs / got.n_docs.sum()
    assert frac.get("train", 0) > 0.6
