"""Round-10 staged queries (queries/staged_r10.py — not yet imported
by queries/__init__): full Spark-vs-DuckDB differential checks here,
so activation ships with evidence already in hand."""

from __future__ import annotations

from tests.conftest import staged_diff

TABLES = ("documents",)


def _diff(spark, name):
    from week4_musemotion_spark.queries import staged_r10  # noqa: F401 — registers

    return staged_diff(spark, name, TABLES)


def test_effective_tokens_matches_oracle(spark):
    got = _diff(spark, "q_effective_tokens")
    assert len(got) == 20, "one row per source"
    # discounting can only shrink: effective <= raw (in e6 units)
    assert (got.effective_tokens_e6 <= got.raw_tokens * 1_000_000).all()
    assert (got.retention_ppm <= 1_000_000).all()
    # planted near-dups exist, so SOME source lost mass...
    assert got.retention_ppm.min() < 1_000_000
    # ...but duplication is a minority of the corpus
    assert got.retention_ppm.max() > 900_000


def test_quasi_identifier_risk_matches_oracle(spark):
    got = _diff(spark, "q_quasi_identifier_risk")
    assert len(got) == 20
    assert (got.risky_groups <= got.n_groups).all()
    assert (got.risky_docs >= got.risky_groups).all() | (got.risky_groups == 0).all()
    assert (got.risky_ppm <= 1_000_000).all()
    # a risky group has at most k-1 docs
    assert (got.risky_docs <= got.risky_groups * 4).all()
    # min_group == 1 somewhere is expected on a 500-doc corpus with
    # a 3-dim QI; the audit exists to surface exactly that
    assert (got.min_group >= 1).all()
