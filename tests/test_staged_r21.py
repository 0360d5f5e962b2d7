"""Round-21 staged queries (queries/staged_r21.py — not yet imported
by queries/__init__): Spark-vs-DuckDB differential + semantics for
the statistical-uncertainty wave (bootstrap CI, KS drift test,
leave-one-source-out influence)."""

from __future__ import annotations

from tests.conftest import staged_diff


def _diff(spark, name, tables):
    from week4_musemotion_spark.queries import staged_r21  # noqa: F401 — registers

    return staged_diff(spark, name, tables)


def test_bootstrap_ci_matches_oracle_and_brackets(spark):
    got = _diff(spark, "q_bootstrap_ci", ("documents",))
    assert len(got) == 20  # one row per source at sf0.001
    # every replica survived (P[empty resample of 25 docs] ~ e^-25)
    assert (got.n_reps == 64).all()
    # a 95% CI is an ordered pair, and the point estimate is sane
    assert (got.ci_lo_e6 <= got.ci_hi_e6).all()
    assert (got.ci_lo_e6 < got.ci_hi_e6).any()  # not degenerate everywhere
    assert (got.mean_e6 > 0).all()
    # CI width shrinks like 1/sqrt(n); at n=25 it must be nonzero but
    # far narrower than the full data range (47..558 chars)
    width = got.ci_hi_e6 - got.ci_lo_e6
    assert (width < 400_000_000).all()


def test_ks_drift_matches_oracle_and_bounds(spark):
    got = _diff(spark, "q_ks_drift", ("documents",))
    assert len(got) == 20
    assert ((got.ks_e6 >= 0) & (got.ks_e6 <= 1_000_000)).all()
    assert (got.n_s + got.n_rest == 500).all()
    # the peak value is a real observed doc length
    assert got.ks_at_value.between(47, 558).all()
    # uniform synthetic sources: no source should look wildly drifted
    # (KS critical value at alpha=0.001 for n=25 vs 475 is ~0.40)
    assert (got.ks_e6 < 450_000).all()


def test_loo_influence_matches_oracle_and_reconciles(spark):
    got = _diff(spark, "q_loo_influence", ("documents",))
    assert len(got) == 20
    # one global mean, shares sum to ~1e6 (truncation loss < n_sources)
    assert got.global_mean_e6.nunique() == 1
    assert 1_000_000 - 20 <= got.share_ppm.sum() <= 1_000_000
    # influence sign law: removing a below-mean source raises the mean
    below = got[got.mean_e6 < got.global_mean_e6]
    assert (below.influence_e6 >= 0).all()
    above = got[got.mean_e6 > got.global_mean_e6]
    assert (above.influence_e6 <= 0).all()
