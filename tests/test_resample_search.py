"""Invariants for the gap-filling resampler and lexical retrieval."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _q(name):
    from week4_musemotion_spark.queries import REGISTRY

    return REGISTRY[name].builder


def test_resample_dense_grid(spark):
    from week4_musemotion_spark.sources.tables import load_table

    out = _q("q_resample_ffill")(spark, SF_SMOKE)
    rows = out.collect()
    n_users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    # dense grid: every user gets all 49 hourly points, no gaps
    assert len(rows) == n_users * 49
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r.hour_idx)
    assert all(sorted(v) == list(range(49)) for v in per_user.values())


def test_resample_forward_fill_semantics(spark):
    import duckdb

    out = {
        (r.user_id, r.hour_idx): r.last_value_cents
        for r in _q("q_resample_ffill")(spark, SF_SMOKE).collect()
    }
    # independently recompute one user's fill with plain python
    con = duckdb.connect()
    uid = min(u for (u, _) in out)
    obs = con.execute(
        f"SELECT epoch_us(ts), CAST(round(value*100) AS BIGINT) FROM "
        f"'{SF_SMOKE}/events.parquet' WHERE user_id = {uid} ORDER BY ts"
    ).fetchall()
    t0, hour = 1_704_412_800_000_000, 3_600_000_000
    for h in range(49):
        cutoff = t0 + h * hour
        prior = [v for (t, v) in obs if t <= cutoff]
        expect = prior[-1] if prior else None
        assert out[(uid, h)] == expect, f"user {uid} hour {h}"


def test_doc_search_rare_term_dominates(spark):
    from pyspark.sql import functions as F

    from week4_musemotion_spark.functions.text import tokens
    from week4_musemotion_spark.sources.tables import load_table

    out = _q("q_doc_search")(spark, SF_SMOKE).collect()
    assert 0 < len(out) <= 20
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    # 'dup' is ~16x rarer than 'join'/'scan': every doc containing it
    # must outrank any doc that merely repeats the common terms
    d = load_table(spark, SF_SMOKE, "documents")
    dup_docs = {
        r.doc_id
        for r in d.select(
            "doc_id", F.array_contains(tokens(F.col("text")), "dup").alias("has")
        )
        .filter("has")
        .collect()
    }
    got_dup = [r.doc_id in dup_docs for r in out]
    # all dup-docs in the result sort before all non-dup docs
    assert got_dup == sorted(got_dup, reverse=True)
    assert any(got_dup)
