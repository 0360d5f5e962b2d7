"""Round-15 staged queries (queries/staged_r15.py — not yet imported
by queries/__init__): Spark-vs-DuckDB differential + HRW semantics."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMOKE, staged_diff


def _diff(spark, name, tables):
    from week4_musemotion_spark.queries import staged_r15  # noqa: F401 — registers

    return staged_diff(spark, name, tables)


def test_shard_rendezvous_matches_oracle_and_conserves(spark):
    got = _diff(spark, "q_shard_rendezvous", ("documents",))
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    assert list(got.shard) == list(range(8))  # full grid, ordered
    # conservation: every doc assigned exactly once, chars add up
    assert got.n_docs.sum() == len(docs)
    assert got.n_chars.sum() == docs.n_chars.sum()
    # minimal movement: the removed shard's docs are exactly the
    # inherited mass, and the post-removal load re-covers the corpus
    last = got[got.shard == 7].iloc[0]
    assert last.n_inherited == 0 and last.n_after_removal == 0
    assert got.n_inherited.sum() == last.n_docs
    assert got.n_after_removal.sum() == len(docs)
    # HRW balance: md5 is uniform, so no shard should be empty or
    # hold the majority at this corpus size
    assert (got.n_docs > 0).all()
    assert got.n_docs.max() < len(docs) / 2


def test_shard_rendezvous_assignment_is_stable_across_runs(spark):
    # Determinism: the whole point of coordination-free placement —
    # two independent evaluations agree row-for-row.
    from week4_musemotion_spark.queries import staged_r15  # noqa: F401
    from week4_musemotion_spark.queries.registry import REGISTRY

    b = REGISTRY["q_shard_rendezvous"].builder
    a = b(spark, SF_SMOKE).toPandas()
    c = b(spark, SF_SMOKE).toPandas()
    pd.testing.assert_frame_equal(a, c)
