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


def test_hrw_single_hash_pass(spark):
    # The one-hash-pass claim (_hrw_structs docstring): CollapseProject
    # must NOT inline the struct array into its two array_max
    # consumers — the optimized plan carries exactly S md5 calls.  If
    # a Spark upgrade changes the inlining policy this fails loudly
    # instead of silently doubling the per-row hash cost.
    # Pin the pre-checkpoint picks fragment (the full query's cell
    # table is a lazy localCheckpoint, which renders as a LogicalRDD
    # and hides the upstream hashes from the static plan).
    from week4_musemotion_spark.queries import staged_r15
    from week4_musemotion_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    df = staged_r15._hrw_picks(docs)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("md5") == staged_r15._N_SHARDS, opt


def test_shard_rendezvous_assignment_is_stable_across_runs(spark):
    # Determinism: the whole point of coordination-free placement —
    # two independent evaluations agree row-for-row.
    from week4_musemotion_spark.queries import staged_r15  # noqa: F401
    from week4_musemotion_spark.queries.registry import REGISTRY

    b = REGISTRY["q_shard_rendezvous"].builder
    a = b(spark, SF_SMOKE).toPandas()
    c = b(spark, SF_SMOKE).toPandas()
    pd.testing.assert_frame_equal(a, c)


def test_unigram_surprisal_matches_oracle_and_bounds(spark):
    got = _diff(spark, "q_unigram_surprisal", ("documents",))
    assert len(got) == 20, "one row per source"
    # bits/token ppm: positive (every token's count < N so at least
    # 0 bits; the mean can't be 0 unless one token dominates) and
    # bounded by 64 bits/token
    assert (got.mean_bits_ppm >= 0).all()
    assert (got.mean_bits_ppm <= 64_000_000).all()
    assert (got.min_bits_ppm <= got.mean_bits_ppm).all()
    assert (got.mean_bits_ppm <= got.max_bits_ppm).all()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    assert got.n_docs.sum() <= len(docs)  # zero-token docs excluded


def test_surprisal_bit_identity():
    # floor(log2(N/cnt)) == bit_length(N // cnt) - 1 for every
    # 1 <= cnt <= N — the identity both engines' bin()-length scoring
    # relies on (proof: both equal k iff 2^k <= N/cnt < 2^(k+1), and
    # since 2^k is an integer, N/cnt >= 2^k iff N//cnt >= 2^k)
    from fractions import Fraction

    for n_total in [1, 7, 8, 1023, 1024, 1025, 999_983]:
        for cnt in [1, 2, 3, 7, 64, n_total]:
            if cnt > n_total:
                continue
            q = n_total // cnt
            got = q.bit_length() - 1
            # exact floor(log2(N/cnt)) without float: largest k with 2^k <= N/cnt
            x = Fraction(n_total, cnt)
            k = 0
            while 2 ** (k + 1) <= x:
                k += 1
            assert got == k, (n_total, cnt)
