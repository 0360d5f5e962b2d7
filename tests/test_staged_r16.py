"""Round-16 staged queries (queries/staged_r16.py — not yet imported
by queries/__init__): Spark-vs-DuckDB differential + semantics."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMOKE, staged_diff


def _diff(spark, name, tables):
    from week4_musemotion_spark.queries import staged_r16  # noqa: F401 — registers

    return staged_diff(spark, name, tables)


def test_dsir_select_matches_oracle_and_ranks(spark):
    from week4_musemotion_spark.queries.staged_r16 import _DSIR_K

    got = _diff(spark, "q_dsir_select", ("documents",))
    assert len(got) == _DSIR_K
    # gain = corpus_ppm - target_ppm by construction, row for row
    assert (got.gain_ppm == got.corpus_ppm - got.target_ppm).all()
    # selection is sorted by gain desc (ties by doc_id — monotone gain
    # is the testable projection of the total order)
    assert (got.gain_ppm.values[:-1] >= got.gain_ppm.values[1:]).all()
    # surprisal bits are per-token bounded: 0 <= ppm <= 64e6
    for c in ("corpus_ppm", "target_ppm"):
        assert (got[c] >= 0).all() and (got[c] <= 64_000_000).all()


def test_dsir_skips_oov_against_target_model(spark):
    # Every scored doc has n_scored >= 1 and n_scored <= its token
    # count; docs with zero in-target-vocab tokens never appear.
    got = _diff(spark, "q_dsir_select", ("documents",))
    assert (got.n_scored >= 1).all()


def test_weighted_jaccard_matches_oracle_and_bounds(spark):
    got = _diff(spark, "q_weighted_jaccard_pairs", ("documents",))
    assert len(got) > 0, "rare-shingle blocking must yield candidates"
    # multiset identity: 0 < inter <= union, ratio in (0, 1e4]
    assert (got.inter_w > 0).all()
    assert (got.union_w >= got.inter_w).all()
    assert (got.wjac_e4 > 0).all() and (got.wjac_e4 <= 10_000).all()
    assert (got.doc_a < got.doc_b).all()
    # descending by similarity
    assert (got.wjac_e4.values[:-1] >= got.wjac_e4.values[1:]).all()


def test_weighted_vs_set_jaccard_on_repetition(spark):
    # The capability the weighted form adds: a doc that repeats one
    # paragraph 3x is set-identical (J_set = 1) to the single
    # paragraph but NOT multiset-identical (J_w = 1/3 on unigrams).
    # Verified with a hand corpus through the same operators' math.
    from pyspark.sql import functions as F

    from week4_musemotion_spark.functions.text import tokens

    para = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [(1, para), (2, " ".join([para] * 3))], "doc_id long, text string"
    )
    tf = (
        df.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .toPandas()
    )
    piv = tf.pivot(index="t", columns="doc_id", values="tf").fillna(0)
    inter = piv.min(axis=1).sum()
    union = piv.max(axis=1).sum()
    assert inter / union == 1 / 3  # set Jaccard would be 1.0
    # distinct-set comparison for contrast
    sets = tf.groupby("doc_id")["t"].apply(set)
    assert sets[1] == sets[2]
