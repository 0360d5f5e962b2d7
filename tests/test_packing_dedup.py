"""Semantic tests for sequence packing and paragraph-level dedup."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _q(name):
    from week4_musemotion_spark.queries import REGISTRY

    return REGISTRY[name].builder


def test_pack_sequences_prefix_sum_invariants(spark):
    rows = _q("q_sequence_pack")(spark, SF_SMOKE).collect()
    assert rows
    cap = 256
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for members in by_source.values():
        members.sort(key=lambda r: r.doc_id)
        begin = 0
        for r in members:
            # positions are exactly the running concatenation offsets
            assert r.seq_first == begin // cap
            assert r.offset_in_seq == begin % cap
            end = begin + r.n_tokens
            assert r.n_seqs_spanned == (end - 1) // cap - begin // cap + 1
            begin = end
        assert all(0 <= r.offset_in_seq < cap for r in members)


def test_paragraph_dedup_global_first_wins(spark):
    df = _q("q_paragraph_dedup")(spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    # every doc keeps at most what it has; kept text is consistent
    for r in rows:
        assert 0 <= r.n_kept <= r.n_paras
        if r.n_kept == 0:
            assert r.dedup_text == ""
        else:
            assert r.dedup_text
    # total kept == distinct paragraphs corpus-wide (each survives once)
    total_kept = sum(r.n_kept for r in rows)
    from pyspark.sql import functions as F

    from week4_musemotion_spark.operators.curation import dedup_paragraphs  # noqa: F401
    from week4_musemotion_spark.sources.tables import load_table
    from week4_musemotion_spark.functions.text import tokens

    docs = load_table(spark, SF_SMOKE, "documents")
    ts = tokens(F.col("text"))
    paras = docs.filter(F.size(ts) > 0).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.ceil(F.size(ts) / F.lit(8)).cast("int") - 1),
                lambda i: F.concat_ws(" ", F.slice(ts, i * 8 + 1, 8)),
            )
        ).alias("p")
    )
    assert total_kept == paras.select("p").distinct().count()


def test_packing_dedup_shuffle_counts(spark):
    from week4_musemotion_spark.plans.audit import plan_string

    # packing is ONE per-shard window cumsum: exactly one exchange
    assert plan_string(_q("q_sequence_pack")(spark, SF_SMOKE), "simple").count(
        "Exchange hashpartitioning"
    ) == 1
    # paragraph dedup: one exchange on para_text, one back on doc_id
    assert plan_string(_q("q_paragraph_dedup")(spark, SF_SMOKE), "simple").count(
        "Exchange hashpartitioning"
    ) == 2
