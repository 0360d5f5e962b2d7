"""Round-10 staged queries — registered on import, NOT imported by
``queries/__init__`` yet, so the active registry (and the benched
battery) is unchanged until activation.  ``import
week4_musemotion_spark.queries.staged_r10`` to register.

Wave theme: corpus accounting under duplication + governance:

- q_effective_tokens — multiplicity-discounted corpus size: each
  document's tokens weighted by 1/|its near-dup cluster|, so a
  paragraph syndicated across 40 pages counts once, not 40 times.
  The honest denominator for mixing weights and training-budget
  math (raw token counts overstate duplicated sources; dedup-then-
  count understates sources whose "duplicates" are legitimate
  reprints you intend to keep).
- q_quasi_identifier_risk — k-anonymity audit over the corpus's
  metadata quasi-identifiers (source, lang, token-length bucket):
  documents whose QI group has fewer than k members are
  re-identification risks when metadata ships with the corpus
  (Sweeney 2002's k-anonymity, applied as a release gate).

Differential evidence: tests/test_staged_r10.py (Spark vs DuckDB at
sf0.001 via conftest.staged_diff; sf0.01/sf0.1 run manually per the
verify-skill round-6 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import dec, int_div_trunc
from week4_musemotion_spark.operators.dedup import jaccard_pairs
from week4_musemotion_spark.queries.extensions import (
    JACCARD_THRESHOLD,
    _closure_ctes,
)
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Multiplicity-discounted corpus size
# ---------------------------------------------------------------------------


@query(
    "q_effective_tokens",
    covers=("X-EFFECTIVE-TOKENS",),
    oracle=f"""
    WITH RECURSIVE {_closure_ctes(JACCARD_THRESHOLD)},
    csz AS (SELECT keep_id, count(*) AS csize FROM cl GROUP BY keep_id),
    mem AS (SELECT cl.doc_id, csz.csize FROM cl JOIN csz USING (keep_id)),
    t AS (
        SELECT d.source,
               len(list_filter(string_split_regex(d.text, '\\s+'), w -> w != '')) AS n_tokens,
               coalesce(m.csize, 1) AS csize
        FROM documents d LEFT JOIN mem m USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
           CAST(sum(n_tokens * 1000000 // csize) AS BIGINT) AS effective_tokens_e6,
           CAST(CAST(sum(n_tokens * 1000000 // csize) AS HUGEINT) * 1000000
                // (CAST(sum(n_tokens) AS HUGEINT) * 1000000) AS BIGINT) AS retention_ppm
    FROM t GROUP BY source
    """,
)
def q_effective_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicity-discounted corpus size per source: every document
    contributes ``n_tokens / |its near-dup cluster|`` (singletons
    divide by 1), in exact millionths — the honest token budget for
    mixing weights.  Raw counts overstate syndicated sources; a
    hard keep-one dedup count understates sources whose duplicates
    are deliberate reprints; the discounted sum is the fixed point
    both converge to, and retention_ppm is the per-source "how much
    of it is really there" ratio.

    Plan: near-dup pairs (banded) → CC → cluster sizes joined back
    to members (two aggregates + one join on keep_id, all tiny) →
    ONE corpus scan left-joined to the membership table on doc_id —
    the token counting rides the scan projection; nothing quadratic
    anywhere.  Per-doc truncating division matches the oracle
    bit-for-bit (non-negative operands)."""
    docs = load_table(spark, sf_dir, "documents")
    from week4_musemotion_spark.functions.text import tokens

    clusters = jaccard_pairs(docs, JACCARD_THRESHOLD)
    from week4_musemotion_spark.operators.graph import dedup_clusters

    cl = dedup_clusters(clusters)
    csz = cl.groupBy("keep_id").agg(F.count(F.lit(1)).alias("csize"))
    mem = cl.join(csz, "keep_id").select("doc_id", "csize")
    t = (
        docs.select("doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tokens"))
        .join(mem, "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            F.coalesce("csize", F.lit(1)).alias("csize"),
        )
    )
    eff = F.sum(int_div_trunc(dec(F.col("n_tokens")) * 1_000_000, F.col("csize")))
    raw = F.sum("n_tokens")
    return t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        raw.cast("long").alias("raw_tokens"),
        eff.cast("long").alias("effective_tokens_e6"),
        int_div_trunc(dec(eff) * 1_000_000, dec(raw) * 1_000_000).alias("retention_ppm"),
    )


# ---------------------------------------------------------------------------
# k-anonymity quasi-identifier audit
# ---------------------------------------------------------------------------

#: Anonymity threshold: QI groups smaller than this are flagged.
_K_ANON = 5
#: Token-count bucket width for the length quasi-identifier — raw
#: lengths are near-unique (a fingerprint on their own); bucketing is
#: both the standard generalization step and what makes the audit
#: measure the METADATA risk rather than the length column's entropy.
_LEN_BUCKET = 32


@query(
    "q_quasi_identifier_risk",
    covers=("X-K-ANONYMITY",),
    oracle=f"""
    WITH t AS (
        SELECT source, lang,
               len(list_filter(string_split_regex(text, '\\s+'), w -> w != ''))
                 // {_LEN_BUCKET} AS len_bucket
        FROM documents
    ),
    g AS (
        SELECT source, lang, len_bucket, count(*) AS gsize
        FROM t GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (gsize < {_K_ANON}) AS BIGINT) AS risky_groups,
           CAST(coalesce(sum(gsize) FILTER (gsize < {_K_ANON}), 0) AS BIGINT) AS risky_docs,
           CAST(min(gsize) AS BIGINT) AS min_group,
           CAST(CAST(coalesce(sum(gsize) FILTER (gsize < {_K_ANON}), 0) AS HUGEINT) * 1000000
                // sum(gsize) AS BIGINT) AS risky_ppm
    FROM g GROUP BY source
    """,
)
def q_quasi_identifier_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the corpus's metadata quasi-identifiers
    (source, lang, token-length bucket of {_LEN_BUCKET}): a document
    whose QI combination matches fewer than {_K_ANON} documents is a
    re-identification risk if the metadata ships with a released
    corpus — the release gate reports, per source, how many QI groups
    and documents sit below k and the worst (smallest) group.

    Plan: the QI tuple is computed in the scan projection, then ONE
    hash aggregate to group sizes and a second tiny aggregate to the
    per-source report — two shuffles of ever-shrinking data, nothing
    else.  Generalization knobs (bucket width, k) are compile-time
    constants so the audit is reproducible across runs and engines."""
    docs = load_table(spark, sf_dir, "documents")
    from week4_musemotion_spark.functions.text import tokens

    t = docs.select(
        "source",
        "lang",
        int_div_trunc(F.size(tokens("text")).cast("long"), F.lit(_LEN_BUCKET)).alias(
            "len_bucket"
        ),
    )
    g = t.groupBy("source", "lang", "len_bucket").agg(F.count(F.lit(1)).alias("gsize"))
    risky = F.sum(F.when(F.col("gsize") < _K_ANON, F.col("gsize")).otherwise(F.lit(0)))
    return g.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("gsize") < _K_ANON, 1).otherwise(0)).cast("long").alias("risky_groups"),
        risky.cast("long").alias("risky_docs"),
        F.min("gsize").cast("long").alias("min_group"),
        int_div_trunc(dec(risky) * 1_000_000, F.sum("gsize")).alias("risky_ppm"),
    )
