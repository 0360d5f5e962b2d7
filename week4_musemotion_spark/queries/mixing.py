"""Corpus-mixing queries: temperature rebalancing, token-budget
selection, curriculum ordering, deterministic shuffle.

These are the between-cleaning-and-training knobs of an LLM data
pipeline (the reference has no counterpart; the closest surface is
its quality-weighted sampling exercises) — each is implemented in
``operators/mixing`` on top of the distributed two-pass rank/cumsum
operators and oracle-checked against the identical windowed SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.hashing import stable_hash64_sql
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.queries.extensions import _quality_e4_sql
from week4_musemotion_spark.sources.tables import load_table

_DOC_HASH = stable_hash64_sql("CAST(doc_id AS VARCHAR)")

#: Shared oracle fragment: per-document token counts + quality score
#: (the exact integer formulation of operators/textstats.quality_stats).
_QUALITY_CTE = f"""
    t AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\\s+'), w -> w != '') AS ts
        FROM documents
    ),
    s AS (
        SELECT doc_id, source, len(ts) AS n_tokens,
               len(list_filter(ts, w -> w IN ('the','a','of','and','to','in','is','on','for','with')))
                   AS stop_cnt
        FROM t
    ),
    q AS (
        SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST({_quality_e4_sql("n_tokens", "stop_cnt")} AS BIGINT) AS quality_e4
        FROM s WHERE n_tokens > 0
    )
"""


@query(
    "q_source_mixture",
    covers=("X-MIX-TEMPERATURE",),
    oracle=f"""
    WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    mn AS (SELECT min(n) AS n_min FROM cnt),
    acc AS (
        SELECT lang,
               least(CAST(10000 AS BIGINT),
                     CAST(floor(10000 * sqrt(CAST(n_min AS DOUBLE) / n)) AS BIGINT))
                   AS accept_e4
        FROM cnt CROSS JOIN mn
    )
    SELECT d.doc_id, d.lang, a.accept_e4
    FROM documents d JOIN acc a ON d.lang = a.lang
    WHERE {_DOC_HASH} % 10000 < a.accept_e4
    """,
)
def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (τ=0.5) language rebalancing: language ``s`` keeps
    rows with probability ``min(1, sqrt(n_min/n_s))``, so effective
    sizes flatten toward the rare languages — the mixture-reweighting
    step of a multilingual training corpus (the testdata's languages
    are genuinely skewed ~3.4:1 en:fr, so the filter actively
    down-samples; its ``source`` column is uniform and would make the
    rejection path vacuous).  Membership is hash-keyed (reproducible,
    RNG-free) and the only aggregate is the |langs|-row count table
    broadcast into a filter; sqrt is used precisely because IEEE
    mandates correct rounding, so the acceptance integers are
    engine-identical (a general ``pow`` is not).  At 100 TB: two fact
    scans (the group-count pass, then the filter pass with the tiny
    acceptance table broadcast in) and ZERO fact-table shuffles —
    both aggregation sides are map-side-combined group counts."""
    from week4_musemotion_spark.operators.mixing import temperature_rebalance

    d = load_table(spark, sf_dir, "documents")
    return temperature_rebalance(d, "lang", "doc_id").select("doc_id", "lang", "accept_e4")


@query(
    "q_token_budget_select",
    covers=("X-MIX-BUDGET",),
    oracle=f"""
    WITH {_QUALITY_CTE},
    c AS (
        SELECT doc_id, n_tokens, quality_e4,
               sum(n_tokens) OVER (ORDER BY quality_e4 DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM q
    )
    SELECT doc_id, n_tokens, quality_e4, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= 10000
    """,
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped curation: keep the highest-quality documents
    whose running token total stays within a 10k-token budget — the
    greedy "best N tokens" selection pass.  The running total is the
    distributed two-pass cumsum (range partition on (quality desc,
    id) → P-row offset table → local windows), so the plan has no
    single-partition sort at any scale; the budget line falls where
    the inclusive cumsum crosses 10 000."""
    from week4_musemotion_spark.operators.mixing import select_token_budget
    from week4_musemotion_spark.operators.textstats import quality_stats

    d = load_table(spark, sf_dir, "documents")
    scored = quality_stats(d).filter(F.col("n_tokens") > 0).select(
        "doc_id", "n_tokens", "quality_e4"
    )
    return select_token_budget(scored, budget=10_000).select(
        "doc_id", "n_tokens", "quality_e4", "cum_tokens"
    )


@query(
    "q_curriculum_order",
    covers=("X-MIX-CURRICULUM",),
    oracle=f"""
    WITH {_QUALITY_CTE},
    st AS (
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens < 40 THEN 0 WHEN n_tokens < 80 THEN 1 ELSE 2 END AS stage,
               {_DOC_HASH} AS h
        FROM q
    )
    SELECT doc_id, CAST(stage AS INTEGER) AS stage,
           CAST(row_number() OVER (ORDER BY stage, h, doc_id) - 1 AS BIGINT) AS pos
    FROM st
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: three length-based difficulty stages
    (short < 40 tokens, medium < 80, long), ascending, with a
    deterministic hash shuffle inside each stage — the "easy first,
    reproducibly shuffled" training order.  Positions come from the
    two-pass distributed global index over (stage, hash, id); the
    oracle is the equivalent single window, which Spark would
    serialize into one task — the operator exists exactly so it
    doesn't have to."""
    from week4_musemotion_spark.operators.mixing import curriculum_order
    from week4_musemotion_spark.operators.textstats import quality_stats

    d = load_table(spark, sf_dir, "documents")
    scored = quality_stats(d).filter(F.col("n_tokens") > 0).select("doc_id", "n_tokens")
    stage = (
        F.when(F.col("n_tokens") < 40, 0).when(F.col("n_tokens") < 80, 1).otherwise(2)
    ).cast("int")
    return curriculum_order(scored, stage, "doc_id").select(
        "doc_id", F.col("stage").cast("int").alias("stage"), "pos"
    )


@query(
    "q_det_shuffle",
    covers=("X-MIX-SHUFFLE",),
    oracle=f"""
    WITH h AS (
        SELECT o_orderkey, {stable_hash64_sql("CAST(o_orderkey AS VARCHAR)")} AS hh
        FROM orders
    )
    SELECT o_orderkey,
           CAST(row_number() OVER (ORDER BY hh, o_orderkey) - 1 AS BIGINT) AS pos
    FROM h
    """,
)
def q_det_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle of a FACT table: position = rank
    of (hash(key), key), a pure function of the keys — re-runs,
    backfills, and other engines produce the identical training
    order, where ``orderBy(rand())`` is partition-layout-dependent.
    Runs as the two-pass distributed global index (range partition on
    the hash → offsets → local row_number); the single-window oracle
    formulation is what it replaces at scale."""
    from week4_musemotion_spark.operators.mixing import deterministic_shuffle

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    return deterministic_shuffle(o, "o_orderkey").select("o_orderkey", "pos")


@query(
    "q_quantile_normalize",
    covers=("X-MIX-QNORM",),
    oracle=f"""
    WITH {_QUALITY_CTE},
    r AS (
        SELECT doc_id, source, quality_e4,
               row_number() OVER (PARTITION BY source
                                  ORDER BY quality_e4 ASC, doc_id ASC) AS rk,
               count(*) OVER (PARTITION BY source) AS n
        FROM q
    )
    SELECT doc_id, source, quality_e4, CAST(rk AS BIGINT) AS rk,
           CAST((2 * rk * 10000 + (n + 1)) // (2 * (n + 1)) AS BIGINT) AS qnorm_e4
    FROM r
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of the quality score:
    qnorm = rank/(n+1) in ten-thousandths — the rank-based feature
    transform that makes quality thresholds comparable ACROSS sources
    whose raw score distributions differ (a 0.7 cut on web text and
    on code are different animals; the 70th percentile is the same
    animal).  Ties broken by doc_id so the rank — hence the hash — is
    total.  One keyed window per source partition; no global sort."""
    from week4_musemotion_spark.functions.exact import ratio_e4
    from week4_musemotion_spark.operators.textstats import quality_stats
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    scored = (
        quality_stats(d, keep_cols=("source",))
        .filter(F.col("n_tokens") > 0)
        .select("doc_id", "source", "quality_e4")
    )
    w = Window.partitionBy("source").orderBy(F.col("quality_e4").asc(), F.col("doc_id").asc())
    wn = Window.partitionBy("source")
    return scored.select(
        "doc_id",
        "source",
        "quality_e4",
        F.row_number().over(w).cast("long").alias("rk"),
        ratio_e4(
            F.row_number().over(w).cast("long"), (F.count(F.lit(1)).over(wn) + 1).cast("long")
        ).alias("qnorm_e4"),
    )


#: Packed-sequence capacity for the efficiency audit (tokens).
_PACK_CAP = 256


@query(
    "q_packing_efficiency",
    covers=("X-MIX-PACKEFF",),
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(text, '\\s+'), w -> w != '')) AS n_tokens
        FROM documents
    ),
    s AS (
        SELECT source, count(*) AS n_docs, sum(n_tokens) AS total_tokens
        FROM tok WHERE n_tokens > 0 GROUP BY source
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST((total_tokens + {_PACK_CAP - 1}) // {_PACK_CAP} AS BIGINT) AS n_seqs,
           CAST(((total_tokens + {_PACK_CAP - 1}) // {_PACK_CAP}) * {_PACK_CAP}
                - total_tokens AS BIGINT) AS waste_tokens,
           CAST((2 * total_tokens * 10000
                 + ((total_tokens + {_PACK_CAP - 1}) // {_PACK_CAP}) * {_PACK_CAP})
                // (2 * ((total_tokens + {_PACK_CAP - 1}) // {_PACK_CAP}) * {_PACK_CAP})
               AS BIGINT) AS util_e4
    FROM s
    """,
)
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit per source shard: sequences of
    capacity 256 packed per shard (the operators/curation.pack_sequences
    contract), so a shard wastes at most one partial sequence —
    emitted as total tokens, sequence count ceil(total/cap), wasted
    pad tokens, and utilization in ten-thousandths.  The number a
    training-infra owner actually watches: pad waste is pure burned
    compute.  One grouped integer aggregate; exact arithmetic
    throughout."""
    from week4_musemotion_spark.functions.exact import ratio_e4
    from week4_musemotion_spark.functions.text import tokens as _tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"))
    s = (
        tok.filter(F.col("n_tokens") > 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    n_seqs = F.floor((F.col("total_tokens") + _PACK_CAP - 1) / _PACK_CAP).cast("long")
    return s.select(
        "source",
        "n_docs",
        "total_tokens",
        n_seqs.alias("n_seqs"),
        (n_seqs * _PACK_CAP - F.col("total_tokens")).cast("long").alias("waste_tokens"),
        ratio_e4(F.col("total_tokens"), n_seqs * _PACK_CAP).alias("util_e4"),
    )


@query(
    "q_reservoir_per_group",
    covers=("X-MIX-RESERVOIR",),
    oracle=f"""
    WITH h AS (
        SELECT doc_id, source, {_DOC_HASH} AS hh FROM documents
    ),
    r AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS pick
        FROM h
    )
    SELECT doc_id, source, CAST(pick AS BIGINT) AS pick
    FROM r WHERE pick <= 5
    """,
)
def q_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sample: the 5 hash-smallest documents
    of every source — the "show me a few random-looking docs from
    each domain" eval-set builder, with membership a pure function of
    the keys (a true reservoir sample is RNG- and order-dependent;
    rank-by-hash gives the same uniformity with reproducibility).
    One keyed window per source partition; at scale this is the
    standard top-k-per-group shape (partial top-k per map task under
    AQE, never a global sort)."""
    from pyspark.sql import Window

    from week4_musemotion_spark.functions.hashing import stable_hash64

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        stable_hash64(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("pick", F.row_number().over(w).cast("long"))
        .filter(F.col("pick") <= 5)
        .select("doc_id", "source", "pick")
    )


@query(
    "q_stratified_minibatch",
    covers=("X-MIX-MINIBATCH",),
    oracle=f"""
    WITH h AS (
        SELECT doc_id, source, {_DOC_HASH} AS hh FROM documents
    ),
    r AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) - 1 AS rn
        FROM h
    )
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY rn, source, doc_id) - 1 AS BIGINT) AS batch_pos
    FROM r
    """,
)
def q_stratified_minibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-balanced batch assembly: documents are dealt round-robin
    across sources — position = rank of (within-source index, source)
    — so every consecutive slice of the output order (a training
    minibatch) holds a near-uniform source mix instead of long
    single-source runs (the gradient-diversity property batch
    construction wants; the same interleave builds modality-balanced
    batches with a modality column).  Within-source order is the
    deterministic hash shuffle.  Both ranks are distributed: the
    within-source index is a keyed window, the global interleave rank
    is the two-pass range-partitioned global index — no
    single-partition window touches the corpus."""
    from pyspark.sql import Window

    from week4_musemotion_spark.functions.hashing import stable_hash64
    from week4_musemotion_spark.operators.ranks import with_global_index

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        stable_hash64(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    r = d.withColumn("rn", (F.row_number().over(w) - 1).cast("long"))
    return with_global_index(r, ["rn", "source", "doc_id"], "batch_pos").select(
        "doc_id", "source", "batch_pos"
    )


@query(
    "q_seq_boundary_audit",
    covers=("X-MIX-PACK-SPAN",),
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(text, '\\s+'), w -> w != '')) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n,
               sum(n) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM tok WHERE n > 0
    ),
    p AS (
        SELECT source,
               ((cum - 1) // {_PACK_CAP}) - ((cum - n) // {_PACK_CAP}) + 1 AS spanned
        FROM c
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (spanned > 1) AS BIGINT) AS n_spanning,
           CAST(max(spanned) AS BIGINT) AS max_spanned
    FROM p GROUP BY source
    """,
)
def q_seq_boundary_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-boundary audit over the packing layout
    (operators/curation.pack_sequences, capacity 256): per source, how
    many documents straddle a packed-sequence boundary and the worst
    span — the documents whose attention window gets cut mid-text,
    the quantity a packing-strategy review trades against pad waste
    (see q_packing_efficiency for the other side of that trade).
    Rides the operator's own output: one keyed window cumsum per
    shard, then a grouped count."""
    from week4_musemotion_spark.operators.curation import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    p = pack_sequences(d, capacity=_PACK_CAP)
    return p.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(F.col("n_seqs_spanned") > 1, 1)).cast("long").alias("n_spanning"),
        F.max("n_seqs_spanned").cast("long").alias("max_spanned"),
    )
