"""Round-15 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: verify-skill rotation
note).

Wave: deterministic corpus sharding + model-based quality scoring.

- q_shard_rendezvous — rendezvous (highest-random-weight) sharding
  of the document corpus (Thaler & Ravishankar 1998): every doc goes
  to the shard whose seeded portable hash of the doc id is highest,
  so assignment needs NO coordination state and — the property that
  matters when re-sharding a 100 TB corpus across workers — removing
  a shard moves ONLY that shard's documents (verified in-engine with
  an assert, re-derived row-for-row by the oracle).  Distinct from
  ``q_shard_skew_audit``, which audits the balance of an EXISTING
  (source, lang) partition layout; this query decides placement.
- q_unigram_surprisal — the CCNet-style perplexity-proxy quality
  filter in exact integers: floor(log2(N/count)) bits per token via
  the bin()-bit-length identity, per-doc bits-per-token ppm, per
  source mean + min/max tails.  Distinct from the scalar-ratio
  quality score (``_quality_e4_sql`` family): this one scores
  against a MODEL fitted on the corpus itself.

Differential evidence: tests/test_staged_r15.py (conftest.staged_diff
at sf0.001; sf0.01/sf0.1 via ``tools/check_correctness.py --staged``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.hashing import stable_hash64, stable_hash64_sql
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

# chains staged_r14 -> ... -> r9 registration
import week4_musemotion_spark.queries.staged_r14  # noqa: F401

#: Shard count and hash-seed base.  8 keeps the oracle's 8x row
#: expansion cheap while exercising the full argmax machinery; the
#: seed base namespaces the shard hash family away from every other
#: seeded stable_hash64 use in the engine.
_N_SHARDS = 8
_SEED_BASE = 9000


def _hrw_structs() -> F.Column:
    """The (hash, s) struct array for all _N_SHARDS seeds.  Aliased
    once in a lower select so the S=8 and S=7 picks read the SAME md5
    evaluations: a two-stage select is not a materialization barrier
    in general, but CollapseProject declines to inline a NON-CHEAP
    expression referenced more than once, so the optimized plan keeps
    the array in its own Project (exactly S md5 calls — pinned by
    tests/test_staged_r15.py::test_hrw_single_hash_pass against the
    optimized plan, so a Catalyst policy change surfaces as a test
    failure, not a silent 2x hash cost).  array_max over the structs
    is lexicographic, so ties (astronomically unlikely, but the
    integer discipline never relies on that) break to the highest s —
    the oracle replays the same law with ORDER BY h DESC, s DESC."""
    did = F.col("doc_id").cast("string")
    return F.array(
        *[
            F.struct(
                stable_hash64(did, seed=_SEED_BASE + s).alias("h"),
                F.lit(s).cast("int").alias("s"),
            )
            for s in range(_N_SHARDS)
        ]
    )


def _hrw_picks(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, shard8, shard7) — the S=8 pick and the pick
    with shard S-1 removed, both read off ONE struct-array column
    (see :func:`_hrw_structs` for the single-hash-pass guarantee)."""
    last = _N_SHARDS - 1
    return docs.select("doc_id", "n_chars", _hrw_structs().alias("hs")).select(
        "doc_id",
        "n_chars",
        F.array_max(F.col("hs"))["s"].alias("shard8"),
        F.array_max(F.slice(F.col("hs"), 1, last))["s"].alias("shard7"),
    )


def _hrw_oracle_sql() -> str:
    h = stable_hash64_sql("CAST(doc_id AS VARCHAR)", seed_expr=f"s.s + {_SEED_BASE}")
    last = _N_SHARDS - 1
    return f"""
    WITH h AS (
        SELECT doc_id, n_chars, s.s AS s, {h} AS h
        FROM documents, (SELECT unnest(range({_N_SHARDS})) AS s) s
    ),
    a8 AS (
        SELECT doc_id, n_chars,
               (array_agg(s ORDER BY h DESC, s DESC))[1] AS shard8
        FROM h GROUP BY doc_id, n_chars
    ),
    a7 AS (
        SELECT doc_id, (array_agg(s ORDER BY h DESC, s DESC))[1] AS shard7
        FROM h WHERE s < {last} GROUP BY doc_id
    ),
    j AS (
        SELECT a8.doc_id, a8.n_chars, a8.shard8,
               CASE WHEN a8.shard8 != {last} AND a7.shard7 != a8.shard8
                    THEN error('HRW minimal-movement violated')
                    ELSE a7.shard7 END AS shard7
        FROM a8 JOIN a7 USING (doc_id)
    ),
    base AS (
        SELECT shard8 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM j GROUP BY shard8
    ),
    inh AS (
        SELECT shard7 AS shard, CAST(count(*) AS BIGINT) AS n_inherited
        FROM j WHERE shard8 = {last} GROUP BY shard7
    ),
    grid AS (SELECT unnest(range({_N_SHARDS})) AS shard)
    SELECT CAST(grid.shard AS INT) AS shard,
           COALESCE(base.n_docs, 0) AS n_docs,
           COALESCE(base.n_chars, 0) AS n_chars,
           CASE WHEN grid.shard = {last} THEN 0
                ELSE COALESCE(inh.n_inherited, 0) END AS n_inherited,
           CASE WHEN grid.shard = {last} THEN 0
                ELSE COALESCE(base.n_docs, 0) + COALESCE(inh.n_inherited, 0)
                END AS n_after_removal
    FROM grid
    LEFT JOIN base ON base.shard = grid.shard
    LEFT JOIN inh ON inh.shard = grid.shard
    ORDER BY shard
    """


@query("q_shard_rendezvous", covers=("X-SHARD-HRW",), oracle=_hrw_oracle_sql())
def q_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (HRW) sharding plan over the document corpus: per
    shard, its document/character load under S=8, the documents it
    INHERITS if shard S-1 is decommissioned, and the resulting
    post-removal load — with the minimal-movement law (a doc moves
    iff it lived on the removed shard) asserted in-engine on every
    row and re-derived by the oracle with error().

    100 TB story: assignment is S seeded md5 expressions per row
    inside the scan's codegen (no dimension table, no coordination
    state, no shuffle to decide placement); the only exchange is the
    8-group partial-aggregated rollup, and the 8-row grid/agg frames
    broadcast.  Re-sharding cost is the point: HRW moves exactly
    1/S of the corpus when a worker leaves — a modulo scheme
    (doc_id % S) would reshuffle (S-1)/S of 100 TB.

    Reference analogue: the load pipeline's fixed table placement
    (load_musemotion_to_db.py writes ONE table); this is what
    placement has to become when one table is 100 TB."""
    last = _N_SHARDS - 1
    docs = load_table(spark, sf_dir, "documents")
    d = _hrw_picks(docs)
    guard = F.assert_true(
        (F.col("shard8") == last) | (F.col("shard7") == F.col("shard8")),
        F.lit("HRW minimal-movement violated"),
    )
    # the assert rides n_chars (a used expression on EVERY row), so
    # Catalyst keeps it for the full corpus, not just moved docs
    d = d.withColumn("n_chars_g", F.when(guard.isNull(), F.col("n_chars")))
    # ONE corpus scan: both rollups (load by shard, inheritance of the
    # removed shard's docs) derive from the <= S*(S-1) (shard8,
    # shard7) cell table; the pin keeps the two branches from
    # re-executing the corpus aggregate.
    cell = (
        d.groupBy("shard8", "shard7")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cell_docs"),
            F.sum("n_chars_g").cast("long").alias("cell_chars"),
        )
        .localCheckpoint(eager=False)
    )
    base = cell.groupBy("shard8").agg(
        F.sum("cell_docs").cast("long").alias("n_docs"),
        F.sum("cell_chars").cast("long").alias("n_chars"),
    )
    inh = (
        cell.filter(F.col("shard8") == last)
        .groupBy("shard7")
        .agg(F.sum("cell_docs").cast("long").alias("n_inherited"))
    )
    grid = spark.range(_N_SHARDS).select(F.col("id").cast("int").alias("shard"))
    out = (
        grid.join(F.broadcast(base), grid.shard == base.shard8, "left")
        .join(F.broadcast(inh), grid.shard == inh.shard7, "left")
        .select(
            "shard",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("n_chars"),
            F.when(F.col("shard") == last, F.lit(0))
            .otherwise(F.coalesce(F.col("n_inherited"), F.lit(0)))
            .cast("long")
            .alias("n_inherited"),
        )
        .withColumn(
            "n_after_removal",
            F.when(F.col("shard") == last, F.lit(0))
            .otherwise(F.col("n_docs") + F.col("n_inherited"))
            .cast("long"),
        )
    )
    return out.orderBy("shard")


_SURPRISAL_ORACLE = """
    WITH tok AS (
        SELECT doc_id, source,
               unnest(list_filter(string_split_regex(text, '\\s+'), w -> w != '')) AS term
        FROM documents
    ),
    cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY term),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM cnt),
    model AS (
        SELECT term, CAST(length(bin(n_total // cnt)) - 1 AS BIGINT) AS sb
        FROM cnt CROSS JOIN tot
    ),
    per_doc AS (
        SELECT t.doc_id, t.source,
               CAST(count(*) AS BIGINT) AS n_tok,
               CAST(sum(m.sb) AS BIGINT) AS bits
        FROM tok t JOIN model m USING (term)
        GROUP BY t.doc_id, t.source
    ),
    scored AS (
        SELECT source, n_tok,
               CAST(CAST(bits AS HUGEINT) * 1000000 // n_tok AS BIGINT) AS ppm
        FROM per_doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(ppm) // count(*) AS BIGINT) AS mean_bits_ppm,
           CAST(min(ppm) AS BIGINT) AS min_bits_ppm,
           CAST(max(ppm) AS BIGINT) AS max_bits_ppm
    FROM scored GROUP BY source
"""


@query("q_unigram_surprisal", covers=("X-SURPRISAL",), oracle=_SURPRISAL_ORACLE)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram-surprisal quality score — the CCNet-style
    perplexity-proxy filter (Wenzek et al. 2020) made EXACT: each
    token scores floor(log2(N / count(token))) bits against the
    corpus' own unigram model, computed as ``length(bin(N div cnt)) -
    1`` — floor(log2(x)) for x >= 1 equals bit_length(floor(x)) - 1,
    so no libm log ever runs on either engine (the qsketch bin()-bit
    discipline).  Per doc: bits-per-token ppm; per source: the mean
    and the min/max tails (low = boilerplate/repetitive, high =
    gibberish/rare-vocabulary — the two populations a perplexity
    filter trims).  Documents with zero tokens carry no rows on
    either engine and are excluded identically.

    100 TB story: the model is VOCABULARY-bounded (term, bits), built
    with one token-keyed aggregation; scoring is a hash equi-join on
    term (no broadcast assumption — web-scale vocab outgrows one
    executor) followed by doc- then source-keyed aggregations.  Two
    corpus scans total (model build + scoring) — the no-materialization
    floor; a production pipeline would persist the token table once
    and pay one.

    Reference analogue: extends the reference's fixed quality
    thresholds (musemotion ETL keeps rows by scalar predicates) to a
    model-based score."""
    from week4_musemotion_spark.functions.exact import dec, int_div_trunc
    from week4_musemotion_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    # the unigram model is VOCABULARY-bounded — pin it so the total
    # (an agg over it) and the per-term bits table share ONE
    # token-count pass instead of re-running the corpus explode
    cnt = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tot = cnt.agg(F.sum("cnt").cast("long").alias("n_total"))
    model = cnt.crossJoin(F.broadcast(tot)).select(
        "term",
        (F.length(F.bin(F.expr("n_total div cnt"))) - F.lit(1))
        .cast("long")
        .alias("sb"),
    )
    per_doc = (
        tok.join(model, "term")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("sb").cast("long").alias("bits"),
        )
    )
    scored = per_doc.select(
        "source",
        "n_tok",
        int_div_trunc(dec(F.col("bits")) * F.lit(1_000_000), F.col("n_tok"))
        .cast("long")
        .alias("ppm"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        # dec() widening must happen INSIDE the aggregation — sum the
        # widened column, matching DuckDB's HUGEINT promotion.  A raw
        # long sum wraps silently past 2^63 BEFORE any outer cast
        # could see it (ppm reaches 64e6, so ~1.4e11 docs/source).
        int_div_trunc(F.sum(dec(F.col("ppm"))), F.count(F.lit(1)))
        .cast("long")
        .alias("mean_bits_ppm"),
        F.min("ppm").cast("long").alias("min_bits_ppm"),
        F.max("ppm").cast("long").alias("max_bits_ppm"),
    )
