"""Round-16 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: verify-skill rotation
note).

Wave: content-based data selection + weighted near-dup verification.

- q_dsir_select — DSIR-flavored target-domain selection (Xie et al.
  2023, "Data Selection for Language Models via Importance
  Resampling") in exact integers: per-term surprisal bits under the
  CORPUS unigram model minus bits under a TARGET-source model (both
  via the bin()-bit-length floor-log2 identity — zero libm), summed
  per doc and normalized to ppm-per-token; the top-k docs by gain are
  the ones that most resemble the target domain.  Distinct from the
  mixing family (``operators/mixing.py`` rebalances by the SOURCE
  LABEL) and from ``q_unigram_surprisal`` (one model, quality signal):
  this scores by CONTENT resemblance to a pinned target under a
  two-model log-ratio.
- q_weighted_jaccard_pairs — TF-weighted (multiset) Jaccard
  sum-min/sum-max over candidate pairs from rare-term blocking.
  Distinct from every existing near-dup operator: ``jaccard_pairs`` /
  MinHash / SimHash all run on DISTINCT shingle sets (set semantics),
  which saturate on repetitive documents; the weighted form (the
  exact objective weighted-MinHash sketches approximate, Ioffe 2010)
  counts term multiplicity, so a doc that repeats one paragraph 10x
  no longer looks identical to the single paragraph.

Differential evidence: tests/test_staged_r16.py (conftest.staged_diff
at sf0.001; sf0.01/sf0.1 via ``tools/check_correctness.py --staged``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import (
    dec,
    int_div_trunc,
    ratio_e4,
    ratio_e4_sql,
)
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table, spread

# chains staged_r15 -> ... -> r9 registration
import week4_musemotion_spark.queries.staged_r15  # noqa: F401

#: DSIR target source (pinned constant — swap for a real target
#: domain at will) and selection depth.
_DSIR_TARGET = "src0"
_DSIR_K = 100

#: Weighted-Jaccard feature space (word n-gram shingles — the
#: corpus' unigram vocabulary is tiny, so unigrams all have huge df
#: and cannot block), blocking df-cap (a shingle participates in
#: blocking only if 2 <= df <= cap; measured df: random 5-gram
#: collisions sit at df=1, planted near-dup clusters at 2-4, stable
#: across SFs because cluster size doesn't grow with the corpus) and
#: report depth.
_WJ_N = 5
_WJ_DF_CAP = 8
_WJ_K = 50

_TOK_SQL = (
    "SELECT doc_id, source,"
    " unnest(list_filter(string_split_regex(text, '\\s+'), w -> w != '')) AS term"
    " FROM documents"
)


_DSIR_ORACLE = f"""
    WITH tok AS ({_TOK_SQL}),
    cnt AS (
        SELECT term,
               CAST(count(*) AS BIGINT) AS cc,
               CAST(count(*) FILTER (WHERE source = '{_DSIR_TARGET}') AS BIGINT) AS ct
        FROM tok GROUP BY term
    ),
    tot AS (
        SELECT CAST(sum(cc) AS BIGINT) AS nc, CAST(sum(ct) AS BIGINT) AS nt
        FROM cnt
    ),
    model AS (
        SELECT term,
               CAST(length(bin(nc // cc)) - 1 AS BIGINT) AS bc,
               CAST(length(bin(nt // ct)) - 1 AS BIGINT) AS bt
        FROM cnt CROSS JOIN tot WHERE ct > 0
    ),
    per_doc AS (
        SELECT t.doc_id, t.source,
               CAST(count(*) AS BIGINT) AS n_scored,
               CAST(sum(m.bc) AS BIGINT) AS sum_bc,
               CAST(sum(m.bt) AS BIGINT) AS sum_bt
        FROM tok t JOIN model m USING (term)
        GROUP BY t.doc_id, t.source
    )
    SELECT doc_id, source, n_scored,
           CAST(CAST(sum_bc AS HUGEINT) * 1000000 // n_scored AS BIGINT) AS corpus_ppm,
           CAST(CAST(sum_bt AS HUGEINT) * 1000000 // n_scored AS BIGINT) AS target_ppm,
           CAST(CAST(sum_bc AS HUGEINT) * 1000000 // n_scored
                - CAST(sum_bt AS HUGEINT) * 1000000 // n_scored AS BIGINT) AS gain_ppm
    FROM per_doc
    ORDER BY gain_ppm DESC, doc_id
    LIMIT {_DSIR_K}
"""


@query("q_dsir_select", covers=("X-DSIR",), oracle=_DSIR_ORACLE)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} documents by target-domain importance gain — the DSIR
    selection rule (log p_target(x) - log p_corpus(x), Xie et al.
    2023) made EXACT: each token contributes floor(log2(Nc/cc)) -
    floor(log2(Nt/ct)) bits (corpus-model surprisal minus
    target-model surprisal, both via the bin()-bit-length identity),
    normalized per doc to ppm-per-token as the difference of two
    truncating e6 divisions (each non-negative, so trunc == floor on
    both engines; a single signed division would hit the engines'
    differing signed-// conventions).  Tokens outside the target
    model's vocabulary are excluded from BOTH sums and the
    denominator (inner join on the model — the replayable twin of
    DSIR's hash-bucketed OOV smoothing); docs with zero in-vocabulary
    tokens drop out identically on both engines.

    100 TB story: BOTH unigram models come out of ONE token-keyed
    aggregation (cc = count, ct = count filtered to the target
    source) — the two-scan floor of q_unigram_surprisal holds even
    with two models.  Scoring is a vocabulary-keyed hash join (no
    broadcast assumption), per-doc aggregation, then a distributed
    top-k (TakeOrderedAndProject — never a global sort).  Per-doc
    long sums are safe: wrapping needs 2^57 tokens in ONE document.

    Reference analogue: turns the reference's fixed scalar keep-rules
    (load_musemotion_to_db.py:91-143) into a trainable-distribution
    selection rule."""
    from week4_musemotion_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    cnt = (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cc"),
            F.count_if(F.col("source") == _DSIR_TARGET).cast("long").alias("ct"),
        )
        .localCheckpoint(eager=False)  # vocabulary-bounded; feeds tot + model
    )
    tot = cnt.agg(
        F.sum("cc").cast("long").alias("nc"), F.sum("ct").cast("long").alias("nt")
    )
    bits = lambda n, c: (F.length(F.bin(F.expr(f"{n} div {c}"))) - F.lit(1)).cast("long")  # noqa: E731
    model = (
        cnt.filter(F.col("ct") > 0)
        .crossJoin(F.broadcast(tot))
        .select("term", bits("nc", "cc").alias("bc"), bits("nt", "ct").alias("bt"))
    )
    per_doc = (
        tok.join(model, "term")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.sum("bc").cast("long").alias("sum_bc"),
            F.sum("bt").cast("long").alias("sum_bt"),
        )
    )
    ppm = lambda c: int_div_trunc(dec(F.col(c)) * F.lit(1_000_000), F.col("n_scored"))  # noqa: E731
    return (
        per_doc.select(
            "doc_id",
            "source",
            "n_scored",
            ppm("sum_bc").alias("corpus_ppm"),
            ppm("sum_bt").alias("target_ppm"),
            (ppm("sum_bc") - ppm("sum_bt")).cast("long").alias("gain_ppm"),
        )
        .orderBy(F.desc("gain_ppm"), "doc_id")
        .limit(_DSIR_K)
    )


def _wj_oracle() -> str:
    from week4_musemotion_spark.queries.staged_r9 import _gram_sql

    return f"""
    WITH {_gram_sql(_WJ_N, cols="doc_id", prefix="wj")},
    tf AS (
        SELECT doc_id, s, CAST(count(*) AS BIGINT) AS tf
        FROM wjg GROUP BY doc_id, s
    ),
    tot AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tot FROM tf GROUP BY doc_id),
    rare AS (
        SELECT s FROM tf GROUP BY s
        HAVING count(*) BETWEEN 2 AND {_WJ_DF_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM tf a JOIN rare USING (s) JOIN tf b USING (s)
        WHERE a.doc_id < b.doc_id
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b,
               CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS inter_w
        FROM cand c
        JOIN tf a ON a.doc_id = c.doc_a
        JOIN tf b ON b.doc_id = c.doc_b AND b.s = a.s
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b, i.inter_w,
           CAST(ta.tot + tb.tot - i.inter_w AS BIGINT) AS union_w,
           {ratio_e4_sql("i.inter_w", "ta.tot + tb.tot - i.inter_w")} AS wjac_e4
    FROM inter i
    JOIN tot ta ON ta.doc_id = i.doc_a
    JOIN tot tb ON tb.doc_id = i.doc_b
    ORDER BY wjac_e4 DESC, doc_a, doc_b
    LIMIT {_WJ_K}
"""


@query("q_weighted_jaccard_pairs", covers=("X-WJACCARD",), oracle=_wj_oracle())
def q_weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} document pairs by TF-weighted (multiset) Jaccard over
    word {n}-gram shingles — J_w(A,B) = sum_s min(tf_A, tf_B) /
    sum_s max(tf_A, tf_B), the exact objective weighted-MinHash
    approximates (Ioffe 2010) — with candidates from RARE-SHINGLE
    blocking (a pair is considered iff it shares a shingle with
    document frequency in [2, {cap}]), the record-linkage trick that
    keeps the pair stage linear.  The max side never materializes:
    sum_s max = tot_A + tot_B - sum_min (min is 0 off the shared
    support), so only shared shingles join.  Set-semantics Jaccard
    (``operators/dedup.jaccard_pairs``) saturates on repetitive docs
    — a doc repeating one paragraph 10x is set-identical to the
    paragraph; the weighted form is the repetition-aware verifier.

    100 TB story: one tokenize pass feeds a pinned (doc, shingle, tf)
    table; blocking candidates are bounded by df_cap^2/2 * |rare
    shingles| pairs (quadratic only within a df-capped posting list,
    the same bound as the contamination stop-gram cap — random
    {n}-gram collisions sit at df=1 and planted dup clusters at
    constant size, so the cap holds as the corpus grows);
    verification is two hash joins keyed on (doc, shingle) — no
    corpus^2 stage anywhere.  Emitted wjac is the exact e4 integer
    ratio; ties break on ids, so the LIMIT is total-order
    deterministic.

    Reference analogue: generalizes the reference's exact-equality
    dedup (load_musemotion_to_db.py:91-143) to graded multiset
    similarity."""
    from week4_musemotion_spark.functions.text import shingles, tokens

    # spread: the shingle construction is the query's dominant cost
    # and a single-row-group scan runs it in ONE task (measured 7.8s
    # -> 1.7s at sf0.1 for the explode pass alone)
    docs = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        docs.select(
            "doc_id", F.explode(shingles(tokens(F.col("text")), _WJ_N)).alias("s")
        )
        .groupBy("doc_id", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)  # feeds blocking + both verify sides + totals
    )
    tot = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("tot"))
    rare = (
        tf.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(2, _WJ_DF_CAP))
        .select("s")
    )
    post = tf.join(rare, "s").select("s", "doc_id")
    cand = (
        post.alias("a")
        .join(post.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    a, b = tf.alias("a"), tf.alias("b")
    inter = (
        cand.join(a, F.col("a.doc_id") == F.col("doc_a"))
        .join(
            b,
            (F.col("b.doc_id") == F.col("doc_b")) & (F.col("b.s") == F.col("a.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least(F.col("a.tf"), F.col("b.tf"))).cast("long").alias("inter_w"))
    )
    ta = tot.withColumnsRenamed({"doc_id": "doc_a", "tot": "tot_a"})
    tb = tot.withColumnsRenamed({"doc_id": "doc_b", "tot": "tot_b"})
    union_w = F.col("tot_a") + F.col("tot_b") - F.col("inter_w")
    return (
        inter.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter_w",
            union_w.cast("long").alias("union_w"),
            ratio_e4(F.col("inter_w"), union_w.cast("long")).alias("wjac_e4"),
        )
        .orderBy(F.desc("wjac_e4"), "doc_a", "doc_b")
        .limit(_WJ_K)
    )
