"""STAGED FOR ROUND 7 — built and pytest-verified this round, but
NOT imported by ``queries/__init__`` yet: the driver's ~50-query
correctness window re-validates the stalest evidence cohort each
round, and registering more than ~10 new queries per round starves
that rotation (see SURVEY.md round-6 wave / the verify skill note).
To activate: add ``from week4_musemotion_spark.queries import
staged_r7`` to ``queries/__init__.py``.

Sketch-quality and PCA queries:

- q_minhash_fidelity — per verified near-dup pair, exact Jaccard vs
  the 16-seed portable-MinHash agreement count: the audit that
  answers "is my MinHash config good enough on MY corpus" with data,
  not formulas.
- q_dedup_threshold_sweep — near-dup pair/doc counts across a
  threshold grid: the curve a curation team reads before committing
  to a dedup threshold.
- q_stopword_density_by_source — per-source density of the corpus'
  heavy-hitter tokens (boilerplate/stopword saturation signal),
  reusing operators/sketches.heavy_hitters.
- q_embedding_whiten — rows-only: PCA-whitened projection
  (eigensolve is not SQL-expressible; semantics pinned by
  tests/test_linalg.py numpy recompute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import dec, int_div_trunc, ratio_e4
from week4_musemotion_spark.functions.hashing import _HEX_DIGITS, stable_hash64
from week4_musemotion_spark.queries.extensions import _jaccard_ctes
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

#: Portable-MinHash family size for the fidelity audit (md5-derived
#: seeds — engine-replayable, unlike the production xxhash64 family).
_FIDELITY_HASHES = 16

#: Pair domain for the sketch-quality audits: exact Jaccard >= 0.5
#: (this corpus: planted pairs >= 0.9, noise <= 0.07 — huge margin).
_FIDELITY_MIN_JACCARD = 0.5

#: Dedup-threshold grid (e4 fixed-point).
_SWEEP_THRESHOLDS = (5000, 6000, 7000, 8000, 9000)


@query(
    "q_minhash_fidelity",
    covers=("X-MINHASH-FIDELITY",),
    oracle=f"""
    WITH {_jaccard_ctes(_FIDELITY_MIN_JACCARD)},
    mh AS (
        -- stable_hash64_sql's seeded form with a ROW-valued seed
        -- (the helper takes a literal): same 'k:' prefix, same
        -- md5-prefix width, so Spark's stable_hash64(s, seed=k)
        -- replays bit-for-bit
        SELECT sh.doc_id, s.k,
               min(CAST(('0x' || substr(md5(CAST(s.k AS VARCHAR) || ':' || sh.shingle), 1, {_HEX_DIGITS})) AS BIGINT)) AS mv
        FROM sh CROSS JOIN (SELECT unnest(range(0, {_FIDELITY_HASHES})) AS k) s
        GROUP BY sh.doc_id, s.k
    )
    SELECT p.doc_a, p.doc_b,
           CAST((2 * p.i * 10000 + (p.na + p.nb - p.i)) // (2 * (p.na + p.nb - p.i)) AS BIGINT) AS jaccard_e4,
           CAST(count(*) FILTER (WHERE a.mv = b.mv) AS BIGINT) AS sig_agree,
           CAST((2 * count(*) FILTER (WHERE a.mv = b.mv) * 10000 + {_FIDELITY_HASHES})
                // (2 * {_FIDELITY_HASHES}) AS BIGINT) AS est_e4
    FROM pairs p
    JOIN mh a ON a.doc_id = p.doc_a
    JOIN mh b ON b.doc_id = p.doc_b AND b.k = a.k
    GROUP BY p.doc_a, p.doc_b, p.i, p.na, p.nb
    """,
)
def q_minhash_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash sketch-quality audit: for every verified near-dup pair
    (exact 3-gram Jaccard >= 0.5), the exact Jaccard next to the
    16-seed MinHash signature agreement — measured on THIS corpus, so
    a config change (bands, rows, hash count) is judged by data
    rather than by the 1-(1-s^r)^b formula alone.  The hash family
    here is the md5-portable ``stable_hash64`` (seeded), which is
    what lets the oracle replay every signature bit-for-bit; the
    production family swaps in xxhash64 behind the same shape.

    Scale: pair domain comes from the shingle equi-join (never
    all-pairs); signatures are one grouped aggregate over the
    exploded shingle table (16 mins in a single shuffle)."""
    from week4_musemotion_spark.operators.dedup import _intersections, shingle_strings

    d = load_table(spark, sf_dir, "documents")
    shs = shingle_strings(d).distinct().persist()
    sh = shs.select("_id", F.col("s").alias("shingle"))
    pairs = (
        _intersections(None, sh)
        .filter(F.col("jac") >= _FIDELITY_MIN_JACCARD)
        .select("doc_a", "doc_b", "jaccard_e4")
        .localCheckpoint(eager=False)  # feeds the member prune AND the final join
    )
    # signatures only for documents that appear in a near-dup pair —
    # the pair set is tiny next to the corpus, so this broadcast
    # semi-join prunes ~all of the 16-seed hashing and its shuffle
    members = (
        pairs.select(F.col("doc_a").alias("_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("_id")))
        .distinct()
    )
    sig = (
        shs.join(F.broadcast(members), "_id", "semi")
        .groupBy("_id")
        .agg(
            *[
                F.min(stable_hash64(F.col("s"), seed=k)).alias(f"mh_{k}")
                for k in range(_FIDELITY_HASHES)
            ]
        )
    )
    a = sig.select(F.col("_id").alias("doc_a"), *[F.col(f"mh_{k}").alias(f"a_{k}") for k in range(_FIDELITY_HASHES)])
    b = sig.select(F.col("_id").alias("doc_b"), *[F.col(f"mh_{k}").alias(f"b_{k}") for k in range(_FIDELITY_HASHES)])
    agree = sum(
        F.when(F.col(f"a_{k}") == F.col(f"b_{k}"), 1).otherwise(0)
        for k in range(_FIDELITY_HASHES)
    ).cast("long")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard_e4",
            agree.alias("sig_agree"),
            ratio_e4(agree, F.lit(_FIDELITY_HASHES)).alias("est_e4"),
        )
    )


@query(
    "q_dedup_threshold_sweep",
    covers=("X-DEDUP-THRESHOLD-SWEEP",),
    oracle=f"""
    WITH {_jaccard_ctes(_FIDELITY_MIN_JACCARD)},
    jac AS (
        SELECT doc_a, doc_b,
               CAST((2 * i * 10000 + (na + nb - i)) // (2 * (na + nb - i)) AS BIGINT) AS jaccard_e4
        FROM pairs
    ),
    grid AS (SELECT CAST(unnest([{", ".join(map(str, _SWEEP_THRESHOLDS))}]) AS BIGINT) AS thr_e4),
    q AS (
        SELECT g.thr_e4, j.doc_a, j.doc_b
        FROM grid g LEFT JOIN jac j ON j.jaccard_e4 >= g.thr_e4
    ),
    dc AS (
        SELECT thr_e4, CAST(count(DISTINCT d) AS BIGINT) AS n_dup_docs
        FROM (SELECT thr_e4, unnest([doc_a, doc_b]) AS d FROM q WHERE doc_a IS NOT NULL)
        GROUP BY thr_e4
    )
    SELECT p.thr_e4, p.n_pairs, COALESCE(dc.n_dup_docs, 0) AS n_dup_docs
    FROM (SELECT thr_e4, CAST(count(doc_a) AS BIGINT) AS n_pairs FROM q GROUP BY thr_e4) p
    LEFT JOIN dc ON dc.thr_e4 = p.thr_e4
    """,
)
def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold selection curve: for each candidate Jaccard
    threshold, how many pairs would be flagged and how many documents
    they touch — the table a curation team reads before fixing the
    dedup threshold (too low: real content removed; too high: planted
    near-dups survive).  Thresholds compare against the rounded-e4
    integer Jaccard, so the grid comparison is exact on both engines.

    Scale: the pair table is computed ONCE from the shingle equi-join
    (near-dup pairs — tiny relative to the corpus), checkpointed, and
    the grid fan-out runs over that tiny frame only."""
    from week4_musemotion_spark.operators.dedup import jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = (
        jaccard_pairs(d, _FIDELITY_MIN_JACCARD)
        .select("doc_a", "doc_b", "jaccard_e4")
        .localCheckpoint(eager=False)
    )
    grid = spark.createDataFrame(
        [(t,) for t in _SWEEP_THRESHOLDS], "thr_e4 long"
    )
    q = grid.join(
        pairs, pairs.jaccard_e4 >= grid.thr_e4, "left"
    ).select("thr_e4", "doc_a", "doc_b")
    n_pairs = q.groupBy("thr_e4").agg(F.count("doc_a").cast("long").alias("n_pairs"))
    docs = (
        q.filter(F.col("doc_a").isNotNull())
        .select("thr_e4", F.explode(F.array("doc_a", "doc_b")).alias("d"))
        .groupBy("thr_e4")
        .agg(F.countDistinct("d").cast("long").alias("n_dup_docs"))
    )
    return (
        n_pairs.join(docs, "thr_e4", "left")
        .select(
            "thr_e4",
            "n_pairs",
            F.coalesce(F.col("n_dup_docs"), F.lit(0).cast("long")).alias("n_dup_docs"),
        )
    )


@query(
    "q_stopword_density_by_source",
    covers=("X-STOPWORD-DENSITY",),
    oracle="""
    WITH tok AS (
        SELECT source,
               unnest(list_filter(string_split_regex(text, '\\s+'), w -> w != '')) AS term
        FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY term),
    hh AS (
        SELECT term FROM c CROSS JOIN tot
        WHERE cnt >= (CAST(total AS HUGEINT) + 511) // 512
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(h.term) AS BIGINT) AS n_hh,
           CAST((CAST(count(h.term) AS HUGEINT) * 1000000) // count(*) AS BIGINT) AS hh_ppm
    FROM tok t LEFT JOIN hh h ON t.term = h.term
    GROUP BY t.source
    """,
)
def q_stopword_density_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/stopword saturation per source: the share of each
    source's token stream made of CORPUS-level heavy-hitter tokens
    (>= 1/512 of all occurrences — q_heavy_hitters' set).  A source
    whose hh_ppm sits far above the corpus norm is template/boiler-
    plate-heavy and a candidate for stronger paragraph dedup; far
    below suggests tokenizer-hostile text (code, tables).

    Scale: the heavy-hitter set comes from the two-pass MG sketch
    (broadcast-sized by construction — at most 512 values), so the
    density pass is ONE scan with a broadcast left join and a
    |sources|-group aggregate."""
    from week4_musemotion_spark.functions.text import tokens
    from week4_musemotion_spark.operators.sketches import heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens(F.col("text"))).alias("term"))
    hh = heavy_hitters(tok.select("term"), "term", den=512).select("term").withColumn(
        "is_hh", F.lit(1)
    )
    n_hh = F.sum(F.coalesce(F.col("is_hh"), F.lit(0))).cast("long")
    return (
        tok.join(F.broadcast(hh), "term", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            n_hh.alias("n_hh"),
            int_div_trunc(dec(n_hh) * 1_000_000, F.count(F.lit(1))).alias("hh_ppm"),
        )
    )


@query("q_embedding_whiten", covers=("X-EMBED-WHITEN",), oracle=None)
def q_embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-whitened 8-component projection of the embedding corpus
    (``operators/linalg.pca_fit`` + ``pca_project(whiten=True)``) —
    the standard pre-conditioning step before SemDeDup / clustering /
    ANN when raw dimensions are correlated.  Rows-only like the ANNs:
    the d x d eigensolve is not SQL-expressible; the moment
    accumulation feeding it IS oracle-checked (q_embedding_gram) and
    the projection semantics are pinned against a full numpy
    recompute in tests/test_linalg.py."""
    from week4_musemotion_spark.operators.linalg import pca_fit, pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, "embedding", k=8)
    return pca_project(emb, model, "embedding", out_col="proj", whiten=True)
