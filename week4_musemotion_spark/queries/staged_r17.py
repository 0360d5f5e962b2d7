"""Round-17 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: verify-skill rotation
note).

Wave: retrieval fusion + contrastive-batch hygiene.

- q_rrf_fusion — reciprocal-rank fusion (Cormack, Clarke & Büttcher
  2009) of the engine's two lexical rankings (BM25 and tf·idf), in
  exact integers: each system contributes ``10^9 // (60 + rank)``,
  so the fused score — and therefore the hybrid ranking — replays
  bit-for-bit across engines.  Distinct from q_rank_overlap_rbo
  (which MEASURES agreement between the same two rankings): fusion
  PRODUCES the ranking a hybrid retrieval stack actually serves, and
  both sides are single-sourced from the registered queries, so the
  fused list can never drift from its inputs.
- q_inbatch_collisions — contrastive-training false-negative audit:
  the rate at which near-duplicate pairs land in the SAME training
  minibatch under the engine's deterministic shuffle (where they
  would be scored as negatives of each other).  Composes the
  det-shuffle batch assignment with the exact n-gram Jaccard pair
  table, and reports the observed collision rate next to the exact
  random-permutation expectation sum_b s_b(s_b-1) / (N(N-1)) — the
  number the observed rate must be judged against (a hash shuffle is
  a random permutation for this purpose; a SORTED-by-source order
  would collide far above expectation).

Differential evidence: tests/test_staged_r17.py (conftest.staged_diff
at sf0.001; sf0.01/sf0.1 via ``tools/check_correctness.py --staged``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import dec, int_div_trunc
from week4_musemotion_spark.functions.hashing import stable_hash64_sql
from week4_musemotion_spark.queries.extensions import (
    JACCARD_THRESHOLD,
    _jaccard_ctes,
)
from week4_musemotion_spark.queries.registry import REGISTRY, query
from week4_musemotion_spark.queries.staged_r11 import _ranked_oracle
from week4_musemotion_spark.sources.tables import load_table

# chains staged_r16 -> ... -> r9 registration (q_bm25_topk and
# q_doc_search oracles are composed from the registry below)
import week4_musemotion_spark.queries.staged_r16  # noqa: F401

#: RRF smoothing constant (the k=60 of Cormack et al. 2009 — large
#: enough that rank 1 vs 2 doesn't dominate, small enough that depth
#: still matters) and fused output depth.
_RRF_C = 60
_RRF_DEPTH = 20

#: Contrastive minibatch size for the collision audit.
_BATCH_SIZE = 32


@query(
    "q_rrf_fusion",
    covers=("X-RRF",),
    oracle=f"""
    WITH a AS ({_ranked_oracle("q_bm25_topk")}),
    b AS ({_ranked_oracle("q_doc_search")}),
    u AS (
        SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
               a.rnk AS ra, b.rnk AS rb
        FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    )
    SELECT doc_id,
           CAST(coalesce(1000000000 // ({_RRF_C} + ra), 0)
                + coalesce(1000000000 // ({_RRF_C} + rb), 0) AS BIGINT) AS rrf_e9,
           CAST((CASE WHEN ra IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN rb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_systems,
           CAST(coalesce(ra, 0) AS BIGINT) AS rank_bm25,
           CAST(coalesce(rb, 0) AS BIGINT) AS rank_tfidf
    FROM u
    ORDER BY rrf_e9 DESC, doc_id
    LIMIT {_RRF_DEPTH}
    """,
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 and
    tf·idf top-20 lists — ``score(d) = Σ_systems 10^9 // (60 +
    rank_s(d))``, integer-exact, absent ranks contribute 0 (and
    report as rank 0).  RRF needs no score calibration between
    systems (only ranks enter), which is why it is the default fuser
    for lexical+semantic hybrid stacks; here it fuses the engine's
    two lexical scorers end-to-end, single-sourced from the
    REGISTERED queries (builders on the Spark side, their oracles as
    CTEs on the DuckDB side) so the fusion can never drift from its
    inputs.

    Plan: two top-k TakeOrderedAndProject retrieval pipelines, one
    ≤2k-row full-outer merge, one constant-size sort — everything
    after the two scans is k-row work at any corpus scale."""
    from week4_musemotion_spark.queries.pipeline_ops import q_doc_search
    from week4_musemotion_spark.queries.staged_r10 import q_bm25_topk

    # unpartitioned windows rank LIMIT-k subtrees — constant-size at
    # any corpus scale (same discipline as q_rank_overlap_rbo)
    wr = Window.orderBy(F.desc("score"), "doc_id")
    a = q_bm25_topk(spark, sf_dir).select(
        "doc_id", F.row_number().over(wr).alias("ra")
    )
    b = q_doc_search(spark, sf_dir).select(
        "doc_id", F.row_number().over(wr).alias("rb")
    )
    u = a.join(b, "doc_id", "full_outer")
    contrib = lambda r: F.coalesce(  # noqa: E731
        int_div_trunc(F.lit(1_000_000_000), F.col(r) + _RRF_C), F.lit(0)
    )
    present = lambda r: F.when(F.col(r).isNotNull(), 1).otherwise(0)  # noqa: E731
    return (
        u.select(
            "doc_id",
            (contrib("ra") + contrib("rb")).cast("long").alias("rrf_e9"),
            (present("ra") + present("rb")).cast("long").alias("n_systems"),
            F.coalesce(F.col("ra"), F.lit(0)).cast("long").alias("rank_bm25"),
            F.coalesce(F.col("rb"), F.lit(0)).cast("long").alias("rank_tfidf"),
        )
        .orderBy(F.desc("rrf_e9"), "doc_id")
        .limit(_RRF_DEPTH)
    )


@query(
    "q_inbatch_collisions",
    covers=("X-INBATCH-COLL",),
    oracle=f"""
    WITH {_jaccard_ctes(JACCARD_THRESHOLD)},
    h AS (
        SELECT doc_id, {stable_hash64_sql("CAST(doc_id AS VARCHAR)")} AS hh
        FROM documents
    ),
    asg AS (
        SELECT doc_id,
               (row_number() OVER (ORDER BY hh, doc_id) - 1) // {_BATCH_SIZE} AS batch
        FROM h
    ),
    pj AS (
        SELECT aa.batch AS ba, ab.batch AS bb
        FROM pairs p
        JOIN asg aa ON p.doc_a = aa.doc_id
        JOIN asg ab ON p.doc_b = ab.doc_id
    ),
    ps AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(coalesce(sum(CASE WHEN ba = bb THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_collisions
        FROM pj
    ),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM asg)
    SELECT n_docs,
           CAST((n_docs + {_BATCH_SIZE} - 1) // {_BATCH_SIZE} AS BIGINT) AS n_batches,
           n_pairs,
           n_collisions,
           CAST(CASE WHEN n_pairs > 0
                     THEN n_collisions * 1000000 // n_pairs ELSE 0 END AS BIGINT)
               AS collision_ppm,
           CAST(((n_docs // {_BATCH_SIZE}) * {_BATCH_SIZE} * ({_BATCH_SIZE} - 1)
                 + (n_docs % {_BATCH_SIZE}) * ((n_docs % {_BATCH_SIZE}) - 1))
                * CAST(1000000 AS HUGEINT)
                // (CAST(n_docs AS HUGEINT) * (n_docs - 1)) AS BIGINT)
               AS expected_ppm
    FROM ns CROSS JOIN ps
    """,
)
def q_inbatch_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive false-negative audit: of the exact n-gram Jaccard
    near-dup pairs, how many land in the SAME {_BATCH_SIZE}-doc
    minibatch under the deterministic shuffle — where an in-batch-
    negatives loss would push apart two documents that are in fact
    the same content.  Reported next to the exact random-permutation
    expectation ``(f·B·(B−1) + r·(r−1)) · 10^6 // (N·(N−1))`` (f full
    batches, r the remainder batch): a healthy hash shuffle sits at
    expectation; sorting by source or time concentrates dup clusters
    and reads far above it.  The batch assignment IS the engine's
    training order (``deterministic_shuffle`` — same hash, same
    tie-break), so the audit measures the real pipeline, not a model
    of it.

    Plan: pairs from banded shingle equi-joins (never corpus²); the
    assignment table is the two-pass global index, pinned once and
    equi-joined to both pair endpoints; everything downstream is two
    1-row aggregates."""
    from week4_musemotion_spark.operators.dedup import jaccard_pairs
    from week4_musemotion_spark.operators.mixing import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents")
    # pinned: the global-index frame feeds BOTH pair endpoints and the
    # n_docs aggregate (self-join rule — never rebuild a shuffle-heavy
    # frame per branch)
    asg = (
        deterministic_shuffle(docs.select("doc_id"), "doc_id")
        .select("doc_id", int_div_trunc(F.col("pos"), F.lit(_BATCH_SIZE)).alias("batch"))
        .localCheckpoint(eager=False)
    )
    pairs = jaccard_pairs(docs, JACCARD_THRESHOLD).select("doc_a", "doc_b")
    pj = pairs.join(
        asg.select(F.col("doc_id").alias("doc_a"), F.col("batch").alias("ba")), "doc_a"
    ).join(
        asg.select(F.col("doc_id").alias("doc_b"), F.col("batch").alias("bb")), "doc_b"
    )
    ps = pj.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("ba") == F.col("bb"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_collisions"),
    )
    ns = asg.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    b = F.lit(_BATCH_SIZE)
    full = int_div_trunc(F.col("n_docs"), b)
    rem = F.col("n_docs") % b
    same_cells = full * b * (_BATCH_SIZE - 1) + rem * (rem - 1)
    return ns.crossJoin(ps).select(
        "n_docs",
        int_div_trunc(F.col("n_docs") + (_BATCH_SIZE - 1), b).alias("n_batches"),
        "n_pairs",
        "n_collisions",
        F.when(
            F.col("n_pairs") > 0,
            int_div_trunc(F.col("n_collisions") * 1_000_000, F.col("n_pairs")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("collision_ppm"),
        int_div_trunc(
            dec(same_cells) * 1_000_000,
            dec(F.col("n_docs")) * (F.col("n_docs") - 1),
        ).alias("expected_ppm"),
    )
