"""Round-15 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: verify-skill rotation
note).

Wave seed: deterministic corpus sharding.

- q_shard_rendezvous — rendezvous (highest-random-weight) sharding
  of the document corpus (Thaler & Ravishankar 1998): every doc goes
  to the shard whose seeded portable hash of the doc id is highest,
  so assignment needs NO coordination state and — the property that
  matters when re-sharding a 100 TB corpus across workers — removing
  a shard moves ONLY that shard's documents (verified in-engine with
  an assert, re-derived row-for-row by the oracle).  Distinct from
  ``q_shard_skew_audit``, which audits the balance of an EXISTING
  (source, lang) partition layout; this query decides placement.

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
    """The (hash, s) struct array for all _N_SHARDS seeds — computed
    ONCE per row and materialized as a column, so the S=8 and S=7
    picks read the SAME md5 evaluations (two independent pick
    expressions would hash 2S-1 times per row and lean on Catalyst
    subexpression elimination to dedupe).  array_max over the structs
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
    d = docs.select("doc_id", "n_chars", _hrw_structs().alias("hs")).select(
        "doc_id",
        "n_chars",
        F.array_max(F.col("hs"))["s"].alias("shard8"),
        F.array_max(F.slice(F.col("hs"), 1, last))["s"].alias("shard7"),
    )
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
