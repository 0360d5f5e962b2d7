"""Round-19 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: verify-skill rotation
note).

Wave theme: data SELECTION under the value oracle, plus the CSV
dead-letter twin.  The round-11 verdict named all three as r19
staging candidates; the operators shipped pytest-green in round 11.

- q_coreset_report — greedy k-center coreset selection
  (``operators/coreset.k_center_select``) followed by the assignment
  join (``assign_to_centers``): one row per selected center with its
  selection round, coverage radius², assigned cluster size, and the
  realized max assigned distance.  The oracle UNROLLS the k−1 greedy
  rounds as chained CTEs in DuckDB (exact HUGEINT distances, min-id
  seed, max-distance-then-min-id picks — the operator's determinism
  contract makes the unroll exact, not approximate).  This is the
  weekly "did my selection budget cover the space" report a curation
  user runs.

- q_embed_dispersion — per-label embedding-dispersion collapse audit
  (``operators/linalg.embedding_dispersion``): the exact sum of
  squared pairwise distances from the closed form
  n·Σ‖q‖² − Σ_d(Σq_d)², one scan + O(groups×dims) state where the
  naive form is O(n²) pairs.  A group whose msd is near zero is
  embedding-collapsed (degenerate encoder output).

- q_csv_quarantine_split — the CSV twin of ``q_quarantine_split``
  (staged_r18): a headerless-CSV ingest (the reference's S1 shape)
  with deterministically PLANTED wrong-shape lines (extra fields)
  pushed through ``read_csv_quarantined`` + ``quarantine_to``; the
  clean lane aggregates per lang and the dead-letter count is read
  back from the quarantine parquet.  Reference contrast: the
  reference's pandas CSV load dies on the first malformed line
  (``pipeline.py:139``).

Differential evidence: tests/test_staged_r19.py (conftest.staged_diff
at sf0.001; sf0.01/sf0.1 via ``tools/check_correctness.py --staged``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

# chains staged_r18 -> ... -> r9 registration
import week4_musemotion_spark.queries.staged_r18  # noqa: F401

#: Selection budget for the coreset report — fixed so the oracle's
#: unrolled round count matches the Spark loop exactly.
_CORESET_K = 6

#: Modulus/residue picking which documents carry a planted
#: wrong-shape CSV line (distinct from the JSONL twin's 50/7).
_C_MOD, _C_RESIDUE = 50, 23


def _coreset_sql(k: int) -> str:
    """Unrolled greedy k-center in DuckDB: each round r is three
    CTEs — d{r} (exact HUGEINT squared distance of every point to
    the PREVIOUS pick), m{r} (running min distance to the selected
    set), p{r} (the argmax pick, ties to min id) — followed by the
    assignment of every point to its nearest selected center.
    Positional list access goes through the idx-CTE gram pattern
    (DuckDB has no ``unnest ... WITH ORDINALITY``)."""
    dist = (
        "sum(CAST(q.qv[i.pos] - c.qv[i.pos] AS HUGEINT)"
        " * (q.qv[i.pos] - c.qv[i.pos]))"
    )
    parts = [
        # MATERIALIZED: the round CTEs chain (p_r -> m_r -> d_r ->
        # m_{r-1} -> ...), and DuckDB's default inlining re-evaluates
        # the whole prefix per reference — measured 13s vs ~1s at
        # sf0.1 for the oracle without the hints
        "WITH q AS MATERIALIZED (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv"
        " FROM embeddings)",
        "idx AS (SELECT unnest(range(1,"
        " (SELECT max(len(qv)) FROM q) + 1)) AS pos)",
        "c0 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1)",
    ]
    for r in range(1, k):
        prev_center = "c0" if r == 1 else f"c{r - 1}"
        chosen = " UNION ALL ".join(
            f"SELECT vec_id FROM {'c0' if j == 0 else f'p{j}'}" for j in range(r)
        )
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT q.vec_id, {dist} AS d FROM q"
            f" CROSS JOIN idx i CROSS JOIN {prev_center} c GROUP BY q.vec_id)"
        )
        if r == 1:
            parts.append("m1 AS MATERIALIZED (SELECT vec_id, d AS mind FROM d1)")
        else:
            parts.append(
                f"m{r} AS MATERIALIZED (SELECT m.vec_id, least(m.mind, d.d) AS mind"
                f" FROM m{r - 1} m JOIN d{r} d USING (vec_id))"
            )
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT vec_id, mind FROM m{r}"
            f" WHERE vec_id NOT IN ({chosen})"
            " ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        parts.append(f"c{r} AS MATERIALIZED (SELECT q.vec_id, q.qv FROM q JOIN p{r} USING (vec_id))")
    cents = " UNION ALL ".join(
        f"SELECT {r} AS rnd, vec_id, qv FROM c{r}" for r in range(k)
    )
    sel = " UNION ALL ".join(
        ["SELECT 0 AS rnd, vec_id, CAST(NULL AS BIGINT) AS radius FROM c0"]
        + [
            f"SELECT {r} AS rnd, vec_id, CAST(mind AS BIGINT) AS radius FROM p{r}"
            for r in range(1, k)
        ]
    )
    parts.append(f"cents AS ({cents})")
    parts.append(f"sel AS ({sel})")
    parts.append(
        f"ad AS (SELECT q.vec_id, c.vec_id AS cid, {dist} AS d"
        " FROM q CROSS JOIN idx i CROSS JOIN cents c GROUP BY q.vec_id, c.vec_id)"
    )
    parts.append(
        "best AS (SELECT vec_id, cid, d, row_number() OVER"
        " (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rk FROM ad)"
    )
    parts.append(
        "asg AS (SELECT cid, CAST(count(*) AS BIGINT) AS assigned_n,"
        " CAST(max(d) AS BIGINT) AS max_assigned FROM best WHERE rk = 1"
        " GROUP BY cid)"
    )
    return (
        ",\n".join(parts)
        + "\nSELECT CAST(s.rnd AS BIGINT) AS round, s.vec_id AS center_id,"
        " s.radius AS radius_num, a.assigned_n, a.max_assigned"
        " FROM sel s JOIN asg a ON a.cid = s.vec_id"
    )


@query(
    "q_coreset_report",
    covers=("X-CORESET",),
    oracle=_coreset_sql(_CORESET_K),
)
def q_coreset_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreset coverage/budget report: greedy k-center selection over
    the embeddings table (min-id seed, exact integer squared
    distances, argmax ties to min id — k bounded distributed rounds,
    each ONE pass against a single broadcast center), then every row
    assigned to its nearest selected center (one broadcast join, the
    corpus never shuffles).  One row per center: selection round,
    coverage radius² at selection time (non-increasing), assigned
    cluster size, and realized max assigned distance — the numbers a
    curation user reads to decide whether the selection budget k
    covers the embedding space.

    100 TB story: the driver loop is bounded by the selection budget
    (k picks), each round is one distributed scan with O(1) driver
    traffic, and the assignment is a k-row broadcast — nothing O(n)
    leaves the executors.  Distances fit long here by construction
    (≤ dims·(2e6)² ≈ 2.6e14 for unit-range 64-dim embeddings); the
    internal accumulation is decimal(38,0) regardless, so a wider
    embedding scale cannot wrap (round-12 dec-before-square fix).

    Reference parity: the reference has no selection surface at all —
    this extends the engine's training-data-pipeline layer
    (SURVEY.md §2 extension operators)."""
    from week4_musemotion_spark.operators.coreset import (
        assign_to_centers,
        k_center_select,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    sel = k_center_select(emb, _CORESET_K)
    chosen = [s["id"] for s in sel]
    centers = emb.filter(F.col("vec_id").isin(chosen)).select(
        F.col("vec_id").alias("center_id"), "embedding"
    )
    per_center = (
        assign_to_centers(emb, centers)
        .groupBy("center_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("assigned_n"),
            F.max(F.col("dist2_num").cast("decimal(38,0)"))
            .cast("long")
            .alias("max_assigned"),
        )
    )
    sel_df = spark.createDataFrame(
        [(s["round"], s["id"], s["radius_num"]) for s in sel],
        "round long, center_id long, radius_num long",
    )
    return F.broadcast(sel_df).join(per_center, "center_id").select(
        "round", "center_id", "radius_num", "assigned_n", "max_assigned"
    )


@query(
    "q_embed_dispersion",
    covers=("X-DISPERSION",),
    oracle="""
    WITH q AS (
        SELECT label,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
        FROM embeddings
    ),
    idx AS (SELECT unnest(range(1, (SELECT max(len(qv)) FROM q) + 1)) AS pos),
    per_dim AS (
        SELECT label, i.pos,
               sum(CAST(q.qv[i.pos] AS HUGEINT)) AS sd,
               sum(CAST(q.qv[i.pos] AS HUGEINT) * q.qv[i.pos]) AS s2p,
               count(*) AS np
        FROM q CROSS JOIN idx i GROUP BY label, i.pos
    ),
    g AS (
        SELECT label, sum(s2p) AS s2, sum(sd * sd) AS sumsq_d, max(np) AS n
        FROM per_dim GROUP BY label
    )
    SELECT label,
           CAST(n AS BIGINT) AS n,
           CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS VARCHAR) AS pairs,
           CAST(CAST(n AS HUGEINT) * s2 - sumsq_d AS VARCHAR) AS ssd,
           CAST(CASE WHEN n > 1 THEN (CAST(n AS HUGEINT) * s2 - sumsq_d)
                     // (CAST(n AS HUGEINT) * (n - 1) // 2 * 1000000)
                END AS BIGINT) AS msd_e6
    FROM g
    """,
)
def q_embed_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-dispersion collapse audit: the exact sum
    of squared pairwise distances per group from the closed form
    n·Σ‖q‖² − Σ_d(Σq_d)² — ONE scan + two aggregates whose state is
    O(groups × dims), where the naive formulation is O(n²) pairs per
    group.  ``pairs`` and ``ssd`` are exact integers emitted as digit
    strings (both outgrow int64 at corpus scale); ``msd_e6`` is the
    mean squared distance a drift dashboard trends — a group near
    zero is embedding-collapsed (all-duplicate or degenerate encoder
    output).

    100 TB story: sufficient statistics, never pairs — the group
    state is ~dims rows of decimal accumulators, merge is addition,
    and the arithmetic is exact at 1e12 rows (decimal(38,0)
    accumulation, dec-before-product throughout — the round-12
    denominator fix keeps msd exact past 4.3M-row groups)."""
    from week4_musemotion_spark.operators.linalg import embedding_dispersion

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dispersion(emb, vec_col="embedding", group_col="label")


def _csv_quarantine_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Cached headerless-CSV ingest fixture with planted wrong-shape
    lines, plus the dead-letter parquet ``quarantine_to`` landed.

    Every document becomes one CSV line ``doc_id,lang,n_chars``;
    documents with ``doc_id % MOD == RESIDUE`` get two EXTRA fields
    appended (wrong shape — PERMISSIVE cannot place them, so the
    line quarantines; a wrong-TYPED field would merely null-cast).
    The sink count is asserted against the planted count in the
    build, so a lost or double-counted dead letter kills the fixture
    loudly."""
    import os

    from week4_musemotion_spark.queries.pipeline_ops import cached_fixture
    from week4_musemotion_spark.sources.quarantine import (
        quarantine_to,
        read_csv_quarantined,
    )

    def _build(tmp: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        bad = F.pmod(F.col("doc_id"), F.lit(_C_MOD)) == _C_RESIDUE
        line = F.concat_ws(",", F.col("doc_id"), F.col("lang"), F.col("n_chars"))
        lines = docs.select(
            F.when(bad, F.concat(line, F.lit(",4,4")))
            .otherwise(line)
            .alias("value")
        )
        lines.repartition(4).write.text(os.path.join(tmp, "lines"))
        _, q = read_csv_quarantined(
            spark,
            os.path.join(tmp, "lines"),
            "doc_id bigint, lang string, n_chars bigint",
        )
        landed = quarantine_to(q, os.path.join(tmp, "dead_letter"))
        planted = docs.filter(bad).count()
        if landed != planted:
            raise AssertionError(
                f"csv quarantine fixture drift: sink landed {landed}, planted {planted}"
            )
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    return cached_fixture(
        "musemotion_csv_quarantine",
        sf_dir,
        f"csv_quarantine:{_C_MOD}:{_C_RESIDUE}".encode(),
        _build,
        table="documents",
    )


@query(
    "q_csv_quarantine_split",
    covers=("X-QUARANTINE-CSV",),
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_clean,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           (SELECT CAST(count(*) AS BIGINT) FROM documents
             WHERE doc_id % {_C_MOD} = {_C_RESIDUE}) AS n_bad
    FROM documents WHERE doc_id % {_C_MOD} <> {_C_RESIDUE}
    GROUP BY lang
    """,
)
def q_csv_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CSV twin of ``q_quarantine_split``: a headerless-CSV
    ingest (the reference's S1 shape) with planted wrong-shape lines
    re-split by ``read_csv_quarantined`` (one text scan; the parse
    runs in the projection), the CLEAN lane aggregated per lang, and
    ``n_bad`` read back from the dead-letter parquet the single-pass
    ``quarantine_to`` sink landed.  The oracle recomputes both from
    the raw table with the same modular rule, so the hash certifies
    the wrong-SHAPE vs wrong-TYPE boundary (extra separators
    quarantine; a bad field value would only null-cast), zero row
    loss across the split, and the observe-riding sink count.

    100 TB story: identical to the JSONL twin — one text scan feeds
    both lanes, and the dead letter carries raw line + source file,
    everything a replay needs.  The reference's pandas CSV load dies
    on the first malformed line instead (``pipeline.py:139``)."""
    import os

    from week4_musemotion_spark.sources.quarantine import read_csv_quarantined

    fixture = _csv_quarantine_fixture(spark, sf_dir)
    clean, _ = read_csv_quarantined(
        spark,
        os.path.join(fixture, "lines"),
        "doc_id bigint, lang string, n_chars bigint",
    )
    n_bad = spark.read.parquet(os.path.join(fixture, "dead_letter")).agg(
        F.count(F.lit(1)).cast("long").alias("n_bad")
    )
    return (
        clean.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clean"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
        .crossJoin(F.broadcast(n_bad))
    )
