"""Round-21 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: verify-skill rotation
note).

Wave theme: statistical uncertainty & drift TESTING for corpus
metrics.  The engine already reports many point estimates (means,
rates, distances); a curation decision ("did source X degrade?",
"does trimming source Y move the corpus mean?") needs the
uncertainty and the significance around the point estimate.  All
three queries keep the repo's exact-integer discipline — no libm, no
float accumulation — so every number is engine-reproducible to the
last digit:

- q_bootstrap_ci — per-source mean document length with a
  POISSONIZED bootstrap confidence interval (Efron 1979; the
  Poissonization is the standard one-pass streaming form: each doc
  enters replica r with weight ~ Poisson(1), here drawn by inverse
  CDF from a seeded portable hash, so both engines replay the same
  resample).  Replica means are exact e6 integers; CI bounds are
  exact rank selections (ceil ranks) over the replica means.
- q_ks_drift — exact two-sample Kolmogorov–Smirnov statistic of
  each source's doc-length distribution against the REST of the
  corpus: D = max_v |F_src(v) − F_rest(v)| computed over the common
  denominator n_src·n_rest so no float division happens, plus the
  value where the gap peaks (the "where did it drift" answer TV
  distance can't give — KS localizes, TV totals).
- q_loo_influence — delete-one-group jackknife (leave-one-SOURCE-
  out) influence of every source on the corpus mean length: the
  closed form needs only per-source sufficient statistics (one
  scan), and answers "which source is dragging the metric" before
  anyone re-runs a pipeline without it.

Differential evidence: tests/test_staged_r21.py (conftest.staged_diff
at sf0.001; sf0.01/sf0.1 via ``tools/check_correctness.py --staged``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import dec, int_div_trunc
from week4_musemotion_spark.functions.hashing import stable_hash64, stable_hash64_sql
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

# chains staged_r20 -> ... -> r9 registration
import week4_musemotion_spark.queries.staged_r20  # noqa: F401

#: Bootstrap replica count.  64 keeps the hash fan-out trivial (64
#: md5 per row — the HRW-sharding cost times 8) while the ceil-rank
#: 2.5%/97.5% picks land on ranks 2 and 63 of 64.
_R = 64

#: Seed namespace for the bootstrap hash family (9100..9163) — the
#: HRW shard family owns 9000..9007; nothing else uses 4-digit seeds.
_SEED_BASE = 9100

#: floor(CDF_Poisson(1)(k) * 2^60) for k = 0..7, computed once with
#: 60-digit Decimal arithmetic (series e^-1, exact factorials) and
#: FROZEN here as integer literals: both engines compare the 60-bit
#: hash against the same constants, so the resample is a pure
#: function of (doc_id, replica).  Tail mass beyond weight 8 is
#: ~1e-5 and lumps into w=8 — a deliberate, documented truncation
#: (bootstrap validity cares about the first two moments, which an
#: 8-cap at lambda=1 perturbs by < 1e-4).
_POIS_T = (
    424136118829305329,
    848272237658610659,
    1060340297073263324,
    1131029650211480879,
    1148701988496035267,
    1152236456152946145,
    1152825534095764625,
    1152909688087595836,
)


def _pois_w_sql(u: str) -> str:
    """Poisson(1) weight of a 60-bit uniform hash ``u`` by inverse
    CDF — rendered ONCE as portable SQL (Spark ``F.expr`` and DuckDB
    parse the identical string, so the two engines cannot drift)."""
    terms = " + ".join(
        f"(CASE WHEN {u} >= {t} THEN 1 ELSE 0 END)" for t in _POIS_T
    )
    return f"({terms})"


_BOOTSTRAP_ORACLE = f"""
    WITH rep AS (SELECT unnest(range({_R})) AS r),
    w AS (
        SELECT d.source, d.n_chars, rep.r,
               {_pois_w_sql(stable_hash64_sql("CAST(doc_id AS VARCHAR)", seed_expr=f"rep.r + {_SEED_BASE}"))} AS w
        FROM documents d CROSS JOIN rep
    ),
    rp AS (
        SELECT source, r,
               CAST(sum(w) AS BIGINT) AS n_r,
               CAST(sum(CAST(w AS HUGEINT) * n_chars) AS HUGEINT) AS s_r
        FROM w GROUP BY source, r
    ),
    m AS (
        SELECT source, r,
               CAST(s_r * 1000000 // n_r AS BIGINT) AS mean_r_e6
        FROM rp WHERE n_r > 0
    ),
    rk AS (
        SELECT source, mean_r_e6,
               row_number() OVER (PARTITION BY source ORDER BY mean_r_e6, r) AS rn,
               count(*) OVER (PARTITION BY source) AS n_reps
        FROM m
    ),
    ci AS (
        SELECT source,
               CAST(max(n_reps) AS BIGINT) AS n_reps,
               CAST(max(CASE WHEN rn = (25 * n_reps + 999) // 1000
                             THEN mean_r_e6 END) AS BIGINT) AS ci_lo_e6,
               CAST(max(CASE WHEN rn = (975 * n_reps + 999) // 1000
                             THEN mean_r_e6 END) AS BIGINT) AS ci_hi_e6
        FROM rk GROUP BY source
    ),
    pt AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT)
                    * 1000000 // count(*) AS BIGINT) AS mean_e6
        FROM documents GROUP BY source
    )
    SELECT pt.source, pt.n_docs, pt.mean_e6, ci.ci_lo_e6, ci.ci_hi_e6, ci.n_reps
    FROM pt JOIN ci USING (source)
"""


@query("q_bootstrap_ci", covers=("X-BOOTSTRAP-CI",), oracle=_BOOTSTRAP_ORACLE)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean document length with a 95% Poissonized
    bootstrap confidence interval, exact to the e6 digit.

    Each document enters replica r with weight drawn Poisson(1) by
    inverse CDF from ``stable_hash64(doc_id, seed=9100+r)`` — a pure
    function of (doc_id, r), so the resample is identical across
    engines, runs, and partitionings.  Replica means are exact
    integer e6; the CI is the ceil-rank 2.5%/97.5% pair over the
    (at most 64) replica means, tie-broken by replica id.

    100 TB story: the replica fan-out is a row-local explode (64
    seeded md5 expressions inside the scan's codegen — no dimension
    table, no state), and partial aggregation collapses it map-side
    to sources × 64 rows BEFORE the only shuffle, so the network
    cost is independent of corpus size.  The rank selection then
    runs on a sources×64-row frame.  This is the textbook streaming
    bootstrap: the alternative (materialize 64 resampled corpora)
    would be 64 × 100 TB.

    Reference analogue: puts error bars on the KPI means the
    reference dashboard reports as bare points
    (streamlit_app.py:180-190)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    rep = docs.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(_R - 1)))
    )
    u = stable_hash64(
        F.concat(
            (F.col("r") + F.lit(_SEED_BASE)).cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    w = rep.select("source", "n_chars", "r", u.alias("u")).select(
        "source", "n_chars", "r", F.expr(_pois_w_sql("u")).alias("w")
    )
    rp = w.groupBy("source", "r").agg(
        F.sum("w").cast("long").alias("n_r"),
        # widen INSIDE the aggregation: a raw long sum of w*chars
        # wraps past 2^63 while DuckDB promotes to HUGEINT
        F.sum(dec(F.col("w") * F.col("n_chars"))).alias("s_r"),
    )
    m = rp.filter(F.col("n_r") > 0).select(
        "source",
        "r",
        int_div_trunc(F.col("s_r") * 1_000_000, F.col("n_r")).alias("mean_r_e6"),
    )
    part = Window.partitionBy("source")
    rk = m.select(
        "source",
        "mean_r_e6",
        F.row_number()
        .over(part.orderBy("mean_r_e6", "r"))
        .alias("rn"),
        F.count(F.lit(1)).over(part).alias("n_reps"),
    )
    # ceil(q·n_reps) ranks in pure integer arithmetic (`div`, not
    # float `/` + floor — the quotient is never closer than 1/1000 to
    # an integer, but the integer form makes that a non-question)
    ci = rk.groupBy("source").agg(
        F.max("n_reps").cast("long").alias("n_reps"),
        F.max(
            F.when(
                F.expr("rn = (25 * n_reps + 999) div 1000"), F.col("mean_r_e6")
            )
        )
        .cast("long")
        .alias("ci_lo_e6"),
        F.max(
            F.when(
                F.expr("rn = (975 * n_reps + 999) div 1000"), F.col("mean_r_e6")
            )
        )
        .cast("long")
        .alias("ci_hi_e6"),
    )
    pt = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        int_div_trunc(
            F.sum(dec(F.col("n_chars"))) * 1_000_000, F.count(F.lit(1))
        ).alias("mean_e6"),
    )
    return pt.join(ci, "source").select(
        "source", "n_docs", "mean_e6", "ci_lo_e6", "ci_hi_e6", "n_reps"
    )


_KS_ORACLE = """
    WITH c AS (
        SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2
    ),
    n AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_s FROM c GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
    cv AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt_all FROM c GROUP BY 1),
    cva AS (
        SELECT v, CAST(sum(cnt_all) OVER (ORDER BY v) AS BIGINT) AS cum_all
        FROM cv
    ),
    g AS (SELECT n.source, n.n_s, cva.v, cva.cum_all FROM n CROSS JOIN cva),
    cum AS (
        SELECT g.source, g.n_s, g.v, g.cum_all,
               CAST(sum(COALESCE(c.cnt, 0))
                    OVER (PARTITION BY g.source ORDER BY g.v) AS BIGINT) AS cum_s
        FROM g LEFT JOIN c ON c.source = g.source AND c.v = g.v
    ),
    d AS (
        SELECT cum.source, cum.n_s, t.n - cum.n_s AS n_rest, cum.v,
               abs(CAST(cum.cum_s AS HUGEINT) * (t.n - cum.n_s)
                   - CAST(cum.cum_all - cum.cum_s AS HUGEINT) * cum.n_s) AS d_num
        FROM cum CROSS JOIN tot t
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY source
                                     ORDER BY d_num DESC, v ASC) AS rn
        FROM d WHERE n_rest > 0
    )
    SELECT source, n_s, CAST(n_rest AS BIGINT) AS n_rest,
           CAST(d_num * 1000000 // (CAST(n_s AS HUGEINT) * n_rest) AS BIGINT) AS ks_e6,
           CAST(v AS BIGINT) AS ks_at_value
    FROM r WHERE rn = 1
"""


@query("q_ks_drift", covers=("X-KS-DRIFT",), oracle=_KS_ORACLE)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift test of each
    source's doc-length distribution against the rest of the corpus:
    D = max_v |F_src(v) − F_rest(v)| over the common denominator
    n_src·n_rest (never a float CDF), reported in e6 with the value
    where the gap peaks (tie → smallest value).  KS LOCALIZES drift
    where ``q_tv_distance_sources`` totals it: a source whose pages
    suddenly truncate shows a sharp KS peak at the truncation
    length, which a TV scalar hides.  The classic D·sqrt(n) critical
    values apply directly to ks_e6/1e6.

    100 TB story: state never touches corpus size — one (source,
    value)-keyed count aggregate (map-side combined), then all
    window work runs on the (distinct lengths × sources) grid, with
    the per-source cumulative sums partitioned BY SOURCE (each
    partition is values-bounded).  The one intentionally-serial
    piece, the corpus-wide cumulative over distinct values, is a
    values-bounded frame (~1e5 rows even at 100 TB for a length
    metric), not a data pass.

    Reference analogue: the monitoring layer the reference lacks
    entirely — its ETL re-ingests blind (pipeline.py re-runs drop
    the previous corpus on the floor)."""
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)  # feeds totals, the grid, and the probe join
    )
    n = c.groupBy("source").agg(F.sum("cnt").cast("long").alias("n_s"))
    tot = n.agg(F.sum("n_s").cast("long").alias("n"))
    cv = c.groupBy("v").agg(F.sum("cnt").cast("long").alias("cnt_all"))
    cva = cv.select(
        "v",
        F.sum("cnt_all")
        .over(
            Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("cum_all"),
    )
    g = n.crossJoin(F.broadcast(cva))
    cum = (
        g.join(
            c.select("source", "v", "cnt"),
            ["source", "v"],
            "left",
        )
        .select(
            "source",
            "n_s",
            "v",
            "cum_all",
            F.sum(F.coalesce(F.col("cnt"), F.lit(0)))
            .over(
                Window.partitionBy("source")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("long")
            .alias("cum_s"),
        )
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        (F.col("n") - F.col("n_s")).alias("n_rest"),
        "v",
        F.abs(
            dec(F.col("cum_s")) * (F.col("n") - F.col("n_s"))
            - dec(F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
        ).alias("d_num"),
    )
    r = d.filter(F.col("n_rest") > 0).select(
        "*",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.col("d_num").desc(), F.col("v").asc()))
        .alias("rn"),
    )
    return r.filter(F.col("rn") == 1).select(
        "source",
        "n_s",
        F.col("n_rest").cast("long").alias("n_rest"),
        int_div_trunc(
            F.col("d_num") * 1_000_000, dec(F.col("n_s")) * F.col("n_rest")
        ).alias("ks_e6"),
        F.col("v").cast("long").alias("ks_at_value"),
    )


_LOO_ORACLE = """
    WITH s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s_chars
        FROM documents GROUP BY source
    ),
    g AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
                 CAST(sum(s_chars) AS HUGEINT) AS s FROM s)
    SELECT s.source, s.n_docs,
           CAST(CAST(s.n_docs AS HUGEINT) * 1000000 // g.n AS BIGINT) AS share_ppm,
           CAST(s.s_chars * 1000000 // s.n_docs AS BIGINT) AS mean_e6,
           CAST(g.s * 1000000 // g.n AS BIGINT) AS global_mean_e6,
           CAST((g.s - s.s_chars) * 1000000 // (g.n - s.n_docs) AS BIGINT) AS loo_mean_e6,
           CAST((g.s - s.s_chars) * 1000000 // (g.n - s.n_docs)
                - g.s * 1000000 // g.n AS BIGINT) AS influence_e6
    FROM s CROSS JOIN g
    WHERE g.n - s.n_docs > 0
"""


@query("q_loo_influence", covers=("X-LOO-INFLUENCE",), oracle=_LOO_ORACLE)
def q_loo_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife: each source's influence on the
    corpus mean document length, as the signed e6 shift the mean
    takes when that source is REMOVED (loo_mean − global_mean).
    Positive influence = the source drags the mean down (removing it
    raises the metric) — the one-scan answer to "which crawl is
    hurting the aggregate", ahead of any re-run.  share_ppm rides
    along so a large influence from a tiny source (outlier docs) is
    distinguishable from a large influence via sheer mass.

    100 TB story: the closed form needs only per-source sufficient
    statistics (count, widened sum) — one map-side-combined
    aggregate pass; the global totals are re-aggregated from the
    |sources|-row frame, never a second scan; everything after is
    arithmetic on |sources| rows.  This is the whole point of
    delete-GROUP jackknife over the bootstrap: zero fan-out.

    Reference analogue: same monitoring gap as q_ks_drift — the
    reference has no per-source accounting at all (its loader keys
    nothing by provenance, load_musemotion_to_db.py:91-143)."""
    docs = load_table(spark, sf_dir, "documents")
    s = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(dec(F.col("n_chars"))).alias("s_chars"),
        )
        .localCheckpoint(eager=False)  # feeds the global re-agg AND the output
    )
    g = s.agg(
        F.sum("n_docs").cast("long").alias("n"),
        F.sum("s_chars").cast("decimal(38,0)").alias("s"),
    )
    out = s.crossJoin(F.broadcast(g)).filter(F.col("n") - F.col("n_docs") > 0)
    global_mean = int_div_trunc(F.col("s") * 1_000_000, F.col("n"))
    loo_mean = int_div_trunc(
        (F.col("s") - F.col("s_chars")) * 1_000_000, F.col("n") - F.col("n_docs")
    )
    return out.select(
        "source",
        "n_docs",
        int_div_trunc(dec(F.col("n_docs")) * 1_000_000, F.col("n")).alias("share_ppm"),
        int_div_trunc(F.col("s_chars") * 1_000_000, F.col("n_docs")).alias("mean_e6"),
        global_mean.alias("global_mean_e6"),
        loo_mean.alias("loo_mean_e6"),
        (loo_mean - global_mean).cast("long").alias("influence_e6"),
    )
