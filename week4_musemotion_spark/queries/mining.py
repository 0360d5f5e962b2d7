"""Round-3 mining battery: entity resolution at higher edit radius,
event-sequence statistics, exact robust/outlier analytics, and
inequality metrics — all with the engine's exact-integer doctrine
(functions/exact.py) so every oracle hash-matches bit-for-bit.

Reference parity: /root/reference stops at single-join group-bys;
these generalize its KPI/cleaning capabilities (streamlit_app.py
:166-190, pipeline.py:100-120) to the sequence / distribution /
entity-resolution shapes a 100 TB curation pipeline needs.

Scale notes (100 TB):

- every query here is (window-per-key | keyed join | grouped agg)
  shaped — no cross joins, no driver collects, no Python UDFs;
- the fuzzy τ=2 join emits ~len²/2 constant-width hashed keys per
  row (linear blocking stage) and verifies candidates only;
- the z-score filter joins a 5-row moment table (broadcast) against
  the fact scan — the moment pass and the filter pass are the only
  two scans, and both prune to (event_type, value, event_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import (
    avg_money,
    avg_money_sql,
    cents,
    cents_sql,
    int_div_round,
    int_div_round_sql,
)
from week4_musemotion_spark.functions.eventtime import epoch_micros
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Entity resolution: fuzzy join at edit distance ≤ 2
# ---------------------------------------------------------------------------


@query(
    "q_fuzzy_join_tau2",
    covers=("X-FUZZY-JOIN-2",),
    oracle="""
    WITH dirty AS (
        SELECT c_custkey + 2000000 AS dirty_id,
               substr(d1, 1, (c_custkey % 13 + 1) - 1)
               || CASE WHEN (c_custkey % 13 + 1) <= length(d1) THEN 'x' ELSE '' END
               || substr(d1, (c_custkey % 13 + 1) + 1) AS dirty_name
        FROM (
            SELECT c_custkey,
                   substr(c_name, 1, (c_custkey % 17 + 1) - 1)
                   || substr(c_name, (c_custkey % 17 + 1) + 1) AS d1
            FROM customer WHERE c_custkey % 4 = 1
        )
    )
    SELECT d.dirty_id, c.c_custkey AS match_id,
           CAST(levenshtein(d.dirty_name, c.c_name) AS BIGINT) AS dist
    FROM dirty d JOIN customer c ON levenshtein(d.dirty_name, c.c_name) <= 2
    """,
)
def q_fuzzy_join_tau2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution at edit radius 2: every fourth customer name
    suffers one deletion AND one substitution (positions keyed on the
    id — deterministic in both engines) and is re-matched within
    edit distance 2 via the depth-2 deletion-neighborhood join
    (operators/fuzzy.py — FastSS recall is exact, candidates verified
    with levenshtein).  The oracle is the quadratic cross-compare —
    identical output because blocking recall is exact."""
    from week4_musemotion_spark.operators.fuzzy import fuzzy_join

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    d1 = F.concat(
        F.expr("substring(c_name, 1, pmod(c_custkey, 17) + 1 - 1)"),
        F.expr("substring(c_name, pmod(c_custkey, 17) + 1 + 1, length(c_name))"),
    )
    dirty = (
        c.filter(F.col("c_custkey") % 4 == 1)
        .withColumn("_d1", d1)
        .select(
            (F.col("c_custkey") + 2_000_000).alias("dirty_id"),
            F.concat(
                F.expr("substring(_d1, 1, pmod(c_custkey, 13) + 1 - 1)"),
                F.when(
                    F.expr("pmod(c_custkey, 13) + 1") <= F.length("_d1"), F.lit("x")
                ).otherwise(F.lit("")),
                F.expr("substring(_d1, pmod(c_custkey, 13) + 1 + 1, length(_d1))"),
            ).alias("dirty_name"),
        )
    )
    return fuzzy_join(
        c, dirty, "c_name", "dirty_name", k=2, dedup_on=["dirty_id", "c_custkey"]
    ).select(
        "dirty_id",
        F.col("c_custkey").alias("match_id"),
        F.col("dist").cast("long").alias("dist"),
    )


# ---------------------------------------------------------------------------
# Event-sequence statistics
# ---------------------------------------------------------------------------


@query(
    "q_markov_transitions",
    covers=("X-MARKOV",),
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    t AS (
        SELECT prev_type, event_type AS next_type, count(*) AS cnt
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, CAST(cnt AS BIGINT) AS cnt,
           {int_div_round_sql("cnt * 10000", "sum(cnt) OVER (PARTITION BY prev_type)")}
               AS prob_e4
    FROM t
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event streams:
    per-user LAG over (ts, event_id), pair counts, and the transition
    probability as exact e4 integer division against the per-prev-type
    row total.  Scale: one shuffle on user_id for the sequence window,
    one 25-row aggregate, one 5-partition window — the classic
    clickstream shape.  Ref capability: event-type group counts
    (streamlit_app.py:180-190) upgraded to sequential structure."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    seq = ev.withColumn(
        "prev_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        F.col("cnt").cast("long").alias("cnt"),
        int_div_round(F.col("cnt") * 10000, F.sum("cnt").over(tot)).alias("prob_e4"),
    )


@query(
    "q_time_weighted_avg",
    covers=("X-TWA",),
    oracle=f"""
    WITH iv AS (
        SELECT user_id,
               {cents_sql("value")} AS v_cents,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                - epoch_us(ts)) // 1000000 AS dt_sec
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dt_sec) AS BIGINT) AS total_sec,
           {int_div_round_sql("sum(v_cents * dt_sec)", "sum(dt_sec)")} AS twa_cents
    FROM iv WHERE dt_sec IS NOT NULL AND dt_sec > 0
    GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average event value per user: each reading holds
    until the next one (LEAD over the per-user timeline), weights are
    whole elapsed seconds, and the weighted mean is exact integer
    division in cents.  All accumulation is BIGINT (max |Σ v·dt| here
    ~1e13; a 100 TB deployment would widen the sum to decimal(38,0)
    exactly as stddev_money does).  Event-time math goes through
    functions/eventtime.epoch_micros so NANOS/MICROS testdata layouts
    agree.  Ref capability: per-group mean KPIs (pipeline.py:115-118)
    upgraded to irregular time series."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_micros(ev, "ts")
    nxt = F.lead(us).over(w)
    iv = ev.select(
        "user_id",
        cents("value").alias("v_cents"),
        F.floor((nxt - us) / F.lit(1_000_000)).cast("long").alias("dt_sec"),
    ).filter(F.col("dt_sec").isNotNull() & (F.col("dt_sec") > 0))
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_sec").cast("long").alias("total_sec"),
        int_div_round(F.sum(F.col("v_cents") * F.col("dt_sec")), F.sum("dt_sec")).alias(
            "twa_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Exact outlier / distribution analytics
# ---------------------------------------------------------------------------


@query(
    "q_zscore_outliers",
    covers=("X-ZSCORE",),
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               count(*) AS n,
               sum(CAST({cents_sql("value")} AS HUGEINT)) AS s1,
               sum(CAST({cents_sql("value")} AS HUGEINT) * {cents_sql("value")}) AS s2
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           {cents_sql("e.value")} AS value_cents,
           CASE WHEN CAST({cents_sql("e.value")} AS HUGEINT) * m.n - m.s1 > 0
                THEN 'hi' ELSE 'lo' END AS side
    FROM events e JOIN m ON e.event_type = m.event_type
    WHERE (CAST({cents_sql("e.value")} AS HUGEINT) * m.n - m.s1)
          * (CAST({cents_sql("e.value")} AS HUGEINT) * m.n - m.s1)
          * (m.n - 1)
          > 4 * m.n * (m.n * m.s2 - m.s1 * m.s1)
    """,
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value sits more than 2 sample standard deviations
    from the per-type mean — decided in EXACT integer arithmetic:
    |v−μ| > 2σ ⟺ (v·n − s1)²·(n−1) > 4·n·(n·s2 − s1²) with
    decimal(38,0)/HUGEINT moments, so partition order and float sqrt
    can never flip a boundary row (the failure class functions/
    exact.py documents).  Scale: one grouped-moment pass (5 rows),
    broadcast back over the fact scan — two scans total, no sort.
    Ref capability: the cleaning stage's outlier screens
    (pipeline.py:108-110) made statistically principled."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    vc = cents("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(vc)).alias("s1"),
        F.sum(d(vc) * vc).alias("s2"),
    )
    j = ev.join(F.broadcast(m), "event_type")
    dev = d(vc) * F.col("n") - F.col("s1")
    return (
        j.filter(dev * dev * (F.col("n") - 1) > 4 * F.col("n") * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")))
        .select(
            "event_id",
            "event_type",
            vc.alias("value_cents"),
            F.when(dev > 0, F.lit("hi")).otherwise(F.lit("lo")).alias("side"),
        )
    )


@query(
    "q_decile_stats",
    covers=("X-DECILE",),
    oracle=f"""
    WITH d AS (
        SELECT c_acctbal,
               ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n,
           min({cents_sql("c_acctbal")}) AS min_cents,
           max({cents_sql("c_acctbal")}) AS max_cents,
           {avg_money_sql("c_acctbal")} AS avg_cents
    FROM d GROUP BY decile ORDER BY decile
    """,
)
def q_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance deciles: NTILE(10) over a total deterministic
    order (balance, custkey tie-break) then per-decile count/min/max/
    exact-integer average.  Scale: a global NTILE needs a total sort —
    at 100 TB this becomes a range-partitioned sort (Spark's sort-
    based shuffle handles it; AQE balances the ranges), and the
    per-decile agg is 10 rows.  Ref capability: the dashboard's
    group-size profile (streamlit_app.py:183) as ranked strata."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    d = c.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("c_acctbal", "c_custkey"))
    )
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(cents("c_acctbal")).alias("min_cents"),
            F.max(cents("c_acctbal")).alias("max_cents"),
            avg_money("c_acctbal").alias("avg_cents"),
        )
        .orderBy("decile")
    )


@query(
    "q_gini_by_source",
    covers=("X-GINI",),
    oracle=f"""
    WITH r AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS i,
               count(*) OVER (PARTITION BY source) AS n,
               sum(n_chars) OVER (PARTITION BY source) AS tot
        FROM documents
    )
    SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
           CAST(max(tot) AS BIGINT) AS total_chars,
           {int_div_round_sql("sum((2 * i - n - 1) * n_chars) * 10000", "max(n) * max(tot)")}
               AS gini_e4
    FROM r GROUP BY source
    """,
)
def q_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document-length inequality per source, via
    the sorted-rank formula G = Σ(2i−n−1)·xᵢ / (n·Σx) in pure integer
    arithmetic (ties contribute a permutation-invariant sum, so the
    doc_id tie-break cannot change the value — only make the rank
    deterministic).  Corpus-audit operator: a source whose G spikes
    is emitting degenerate boilerplate or truncation.  Scale: one
    window + one agg, both keyed on source."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source")
    r = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w.orderBy("n_chars", "doc_id")).alias("i"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("n_chars").over(w).alias("tot"),
    )
    agg = r.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.max("tot").cast("long").alias("total_chars"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("n_chars")).alias("_num"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_chars",
        int_div_round(F.col("_num") * 10000, F.col("n_docs") * F.col("total_chars")).alias(
            "gini_e4"
        ),
    )
