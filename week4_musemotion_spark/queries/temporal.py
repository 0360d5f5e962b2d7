"""Temporal / window operators: analytic window battery,
gap-based sessionization, as-of join, and range (interval) join —
operators Spark lacks as primitives (as-of/range) implemented as
compositions of builtin ops, with independent DuckDB oracles (DuckDB
has native ASOF JOIN, so the oracle is a genuinely different
implementation).

All event-time math is integer microseconds: Spark reads ts as an
epoch-ns BIGINT and derives ``ts div 1000``; DuckDB coerces the
parquet TIMESTAMP(NANOS) to µs TIMESTAMP (truncating), so
``epoch_us(ts)`` lands on exactly the same integers — comparisons,
window orders, and spans agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

NS_PER_MIN = 60 * 1_000_000_000
#: All cross-engine temporal comparisons happen at MICROsecond
#: resolution: DuckDB coerces the parquet TIMESTAMP(NANOS) to µs
#: (truncating), so Spark derives tsn = ts div 1000 to match exactly.
US_PER_MIN = 60 * 1_000_000


@query(
    "q_window_funcs",
    covers=("X-WINDOW",),
    oracle="""
    SELECT user_id, event_id,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           lag(event_id) OVER w AS prev_event_id,
           lead(event_id) OVER w AS next_event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window battery per user ordered by event time:
    row_number, lag, lead, running sum.  One shuffle on the partition
    key; running sums accumulate in window order (deterministic)."""
    e = load_table(spark, sf_dir, "events").withColumn("tsu", F.expr("ts div 1000"))
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias(
            "running_value"
        ),
    )


@query(
    "q_sessionize",
    covers=("X-SESSION",),
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsn,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                        > {30 * US_PER_MIN}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, event_id, tsn,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           CAST(max(tsn) - min(tsn) AS BIGINT) AS span_us
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): flag session
    starts with lag(), number sessions with a running sum, aggregate
    per session — the batch form of stateful streaming sessionization,
    in two window passes over one user-keyed shuffle."""
    e = load_table(spark, sf_dir, "events").withColumn("tsn", F.expr("ts div 1000"))
    w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "tsn",
        F.when(F.col("tsn") - F.lag("tsn").over(w) > 30 * US_PER_MIN, 1).otherwise(0).alias("new_session"),
    )
    w2 = Window.partitionBy("user_id").orderBy("tsn", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = flagged.withColumn("session_seq", F.sum("new_session").over(w2).cast("long"))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max("tsn") - F.min("tsn")).cast("long").alias("span_us"),
    )


@query(
    "q_asof_join",
    covers=("X-ASOF",),
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS last_view_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase matched to the user's most recent
    view at-or-before it.  Spark has no asof primitive — implemented
    as the union-merge pattern: tag both sides, sort within user by
    (ts, side), carry the last view id forward with last(ignorenulls)
    — one shuffle, no range re-scan.  Oracle uses DuckDB's native
    ASOF JOIN (independent implementation).

    Deterministic here because (user_id, ts) is unique in the data;
    with ties the carried tie-break is (ts, views-first, event_id).
    """
    e = load_table(spark, sf_dir, "events")
    e = e.withColumn("tsu", F.expr("ts div 1000"))  # µs, matching the oracle's timestamp resolution
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "tsu", F.col("event_id").alias("view_id"), F.lit(1).alias("is_view")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "tsu", F.col("event_id").alias("purchase_id")
    ).withColumn("view_id", F.lit(None).cast("long")).withColumn("is_view", F.lit(0))
    both = views.withColumn("purchase_id", F.lit(None).cast("long")).unionByName(purchases)
    # views sort before purchases at equal ts (v.ts <= p.ts is inclusive)
    w = Window.partitionBy("user_id").orderBy(
        F.col("tsu").asc(), F.col("is_view").desc(), F.col("view_id").asc_nulls_first()
    ).rowsBetween(Window.unboundedPreceding, 0)
    carried = both.withColumn("last_view_id", F.last("view_id", ignorenulls=True).over(w))
    return carried.filter(F.col("purchase_id").isNotNull()).select(
        "purchase_id", "user_id", "last_view_id"
    )


@query(
    "q_range_join",
    covers=("X-RANGEJOIN",),
    oracle=f"""
    SELECT a.event_id AS event_a, b.event_id AS event_b
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {10 * US_PER_MIN}
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: same-user event pairs within 10
    minutes.  Naive form is a quadratic non-equi join; the engine
    buckets time into interval-width cells and equi-joins on
    (user, cell) with each left row probing its 3 neighboring cells —
    every qualifying pair shares exactly one (b-side) cell, so no
    dedup pass is needed.  The exact predicate filters bucket-edge
    false candidates."""
    width = 10 * US_PER_MIN
    e = load_table(spark, sf_dir, "events").withColumn("tsu", F.expr("ts div 1000"))
    a = e.select(
        F.col("user_id"),
        F.col("event_id").alias("event_a"),
        F.col("tsu").alias("ts_a"),
        F.explode(
            F.array(*[(F.expr(f"tsu div {width}") + F.lit(d)).alias("c") for d in (-1, 0, 1)])
        ).alias("cell"),
    )
    b = e.select(
        F.col("user_id"),
        F.col("event_id").alias("event_b"),
        F.col("tsu").alias("ts_b"),
        F.expr(f"tsu div {width}").alias("cell"),
    )
    return (
        a.join(b, ["user_id", "cell"])
        .filter(
            (F.col("event_a") < F.col("event_b"))
            & (F.abs(F.col("ts_a") - F.col("ts_b")) <= width)
        )
        .select("event_a", "event_b")
    )
