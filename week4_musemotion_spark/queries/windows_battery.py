"""Window-function and conditional-aggregation battery.

Completes the analytic-window surface next to ``temporal.q_window_funcs``:
frame-based rolling aggregates (RANGE BETWEEN over an integer day key),
the rank-function family (rank/dense_rank/ntile/cume_dist), aggregate
FILTER / count_if shapes, and ordered set collection.

Reference capability: the dashboard's KPI + group-size layer
(``streamlit_app.py:180-223``) generalized to the analytic shapes a
warehouse user expects.  Cross-engine determinism doctrine applies:
money in integer cents, every emitted double is either avoided or an
exactly-representable integer after ``round``.

Scale notes: every query here shuffles once on its partition key and
streams each partition in window order — no per-row re-scans; the
rank family and rolling frames are single-pass within a sorted
partition, so the plan at 100 TB is (exchange, sort, window) with
spill-safe external sort underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table


@query(
    "q_rolling_window",
    covers=("X-ROLLING",),
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_key,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_30d_cents
    FROM orders
    """,
)
def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day revenue per customer: a RANGE-frame rolling sum
    over an integer day key — the moving-aggregate primitive behind
    "spend in the last month" features.  RANGE (value-based) framing,
    unlike ROWS, treats same-day orders as peers, so the result is
    deterministic without a within-day tie-break.  One shuffle on
    o_custkey; the frame is a sliding pointer over the sorted
    partition, not a per-row re-scan.  Money in exact integer cents
    (cross-engine doctrine).  Ref capability: KPI layer
    streamlit_app.py:180-190 extended to time-windowed analytics."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_key"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day_key").rangeBetween(-29, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day_key",
        F.sum("cents").over(w).cast("long").alias("rolling_30d_cents"),
    )


@query(
    "q_window_ranks",
    covers=("X-RANKS",),
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           CAST(round(cume_dist() OVER w * count(*) OVER (PARTITION BY o_orderpriority))
                AS BIGINT) AS n_at_or_below
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
    """,
)
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-function family per priority class ordered by price:
    rank, dense_rank, ntile(4) quartile bucket, and cume_dist
    re-scaled to the integer "rows at or below me" count (cume_dist
    alone is a ratio double; × partition count it is an exact small
    integer, so the cross-engine hash compare is safe).  The order key
    (cents, o_orderkey) is total, making ntile deterministic.  One
    shuffle + one sort; all four functions evaluate in the same
    window pass."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    wp = Window.partitionBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.cume_dist().over(w) * F.count("*").over(wp))
        .cast("long")
        .alias("n_at_or_below"),
    )


@query(
    "q_conditional_agg",
    covers=("X-CONDAGG",),
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
           CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                             FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT)
               AS finished_cents,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation battery per priority: FILTER-clause
    counts (count_if), a predicate-masked sum, and a distinct count —
    the "segmented KPI row" computed in ONE pass instead of one query
    per segment (the dashboard runs its KPIs as separate frames;
    this is the fused form).  Masked branches are CASE expressions
    inside the same hash aggregate, so adding segments adds no
    passes.  The distinct-agg triggers Spark's two-phase
    expand+aggregate plan — partial aggregation still applies to the
    non-distinct branches."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 300000).alias("n_big"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F",
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("finished_cents"),
        F.count_distinct("o_custkey").alias("n_customers"),
    )


@query(
    "q_collect_values",
    covers=("X-COLLECT",),
    oracle="""
    SELECT n.n_name,
           count(*) AS n_customers,
           string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment)
               AS segments
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_collect_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct-set collection per group: the market segments
    present in each nation as one sorted comma-joined string — the
    "values seen" profile column.  ``collect_set`` is an unordered
    distributed set union; sorting it (``sort_array``) before
    ``array_join`` makes the emitted string deterministic and equal
    to DuckDB's ordered ``string_agg DISTINCT`` (ascii tokens →
    binary collation agrees).  The dim join broadcasts; the aggregate
    state is the bounded distinct set, not the row stream."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
        )
    )


@query(
    "q_value_window_funcs",
    covers=("X-VALWIN",),
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           first_value(o_orderkey) OVER w AS cheapest_key,
           last_value(o_orderkey) OVER w AS priciest_key,
           nth_value(o_orderkey, 3) OVER w AS third_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_value_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions (first_value / last_value / nth_value)
    over the full-partition frame: each order annotated with its
    priority class's cheapest, priciest, and third-cheapest order
    keys.  The frame must be UNBOUNDED..UNBOUNDED — the default
    (UNBOUNDED..CURRENT ROW) silently makes last_value mean "me",
    the classic window bug.  Total order (cents, key) keeps every
    engine's answer identical.  One shuffle + sort, all three
    functions in the same window pass."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("cents", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w).alias("priciest_key"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
    )


@query(
    "q_streaks",
    covers=("X-ISLANDS",),
    oracle="""
    WITH days AS (
        SELECT DISTINCT o_custkey,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_key
        FROM orders
    ),
    grp AS (
        SELECT o_custkey, day_key,
               day_key - row_number() OVER (PARTITION BY o_custkey ORDER BY day_key)
                   AS island
        FROM days
    ),
    streaks AS (
        SELECT o_custkey, island, count(*) AS streak_days
        FROM grp GROUP BY o_custkey, island
    )
    SELECT o_custkey,
           CAST(max(streak_days) AS BIGINT) AS longest_streak,
           count(*) AS n_streaks
    FROM streaks
    GROUP BY o_custkey
    """,
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each customer's longest run of CONSECUTIVE
    order days, via the rank-difference trick — day_key minus the
    row_number over sorted distinct days is constant exactly within a
    consecutive run, so one window + two aggregates find all islands
    without any self-join or iteration.  The technique complements
    gap-sessionization (q_sessionize): same problem family, O(1)
    passes instead of carried state.  One shuffle on the customer
    key; dedup, window, and both aggregates all share it."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_key"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("day_key")
    islands = o.withColumn("island", F.col("day_key") - F.row_number().over(w))
    streaks = islands.groupBy("o_custkey", "island").agg(
        F.count("*").alias("streak_days")
    )
    return streaks.groupBy("o_custkey").agg(
        F.max("streak_days").cast("long").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )
