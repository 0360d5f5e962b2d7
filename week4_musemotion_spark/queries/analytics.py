"""Analytics-surface queries beyond the reference's literal SQL file:
multi-level aggregation (ROLLUP), semi/anti joins, pivot, JSON
extraction, and statistical aggregates — the natural next queries a
user of the reference's dashboard layer asks for, each with a DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import (
    avg_money,
    avg_money_sql,
    stddev_money,
    stddev_money_sql,
    sum_money,
    sum_money_sql,
)
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table


@query(
    "q_rollup_counts",
    covers=("X-ROLLUP",),
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS cnt, {sum_money_sql("o_totalprice")} AS total_price_cents
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (ROLLUP): per (priority, status), per
    priority, and grand total — one pass, partial aggregation
    underneath (the dashboard 'drill-down' shape)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("cnt"), sum_money("o_totalprice").alias("total_price_cents")
    )


@query(
    "q_semi_join",
    covers=("X-SEMIJOIN",),
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with at least one 450k+
    order — no duplication, right side never materialized in output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_anti_join",
    covers=("X-ANTIJOIN",),
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no 450k+ order —
    the insert-side of a merge, and the orphan-detection query.
    (Every customer has *some* order in this data, so the predicate
    keeps the result non-trivial.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_pivot_event_types",
    covers=("X-PIVOT",),
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'view')     AS view_cnt,
           count(*) FILTER (WHERE event_type = 'click')    AS click_cnt,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase_cnt,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup_cnt,
           count(*) FILTER (WHERE event_type = 'error')    AS error_cnt
    FROM events
    GROUP BY 1
    """,
)
def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per category) with an explicit value list —
    at scale never let pivot infer categories (extra pass + unbounded
    columns)."""
    e = load_table(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "signup", "error"]
    pivoted = (
        e.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    renamed = pivoted.select(
        "user_bucket", *[F.coalesce(F.col(t), F.lit(0)).alias(f"{t}_cnt") for t in types]
    )
    return renamed


@query(
    "q_json_extract",
    covers=("X-JSON",),
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_bucket
    FROM events
    WHERE props IS NOT NULL
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (semi-structured
    props payload) — builtin path expression, no UDF."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.filter(F.col("props").isNotNull()).select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, F.lit("high")).otherwise(F.lit("low")).alias("k_bucket"),
    )


@query(
    "q_stats_agg",
    covers=("X-STATS",),
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS cnt,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           {sum_money_sql("l_extendedprice")} AS sum_price_cents,
           {stddev_money_sql("l_extendedprice")} AS sd_price_e4
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery per group (min/max/sum/stddev)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        sum_money("l_extendedprice").alias("sum_price_cents"),
        stddev_money("l_extendedprice").alias("sd_price_e4"),
    )


@query(
    "q_supplier_nation_agg",
    covers=("X-SUPPLIER",),
    oracle=f"""
    SELECT n.n_name, count(*) AS n_suppliers,
           {sum_money_sql("s.s_acctbal")} AS total_balance_cents
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_supplier_nation_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier rollup per nation (completes coverage: every testdata
    table is exercised by at least one oracle query)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_suppliers"), sum_money("s_acctbal").alias("total_balance_cents"))
    )


@query(
    "q_multi_dim_join",
    covers=("X-STARJOIN",),
    oracle=f"""
    SELECT r.r_name, n.n_name, count(*) AS n_customers,
           {avg_money_sql("c.c_acctbal")} AS avg_balance_cents
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_multi_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema snowflake join (fact → dim → dim), both dims
    broadcast — zero fact-table shuffles before the aggregate."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), avg_money("c_acctbal").alias("avg_balance_cents"))
    )


@query(
    "q_group_quantiles",
    covers=("X-QUANTILES",),
    oracle="""
    WITH c AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    ),
    r AS (
        SELECT o_orderpriority, v,
               row_number() OVER (PARTITION BY o_orderpriority ORDER BY v) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM c
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_rows,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS BIGINT) AS p50_cents,
           CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS BIGINT) AS p90_cents
    FROM r
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quantiles (p50/p90) by discrete rank selection:
    rank every row in its group, pick the ceil(q·n)-th value — pure
    integer arithmetic, so unlike ``percentile``'s interpolated
    doubles (or ``approx_percentile``'s sketches) the result is
    bit-identical across engines.  One shuffle on the group key
    feeding a window sort, then an ordinary aggregate folds the two
    selected ranks per group.  At scale this is the pattern for
    small/medium group counts; for heavy-hitter groups the GK-sketch
    operator (operators/sketches.py) is the approximate alternative
    with bounded error.  Extends q_median_price (global exact median)
    to grouped, multi-quantile form."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("v")
    wn = Window.partitionBy("o_orderpriority")
    r = c.select(
        "o_orderpriority",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        r.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v")))
            .cast("long")
            .alias("p50_cents"),
            F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("v")))
            .cast("long")
            .alias("p90_cents"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_winsorize",
    covers=("X-WINSORIZE",),
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        FROM lineitem
    ),
    r AS (
        SELECT l_returnflag, v,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM c
    ),
    b AS (
        SELECT l_returnflag,
               max(CASE WHEN rn = (5 * n + 99) // 100 THEN v END) AS lo,
               max(CASE WHEN rn = (95 * n + 99) // 100 THEN v END) AS hi
        FROM r GROUP BY l_returnflag
    )
    SELECT c.l_returnflag,
           count(*) AS n_rows,
           CAST(sum(least(greatest(c.v, b.lo), b.hi)) AS BIGINT) AS clipped_sum_cents,
           count(*) FILTER (c.v < b.lo OR c.v > b.hi) AS n_clipped
    FROM c JOIN b ON c.l_returnflag = b.l_returnflag
    GROUP BY c.l_returnflag
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping to exact per-group p05/p95):
    the feature-robustification step of a training pipeline, in pure
    integer arithmetic.  Bounds come from the same discrete-rank
    selection as q_group_quantiles (value at ceil(q·n) — exact, not
    interpolated); the tiny per-group bound table broadcasts back
    onto the fact stream, so the fact shuffles once for the rank
    window and once for the final aggregate, never joining itself.
    Ceil in integers: rank = (q·n + 99) div 100 for q in percent."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("v")
    wn = Window.partitionBy("l_returnflag")
    r = c.select(
        "l_returnflag",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bounds = r.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("rn") == F.expr("(5 * n + 99) div 100"), F.col("v"))).alias("lo"),
        F.max(F.when(F.col("rn") == F.expr("(95 * n + 99) div 100"), F.col("v"))).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return (
        c.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(clipped).cast("long").alias("clipped_sum_cents"),
            F.count(F.when((F.col("v") < F.col("lo")) | (F.col("v") > F.col("hi")), 1)).alias(
                "n_clipped"
            ),
        )
    )
