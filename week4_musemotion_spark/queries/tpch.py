"""TPC-H-classic analytic shapes on the driver's TPC-H-ish testdata.

The reference's SQL corpus (``musemotion-queries.sql``) stops at
single-join group-bys; a 100 TB analytics engine must also prove the
canonical warehouse shapes — multi-way fact/dim joins, correlated
EXISTS, wide aggregate batteries, HAVING over grouped facts.  These
six queries are the standard TPC-H Q1/Q3/Q4/Q5/Q14/Q18 silhouettes
adapted to the testdata columns (no partsupp table, o_orderpriority
plays shippriority), with the engine's exact-integer money doctrine
(``functions/exact.py``): every monetary aggregate is computed AND
emitted as an exact integer (cents / e4 / e6 units), never a rounded
double, so the DuckDB oracle hash-matches bit-for-bit.

Scale notes (100 TB):

- Q1 is a pure scan + partial/final hash aggregate on 6 groups —
  the shuffle carries 6 rows per partition; bandwidth-bound scan.
- Q3/Q5/Q18 join fact-to-fact on the collocated ``l_orderkey`` /
  ``o_orderkey`` key (one shuffle each side, or zero with bucketed
  tables — see ``operators/skew.py``); dims (nation/region) broadcast
  explicitly, mid-size sides (customer/supplier/part) are left to
  AQE, which broadcasts them at small SF and shuffle-joins at scale.
- The disc-price/charge products stay in BIGINT here (max |value|
  ~6e16 at sf0.1); at 1000× scale the *sums* approach 2^63, so the
  charge sum is accumulated in decimal(38,0)/HUGEINT on both engines
  before the final BIGINT emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import (
    avg_money,
    avg_money_sql,
    cents,
    cents_sql,
    int_div_round,
    int_div_round_sql,
    ratio_e4,
    ratio_e4_sql,
    sum_money,
    sum_money_sql,
)
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table


def _disc_pct(col: str = "l_discount") -> F.Column:
    """Discount as exact integer percent (testdata discounts are
    2-decimal fractions 0.00..0.10)."""
    return F.round(F.col(col) * 100).cast("long")


_DISC_PCT_SQL = "CAST(round(l_discount * 100) AS BIGINT)"
_TAX_PCT_SQL = "CAST(round(l_tax * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Q1 — pricing summary report
# ---------------------------------------------------------------------------


@query(
    "q_tpch_pricing_summary",
    covers=("X-TPCH-Q1",),
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           {sum_money_sql("l_extendedprice")} AS sum_base_cents,
           CAST(sum({cents_sql("l_extendedprice")} * (100 - {_DISC_PCT_SQL})) AS BIGINT)
               AS sum_disc_e4,
           CAST(sum(CAST({cents_sql("l_extendedprice")} * (100 - {_DISC_PCT_SQL}) AS HUGEINT)
                    * (100 + {_TAX_PCT_SQL})) AS BIGINT) AS sum_charge_e6,
           {int_div_round_sql("sum(CAST(l_quantity AS BIGINT)) * 10000", "count(*)")}
               AS avg_qty_e4,
           {avg_money_sql("l_extendedprice")} AS avg_price_cents,
           {int_div_round_sql(f"sum({_DISC_PCT_SQL}) * 100", "count(*)")} AS avg_disc_e4,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-08-06'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: one scan, partial+final hash aggregate
    onto 6 groups (returnflag × linestatus) — the canonical
    bandwidth-bound aggregate.  disc_price/charge are exact integer
    products (e4 / e6 dollar units); the charge sum accumulates in
    decimal(38,0) (HUGEINT on the oracle side) so the partial sums
    cannot overflow long at large SF.  Ref capability: extends
    musemotion-queries.sql:48-52 (A2) to the full TPC-H Q1 battery."""
    li = load_table(spark, sf_dir, "lineitem")
    c = cents("l_extendedprice")
    d = _disc_pct()
    t = F.round(F.col("l_tax") * 100).cast("long")
    disc_e4 = c * (100 - d)
    qty = F.col("l_quantity").cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-08-06").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            sum_money("l_extendedprice").alias("sum_base_cents"),
            F.sum(disc_e4).alias("sum_disc_e4"),
            F.sum(disc_e4.cast("decimal(38,0)") * (100 + t)).cast("long").alias("sum_charge_e6"),
            int_div_round(F.sum(qty) * 10000, F.count(F.lit(1))).alias("avg_qty_e4"),
            avg_money("l_extendedprice").alias("avg_price_cents"),
            int_div_round(F.sum(d) * 100, F.count(F.lit(1))).alias("avg_disc_e4"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority (unshipped high-value orders)
# ---------------------------------------------------------------------------


@query(
    "q_tpch_shipping_priority",
    covers=("X-TPCH-Q3",),
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(sum({cents_sql("l.l_extendedprice")} * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_e4,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_e4 DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: segment-filtered customer dim joins
    orders (AQE broadcasts it at small SF), then fact⋈fact
    orders⋈lineitem on the order key — one shuffle per side, both
    pre-filtered before the join (date predicates push into the
    scans).  Top-10 fuses as TakeOrderedAndProject: no global sort.
    Ref capability: the CTE top-k join (musemotion-queries.sql:77-88)
    generalized to a 3-way join with grouped revenue."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(cents("l_extendedprice") * (100 - _disc_pct())).alias("revenue_e4"))
        .select(
            "l_orderkey",
            "revenue_e4",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue_e4"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (correlated EXISTS)
# ---------------------------------------------------------------------------


@query(
    "q_tpch_order_priority",
    covers=("X-TPCH-Q4", "A7"),
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate < TIMESTAMP '1999-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity >= 48
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 silhouette: correlated EXISTS subquery through the
    ``spark.sql`` entry path — Catalyst decorrelates it into a LEFT
    SEMI join on the order key (no row duplication however many
    lineitems match), then a 5-group aggregate.  The identical SQL
    text runs on the oracle.  Ref capability: completes the subquery
    family of musemotion-queries.sql:69-74 with the correlated form
    the reference lacks."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01'
          AND o_orderdate < TIMESTAMP '1999-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 48
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (5-way snowflake join)
# ---------------------------------------------------------------------------


@query(
    "q_tpch_local_supplier",
    covers=("X-TPCH-Q5",),
    oracle=f"""
    SELECT n.n_name,
           CAST(sum({cents_sql("l.l_extendedprice")} * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_e4
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue_e4 DESC, n.n_name
    """,
)
def q_tpch_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local supplier volume: the 6-table snowflake.
    nation⋈region collapse to a broadcast filter on the supplier side
    (25 × 5 rows at any SF); customer/supplier sides stay AQE-planned
    (broadcast here, shuffle at 100 TB where supplier alone is ~10 GB).
    The ``c_nationkey = s_nationkey`` residual rides on the suppkey
    equi-join.  Ref capability: the deepest join the engine proves —
    the reference tops out at 2 tables (musemotion-queries.sql:97-113)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(asia_nations, supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(cents("l_extendedprice") * (100 - _disc_pct())).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional aggregate ratio)
# ---------------------------------------------------------------------------


@query(
    "q_tpch_promo_share",
    covers=("X-TPCH-Q14",),
    oracle=f"""
    WITH j AS (
        SELECT {cents_sql("l.l_extendedprice")} * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                   AS rev_e4,
               p.p_type
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1999-09-01'
          AND l.l_shipdate < TIMESTAMP '1999-10-01'
    )
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS BIGINT)
               AS promo_rev_e4,
           CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
           {int_div_round_sql(
               "sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) * 10000",
               "sum(rev_e4)",
           )} AS promo_share_e4
    FROM j
    """,
)
def q_tpch_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: conditional aggregate ratio over a
    month of shipments joined to the part dim (AQE broadcasts part at
    small SF; at 100 TB part is ~20% of lineitem row count and the
    join shuffles on partkey).  The share is emitted as exact e4
    integer division — never a rounded double ratio.  Ref capability:
    the dashboard's KPI-ratio pattern (streamlit_app.py:180-190) at
    warehouse scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = cents("l_extendedprice") * (100 - _disc_pct())
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
    total = F.sum(rev)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            promo.alias("promo_rev_e4"),
            total.alias("total_rev_e4"),
            int_div_round(promo * 10000, total).alias("promo_share_e4"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large volume customers (HAVING over grouped fact, join back)
# ---------------------------------------------------------------------------


@query(
    "q_tpch_big_orders",
    covers=("X-TPCH-Q18",),
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
           {cents_sql("o.o_totalprice")} AS o_totalprice_cents,
           big.sum_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o_totalprice_cents DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: grouped-fact HAVING (the
    aggregate runs BEFORE the joins, shrinking the fact side ~20×),
    then joins back through orders and customer.  The big-orders
    aggregate reuses the l_orderkey partitioning for the orders join
    when bucketed; top-100 fuses as TakeOrderedAndProject.  Ref
    capability: HAVING (musemotion-queries.sql:48-52) composed with
    the join-back pattern of the CTE top-k query."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            cents("o_totalprice").alias("o_totalprice_cents"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice_cents"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (pure scan + scalar aggregate)
# ---------------------------------------------------------------------------


@query(
    "q_tpch_forecast_revenue",
    covers=("X-TPCH-Q6", "A3"),
    oracle=f"""
    SELECT CAST(sum({cents_sql("l_extendedprice")} * {_DISC_PCT_SQL}) AS BIGINT)
               AS revenue_e4,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q_tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue change: the canonical zero-join
    scan-filter-aggregate.  All three predicates push into the parquet
    scan (shipdate is a row-group min/max prune at scale; discount is
    compared in exact integer percent on both engines — a raw
    ``BETWEEN 0.05 AND 0.07`` on binary doubles would be boundary-
    unstable).  The whole query is one WholeStageCodegen span over the
    scan plus a 1-row partial/final agg — at 100 TB it is purely
    IO-bandwidth-bound, the yardstick every other query's overhead is
    judged against.  Ref capability: the global scalar aggregate of
    musemotion-queries.sql:71 (A3) with multi-predicate pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & _disc_pct().between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents("l_extendedprice") * _disc_pct()).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


@query(
    "q_tpch_volume_shipping",
    covers=("X-TPCH-Q7",),
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(sum({cents_sql("l.l_extendedprice")} * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_e4
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '2000-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: bilateral trade between two nations,
    grouped by (supplier nation, customer nation, ship year).  The
    nation dim joins twice under different roles — both broadcast
    (25 rows at any SF) and the disjunctive nation-pair predicate
    runs on the broadcast output, shrinking both fact sides before
    the orderkey shuffle.  Ref capability: the role-playing dim join
    the reference's single utilities join (J1-J3) cannot express."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(n1, supp.s_nationkey == F.col("n1_key"))
        .join(n2, cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(cents("l_extendedprice") * (100 - _disc_pct())).alias("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share within a region
# ---------------------------------------------------------------------------


@query(
    "q_tpch_market_share",
    covers=("X-TPCH-Q8",),
    oracle=f"""
    WITH flat AS (
        SELECT year(o.o_orderdate) AS o_year,
               {cents_sql("l.l_extendedprice")} * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                   AS rev_e4,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        WHERE r.r_name = 'AMERICA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_6' THEN rev_e4 ELSE 0 END) AS BIGINT)
               AS nation_rev_e4,
           CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
           {ratio_e4_sql("sum(CASE WHEN supp_nation = 'NATION_6' THEN rev_e4 ELSE 0 END)", "sum(rev_e4)")}
               AS mkt_share_e4
    FROM flat
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: one nation's revenue share of a
    part-type market within a customer region, per order year.  The
    8-table join tree resolves to two broadcast stacks (nation×2,
    region) over the customer and supplier branches; the conditional
    share is exact e4 integer division per year.  Ref capability:
    combines the snowflake of Q5 with the KPI-ratio pattern
    (streamlit_app.py:180-190) under a role-playing dim."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    america_nations = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").alias("cust_nkey"))
    )
    supp_nation = F.broadcast(
        nation.select(F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation"))
    )
    rev = cents("l_extendedprice") * (100 - _disc_pct())
    nation_rev = F.sum(F.when(F.col("supp_nation") == "NATION_6", rev).otherwise(F.lit(0)))
    total_rev = F.sum(rev)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(america_nations, cust.c_nationkey == F.col("cust_nkey"))
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(supp_nation, supp.s_nationkey == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            nation_rev.alias("nation_rev_e4"),
            total_rev.alias("total_rev_e4"),
            ratio_e4(nation_rev, total_rev).alias("mkt_share_e4"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------


@query(
    "q_tpch_product_profit",
    covers=("X-TPCH-Q9",),
    oracle=f"""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           CAST(sum({cents_sql("l.l_extendedprice")} * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                    - CAST(l.l_quantity AS BIGINT) * {cents_sql("p.p_retailprice")} * 100) AS BIGINT)
               AS profit_e4
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit silhouette: profit per supplier
    nation per order year over parts matching a name pattern.  The
    testdata has no partsupp, so supply cost is modeled as
    ``l_quantity × p_retailprice`` — same mixed multi-table arithmetic
    shape as the original's ``ps_supplycost × l_quantity``, in exact
    e4 integer units (profit can be negative; sum stays in BIGINT).
    The LIKE predicate prunes part before the join (substring
    pushdown); nation broadcasts.  Ref capability: pattern-filtered
    (LIKE) fact enrichment the reference's corpus lacks entirely."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = cents("l_extendedprice") * (100 - _disc_pct()) - F.col("l_quantity").cast(
        "long"
    ) * cents("p_retailprice") * 100
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).alias("profit_e4"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top customers by lost revenue)
# ---------------------------------------------------------------------------


@query(
    "q_tpch_returned_items",
    covers=("X-TPCH-Q10",),
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({cents_sql("l.l_extendedprice")} * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_e4,
           {cents_sql("c.c_acctbal")} AS c_acctbal_cents,
           n.n_name AS nation,
           c.c_mktsegment
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1999-07-01'
      AND o.o_orderdate < TIMESTAMP '1999-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
    ORDER BY revenue_e4 DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by revenue
    lost to returns in a quarter.  Orders prune on the date window
    before the lineitem join; the returnflag filter pushes into the
    lineitem scan; nation broadcasts onto the grouped output.  The
    aggregate groups on the full customer tuple (key + 4 attrs);
    the extra group columns are functionally dependent on c_custkey
    and ride the same shuffle at no extra exchange cost.  Top-20
    fuses as TakeOrderedAndProject.  Ref capability: the dashboard's
    "top entities by metric" pattern (streamlit_app.py:205-215) as a
    4-table warehouse query."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            cents("c_acctbal").alias("c_acctbal_cents"),
            F.col("n_name").alias("nation"),
            "c_mktsegment",
        )
        .agg(F.sum(cents("l_extendedprice") * (100 - _disc_pct())).alias("revenue_e4"))
        .select("c_custkey", "c_name", "revenue_e4", "c_acctbal_cents", "nation", "c_mktsegment")
        .orderBy(F.desc("revenue_e4"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue under disjunctive brand/size/qty predicates
# ---------------------------------------------------------------------------


@query(
    "q_tpch_disjunct_revenue",
    covers=("X-TPCH-Q19", "P8"),
    oracle=f"""
    SELECT CAST(sum({cents_sql("l.l_extendedprice")} * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_e4,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_disjunct_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue: three OR'd brand/size/quantity
    conjunctions across the join boundary.  Catalyst factors the
    part-only conjuncts (brand ∈ {12,23,3}, size ≤ 15) out of the
    disjunction and pushes them into the part scan, and the quantity
    bounds (1..30) into the lineitem scan, leaving only the residual
    cross-table disjunction on the join output — the standard
    CNF-extraction test.  Ref capability: the dashboard's IN-list
    conjunctive filter (P8, streamlit_app.py:166-170) generalized to
    disjunctions of conjunctions."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(cents("l_extendedprice") * (100 - _disc_pct())).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 — shipping modes and order priority (fact⋈fact + conditional counts)
# ---------------------------------------------------------------------------


@query(
    "q_tpch_shipping_modes",
    covers=("X-TPCH-Q12",),
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1999-01-01'
      AND l.l_shipdate < TIMESTAMP '2000-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q_tpch_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 silhouette (shipping modes & order priority): fact⋈fact
    join with a cross-table date predicate and CASE-conditional counts
    per group.  The testdata has no ``l_shipmode``/``l_receiptdate``,
    so ``l_returnflag`` plays the mode and "late receipt" becomes a
    >60-day ship lag (``l_shipdate > o_orderdate + 60 days``) — same
    plan shape as the canonical query.  Scale: the year filter prunes
    the lineitem scan before the orderkey-collocated join (zero extra
    shuffle with bucketed tables); the cross-table lag predicate is a
    post-join residual; the aggregate carries 3 groups.  Completes the
    22/22 TPC-H silhouette battery.  Ref capability: conditional KPI
    counting (streamlit_app.py:180-190) over a warehouse join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            # NOT-IN mirrors the oracle: NULL priority counts in NEITHER
            # bucket (when(~high) is NULL -> otherwise 0), not as "low"
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )
