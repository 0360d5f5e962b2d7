"""Set operations and order statistics — INTERSECT / EXCEPT (absent
from the reference, SURVEY.md §2.7, but first-class engine surface)
and exact medians emitted in half-cents (integer-exact: the median of
an even group interpolates (a+b)/2, which lands on half-cent
boundaries — the engine-divergent rounding class documented in
functions.exact)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import cents, cents_sql
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table


@query(
    "q_intersect",
    covers=("X-INTERSECT",),
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers appearing in both predicates'
    order sets."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return big.intersect(finished)


@query(
    "q_except",
    covers=("X-EXCEPT",),
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): big-spender customers with no finished
    order."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return big.subtract(finished)


@query(
    "q_median_price",
    covers=("X-MEDIAN",),
    oracle=f"""
    SELECT o_orderpriority,
           CAST(round(quantile_cont({cents_sql("o_totalprice")}, 0.5) * 2) AS BIGINT)
               AS median_halfcents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group, emitted in HALF-cents: the even-count
    median is (a+b)/2 over integer cents, so doubling it is an exact
    integer in both engines (continuous-interpolation quantile)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile(cents("o_totalprice"), F.lit(0.5)) * 2)
        .cast("long")
        .alias("median_halfcents")
    )

@query(
    "q_intersect_all",
    covers=("X-INTERSECT-ALL",),
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): multiplicity = min of the two
    sides' multiplicities per key.

    Scale note: Spark plans this as a single hash aggregate counting
    per-side multiplicities then a generator — one shuffle on the value
    columns, no join."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return big.intersectAll(finished)


@query(
    "q_except_all",
    covers=("X-EXCEPT-ALL",),
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): multiplicity = max(0, left - right)
    per key — the dedup-aware difference used when reconciling two
    ingest batches without collapsing legitimate repeats."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return big.exceptAll(finished)

@query(
    "q_union_distinct",
    covers=("X-UNION-DISTINCT",),
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — completes the union family next to
    q_union_all.  Spark has no unionDistinct; union + dropDuplicates
    is the idiom and Catalyst fuses it into one hash aggregate over
    the concatenated scans (single shuffle on the value)."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000.0).select("o_custkey")
    pend = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return big.unionByName(pend).dropDuplicates()
