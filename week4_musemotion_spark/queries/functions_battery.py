"""Scalar/array function batteries — breadth coverage for the engine
surface beyond the reference's own functions (string ops, date parts,
null handling, array sort/contains, CUBE, multi-value explode), each
differentially checked.  The multi-value explode is the ArrayType
seam the reference's pipe-delimited ``utility`` column implies but
never exploits (SURVEY.md §1.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.text import tokens
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table


@query(
    "q_string_funcs",
    covers=("X-STRFUNC",),
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS uname,
           substr(p_name, 1, 5) AS prefix,
           replace(p_type, ' ', '_') AS type_u,
           CAST(length(p_name) AS BIGINT) AS name_len,
           CAST(levenshtein(p_brand, p_type) AS BIGINT) AS brand_type_dist
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar battery: case, substring, replace, length,
    edit distance — all builtin, codegen'd."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_name", 1, 5).alias("prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_u"),
        F.length("p_name").cast("long").alias("name_len"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
    )


@query(
    "q_date_parts",
    covers=("X-DATEPARTS",),
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate) AS BIGINT) AS d
    FROM orders
    """,
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal field extraction (year/quarter/month/day-of-month).
    Day-of-week is deliberately excluded: Spark numbers Sunday=1,
    DuckDB Sunday=0 — a classic silent cross-engine trap."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
    )


@query(
    "q_null_funcs",
    covers=("X-NULLFUNC",),
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg_or_default,
           CAST(nullif(c_mktsegment, 'BUILDING') IS NULL AS INT) AS was_building,
           greatest(c_acctbal, 0.0) AS bal_floor0
    FROM customer
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling battery: nullif/coalesce/IS NULL/greatest —
    the null-normalization algebra underlying the cleaning layer."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        F.coalesce(seg, F.lit("(none)")).alias("seg_or_default"),
        seg.isNull().cast("int").alias("was_building"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
    )


@query(
    "q_token_sort",
    covers=("X-ARRAYFUNC",),
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), w -> w != '') AS toks
        FROM documents
    )
    SELECT doc_id,
           array_to_string(list_sort(toks), ' ') AS sorted_text,
           CAST(list_contains(toks, 'spark') AS INT) AS has_spark
    FROM t
    """,
)
def q_token_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery: sort + join round-trip (binary collation agrees
    across engines for ascii tokens) and membership test.  The oracle
    tokenizes exactly like the engine (regex split, empties dropped)
    so consecutive/leading whitespace cannot diverge the two sides."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(toks), " ").alias("sorted_text"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
    )


@query(
    "q_cube_counts",
    covers=("X-CUBE",),
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations in one pass (the
    dashboard's every-slice precomputation)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("cnt"))


@query(
    "q_explode_multivalue",
    covers=("X-EXPLODE",),
    oracle="""
    WITH mv AS (
        SELECT event_id,
               event_type || '|u' || CAST(user_id % 5 AS VARCHAR) AS packed
        FROM events
    )
    SELECT event_id, unnest(string_split(packed, '|')) AS val
    FROM mv
    """,
)
def q_explode_multivalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipe-delimited multi-value column → one row per value (split +
    explode) — the reference's ``utility`` column seam, done the
    ArrayType way."""
    e = load_table(spark, sf_dir, "events")
    packed = F.concat(F.col("event_type"), F.lit("|u"), (F.col("user_id") % 5).cast("string"))
    return e.select("event_id", F.explode(F.split(packed, r"\|")).alias("val"))


@query(
    "q_unpivot_metrics",
    covers=("X-UNPIVOT",),
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               count(*) AS n_rows,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_base_cents
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'n_rows', n_rows FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_base_cents', sum_base_cents FROM wide
    """,
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt): a 3-metric aggregate per
    returnflag stacked into (group, metric, value) rows — the inverse
    of ``q_pivot_event_types`` and the standard feed for generic
    metric stores / charting layers.  Spark's ``stack`` generator
    runs row-local on the already-aggregated wide table (3 groups ×
    3 metrics — the reshape costs nothing after the aggregate's one
    shuffle, at any scale).  The oracle spells the same reshape as a
    3-way UNION ALL, deliberately not DuckDB's UNPIVOT keyword — an
    independent formulation of identical semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_base_cents"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'sum_qty', sum_qty, 'n_rows', n_rows,"
            " 'sum_base_cents', sum_base_cents) AS (metric, value)"
        ),
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
       count(*) AS cnt,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


@query("q_grouping_sets", covers=("X-GROUPING-SETS",), oracle=_GROUPING_SETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the irregular aggregation lattice
    CUBE/ROLLUP can't express (here: detail, per-status, grand total,
    but deliberately NOT per-priority), with ``grouping()`` markers
    so a NULL produced by the rollup is distinguishable from a NULL
    in the data.  Spark plans this as a single Expand + hash
    aggregate — one pass over the fact, one shuffle, rows replicated
    only 3× rather than the 4× a CUBE would cost.  The identical SQL
    text runs on the oracle (both engines implement the ANSI
    GROUPING() semantics).  Ref capability: the dashboard's KPI +
    per-make chart + grand-total row (streamlit_app.py:180-215)
    computed in one aggregate instead of three queries."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)
