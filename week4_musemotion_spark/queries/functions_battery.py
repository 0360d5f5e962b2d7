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


@query(
    "q_numeric_funcs",
    covers=("X-NUMFUNC",),
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(CAST(round(l_extendedprice * 100) AS BIGINT) - 100000) AS abs_off_cents,
           CAST(round(l_extendedprice * 100) AS BIGINT) % 97 AS mod97,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kbucket,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
           CAST(greatest(l_quantity, 25) AS BIGINT) AS qty_floor25,
           CAST(power(CAST(l_linenumber AS BIGINT), 2) AS BIGINT) AS line_sq
    FROM lineitem
    """,
)
def q_numeric_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric scalar battery: abs / modulo / floor / ceil / sign /
    greatest / integer power — pure codegen'd per-row expressions at
    scan speed.  Everything emits exact integers (floor/ceil of a
    double quotient is integral-valued, sign is ±1/0, power of a
    small int is exact in double) so the cross-engine hash compare
    is safe."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(cents - 100000).alias("abs_off_cents"),
        (cents % 97).alias("mod97"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_kbucket"),
        F.ceil(F.col("l_quantity") / 7).cast("long").alias("qty_bucket"),
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.lit(25)).cast("long").alias("qty_floor25"),
        F.pow(F.col("l_linenumber").cast("long"), 2).cast("long").alias("line_sq"),
    )


@query(
    "q_bitwise_funcs",
    covers=("X-BITFUNC",),
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 1 AS set_lsb,
           xor(o_orderkey, 21845) AS xored,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
    FROM orders
    """,
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar battery: and/or/xor, shifts, popcount — the
    integer substrate of hash/bucket/bitmask operators (every hashing
    op in functions/hashing.py compiles to these).  Exact integers by
    construction."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(1)).alias("set_lsb"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@query(
    "q_regex_funcs",
    covers=("X-REGEXFUNC", "F4"),
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+[0-9]+')) AS BIGINT)
               AS n_alnum_tokens,
           regexp_extract(text, '([a-z]+[0-9]+)', 1) AS first_alnum,
           CAST(regexp_matches(text, '(^| )dup( |$)') AS INT) AS has_dup,
           regexp_replace(text[1:40], '[0-9]+', '#', 'g') AS head_masked
    FROM documents
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar battery over document text: extract-all count,
    first-match extract, boolean match, and masking replace — the
    primitives under PII scrubbing and tokenization, all JVM-side
    regexp expressions (no Python).  Patterns stay in the
    POSIX-compatible subset where Java and RE2 semantics agree; the
    masking replace runs on a fixed 40-char prefix so outputs stay
    small at any scale."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(r"[a-z]+[0-9]+"))).cast("long").alias(
            "n_alnum_tokens"
        ),
        F.regexp_extract(t, r"([a-z]+[0-9]+)", 1).alias("first_alnum"),
        F.expr(r"CAST(text RLIKE '(^| )dup( |$)' AS INT)").alias("has_dup"),
        F.regexp_replace(F.substring(t, 1, 40), r"[0-9]+", "#").alias("head_masked"),
    )


@query(
    "q_map_funcs",
    covers=("X-MAPFUNC",),
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_quantity) AS BIGINT) AS qty_val,
           CAST(2 AS BIGINT) AS n_entries,
           'cents,qty' AS keys_sorted,
           CAST(round(l_extendedprice * 100) AS BIGINT) * 2 AS doubled_cents,
           CAST(CAST(round(l_quantity) AS BIGINT) > 100 AS BIGINT)
             + CAST(CAST(round(l_extendedprice * 100) AS BIGINT) > 100 AS BIGINT)
               AS filtered_size
    FROM lineitem
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType battery: construction, element_at, map_keys,
    transform_values / map_filter higher-order functions — the
    nested-type algebra behind typed-metadata columns (the multimodal
    meta map, per-field feature bundles).  The oracle computes every
    output straight from the base columns, so it checks the map ops
    against ground truth rather than mirroring them.  All per-row
    expression work — scan speed, no shuffle."""
    from week4_musemotion_spark.sources.tables import spread

    # spread: the interpreted map-HOF pipeline over every lineitem row
    # otherwise runs inside the single scan task of a one-row-group
    # file (no-op on wide scans)
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
        )
    )
    qty = F.round(F.col("l_quantity")).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    m = F.create_map(F.lit("qty"), qty, F.lit("cents"), cents)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_val"),
        F.size(m).cast("long").alias("n_entries"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(F.transform_values(m, lambda k, v: v * 2), "cents").alias(
            "doubled_cents"
        ),
        F.size(F.map_filter(m, lambda k, v: v > 100)).cast("long").alias(
            "filtered_size"
        ),
    )
