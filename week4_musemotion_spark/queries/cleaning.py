"""Cleaning/ETL operator queries — the reference's transform layer.

The dirty inputs are synthesized deterministically from the ``events``
table with pure SQL-expressible string ops (concat of ints/enums), so
the DuckDB oracle can build byte-identical inputs (FIXTURES.md §B).
The cleaning expressions under test are the real engine operators
from ``functions.cleaning`` — builtin Catalyst expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.cleaning import (
    extract_point_latlon,
    safe_cast,
    trim_nullify,
)
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table


@query(
    "q_trim_nullify",
    covers=("F1", "F2"),
    oracle="""
    WITH dirty AS (
        SELECT event_id,
               CASE WHEN event_type = 'error'  THEN 'nan'
                    WHEN event_type = 'signup' THEN ''
                    WHEN event_type = 'view'   THEN 'None'
                    ELSE '  ' || event_type || '  ' END AS raw
        FROM events
    )
    SELECT event_id,
           CASE WHEN trim(raw) IN ('nan', 'None', '') THEN NULL
                ELSE trim(raw) END AS cleaned
    FROM dirty
    """,
)
def q_trim_nullify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace trim + 'nan'/'None'/'' → NULL normalization (ref
    pipeline.py:99-102) over synthesized dirty strings."""
    e = load_table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_type") == "error", F.lit("nan"))
        .when(F.col("event_type") == "signup", F.lit(""))
        .when(F.col("event_type") == "view", F.lit("None"))
        .otherwise(F.concat(F.lit("  "), F.col("event_type"), F.lit("  ")))
    )
    return e.select("event_id", trim_nullify(raw).alias("cleaned"))


@query(
    "q_safe_cast",
    covers=("F3",),
    oracle="""
    WITH dirty AS (
        SELECT event_id,
               CASE WHEN event_type = 'error'  THEN 'oops'
                    WHEN event_type = 'signup' THEN ''
                    WHEN event_type = 'click'  THEN ' ' || CAST(user_id AS VARCHAR) || ' '
                    ELSE CAST(event_id AS VARCHAR) END AS raw
        FROM events
    )
    SELECT event_id, TRY_CAST(trim(raw) AS BIGINT) AS parsed
    FROM dirty
    """,
)
def q_safe_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-on-failure numeric cast (``pd.to_numeric(errors='coerce')``,
    ref pipeline.py:108-110) — garbage and empty parse to NULL,
    padded numerics parse fine."""
    e = load_table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_type") == "error", F.lit("oops"))
        .when(F.col("event_type") == "signup", F.lit(""))
        .when(
            F.col("event_type") == "click",
            F.concat(F.lit(" "), F.col("user_id").cast("string"), F.lit(" ")),
        )
        .otherwise(F.col("event_id").cast("string"))
    )
    return e.select("event_id", safe_cast(raw, "long").alias("parsed"))


@query(
    "q_regex_extract_point",
    covers=("F4",),
    oracle="""
    WITH pts AS (
        SELECT event_id,
               CASE WHEN event_type = 'error' THEN 'not a point'
                    WHEN event_type = 'signup' THEN NULL
                    ELSE 'POINT (' || CAST((user_id % 360) - 180 AS VARCHAR)
                         || ' ' || CAST((event_id % 180) - 90 AS VARCHAR) || ')'
                    END AS location
        FROM events
    )
    SELECT event_id,
           TRY_CAST(NULLIF(regexp_extract(location,
               'POINT\\s*\\(\\s*(-?[\\d\\.]+)\\s+(-?[\\d\\.]+)\\s*\\)', 2), '') AS DOUBLE) AS latitude,
           TRY_CAST(NULLIF(regexp_extract(location,
               'POINT\\s*\\(\\s*(-?[\\d\\.]+)\\s+(-?[\\d\\.]+)\\s*\\)', 1), '') AS DOUBLE) AS longitude
    FROM pts
    """,
)
def q_regex_extract_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKT ``POINT (lon lat)`` → (latitude, longitude) via builtin
    regexp_extract — the reference's only UDF-shaped op (ref
    pipeline.py:38,67-79), here with zero Python in the row path.
    Malformed/NULL input yields NULL coordinates."""
    e = load_table(spark, sf_dir, "events")
    location = (
        F.when(F.col("event_type") == "error", F.lit("not a point"))
        .when(F.col("event_type") == "signup", F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("POINT ("),
                ((F.col("user_id") % 360) - 180).cast("string"),
                F.lit(" "),
                ((F.col("event_id") % 180) - 90).cast("string"),
                F.lit(")"),
            )
        )
    )
    lat, lon = extract_point_latlon(location)
    return e.select("event_id", lat.alias("latitude"), lon.alias("longitude"))


@query(
    "q_drop_critical_nulls",
    covers=("P9",),
    oracle="""
    WITH sparse AS (
        SELECT c_custkey,
               NULLIF(c_mktsegment, 'BUILDING') AS segment,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS balance
        FROM customer
    )
    SELECT c_custkey, segment, balance
    FROM sparse
    WHERE segment IS NOT NULL AND balance IS NOT NULL
    """,
)
def q_drop_critical_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop rows with NULL in critical columns (ref pipeline.py:105
    ``dropna(subset=...)``) over synthesized sparse columns."""
    c = load_table(spark, sf_dir, "customer")
    sparse = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment"),
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("balance"),
    )
    return sparse.na.drop(subset=["segment", "balance"])


@query(
    "q_geo_nearest",
    covers=("F4", "X-GEO"),
    oracle="""
    WITH pts AS (
        SELECT event_id,
               CASE WHEN event_type = 'error' THEN 'not a point'
                    WHEN event_type = 'signup' THEN NULL
                    ELSE 'POINT (' || CAST((user_id % 360) - 180 AS VARCHAR)
                         || ' ' || CAST((event_id % 180) - 90 AS VARCHAR) || ')'
                    END AS location
        FROM events
    ),
    coords AS (
        SELECT event_id,
               TRY_CAST(NULLIF(regexp_extract(location,
                   'POINT\\s*\\(\\s*(-?[\\d\\.]+)\\s+(-?[\\d\\.]+)\\s*\\)', 2), '')
                   AS BIGINT) AS lat,
               TRY_CAST(NULLIF(regexp_extract(location,
                   'POINT\\s*\\(\\s*(-?[\\d\\.]+)\\s+(-?[\\d\\.]+)\\s*\\)', 1), '')
                   AS BIGINT) AS lon
        FROM pts
    )
    SELECT event_id, lat, lon,
           (lat - 47) * (lat - 47) + (lon + 122) * (lon + 122) AS dist_sq
    FROM coords
    WHERE lat IS NOT NULL
    ORDER BY dist_sq ASC, event_id ASC
    LIMIT 20
    """,
)
def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo top-k: the 20 events nearest a fixed point (the
    reference's Washington-state anchor, lat 47 / lon -122), computed
    on coordinates PARSED BACK from WKT — closing the loop on the
    reference's geo capability (extract lat/lon, pipeline.py:114-116,
    then actually use them).  Distance is exact integer squared
    degrees (the synthesized coords are integral), so no libm trig
    enters the comparison; the top-k fuses into TakeOrderedAndProject
    with (dist_sq, event_id) as the deterministic total order.  At
    scale the win is the same as every top-k here: per-partition
    heaps, no global sort."""
    e = load_table(spark, sf_dir, "events")
    location = (
        F.when(F.col("event_type") == "error", F.lit("not a point"))
        .when(F.col("event_type") == "signup", F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("POINT ("),
                ((F.col("user_id") % 360) - 180).cast("string"),
                F.lit(" "),
                ((F.col("event_id") % 180) - 90).cast("string"),
                F.lit(")"),
            )
        )
    )
    lat_d, lon_d = extract_point_latlon(location)
    lat, lon = lat_d.cast("long"), lon_d.cast("long")
    dist_sq = (lat - 47) * (lat - 47) + (lon + 122) * (lon + 122)
    return (
        e.select(
            "event_id",
            lat.alias("lat"),
            lon.alias("lon"),
            dist_sq.alias("dist_sq"),
        )
        .filter(F.col("lat").isNotNull())
        .orderBy(F.asc("dist_sq"), F.asc("event_id"))
        .limit(20)
    )
