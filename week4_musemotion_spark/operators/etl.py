"""The MuseMotion cleaning pipeline — the reference's transform layer
(pipeline.py:81-123) as one declarative Spark plan.

Steps (order preserved from the reference):
1. trim + nullify text columns        (pipeline.py:99-102)
2. drop rows with null vin/city       (pipeline.py:105)
3. null-on-failure numeric casts      (pipeline.py:108-110)
4. WKT point → latitude/longitude     (pipeline.py:114-116, via
   builtin regexp — the reference used a row-wise Python .apply)
5. final projection                   (pipeline.py:119-120)

The whole pipeline is a single narrow-transform chain: no shuffle,
runs at scan speed in one stage, scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.cleaning import (
    extract_point_latlon,
    safe_cast,
    trim_nullify,
)

#: Text columns the reference trims/nullifies (pipeline.py:99-101).
TEXT_COLUMNS = ["vin", "city", "make", "model", "vehicle_type", "eligibility", "utility", "location"]

#: (column, spark type) for the reference's safe numeric casts.
NUMERIC_CASTS = [("year", "int"), ("electric_range", "int"), ("vehicle_id", "long")]

#: Critical columns: a row without these is dropped (pipeline.py:105).
CRITICAL_COLUMNS = ["vin", "city"]

FINAL_COLUMNS = [
    "vin",
    "city",
    "year",
    "make",
    "model",
    "vehicle_type",
    "eligibility",
    "electric_range",
    "vehicle_id",
    "location",
    "utility",
    "latitude",
    "longitude",
]


def clean_musemotion(df: DataFrame, drop_location: bool = False) -> DataFrame:
    """Raw (all-string, positionally named) → MUSEMOTION_CLEAN.

    ``drop_location`` reproduces the load_local_to_db.py:108 variant
    that drops the WKT source column after extraction.
    """
    out = df
    for c in TEXT_COLUMNS:
        out = out.withColumn(c, trim_nullify(c))
    out = out.na.drop(subset=CRITICAL_COLUMNS)
    for c, t in NUMERIC_CASTS:
        out = out.withColumn(c, safe_cast(c, t))
    lat, lon = extract_point_latlon("location")
    out = out.withColumn("latitude", lat).withColumn("longitude", lon)
    cols = [c for c in FINAL_COLUMNS if not (drop_location and c == "location")]
    return out.select(*cols)


def explode_utilities(df: DataFrame) -> DataFrame:
    """Split the pipe-delimited multi-valued ``utility`` column into
    one row per utility (the natural ArrayType seam the reference
    never exploits — 948/1,499 of its rows are multi-valued).
    """
    utilities = F.filter(
        F.transform(F.split(F.col("utility"), r"\|+"), lambda u: F.trim(u)),
        lambda u: u != "",
    )
    return df.withColumn("utility", F.explode_outer(utilities))


def is_empty(df: DataFrame) -> bool:
    """Emptiness guard (SURVEY §2 A8, ref streamlit_app.py:172-174).
    ``DataFrame.isEmpty`` plans a LIMIT 1 — it touches one partition
    and stops, never counting the table."""
    return df.isEmpty()


def kpi_summary(df: DataFrame, skip_if_empty: bool = False) -> DataFrame:
    """The dashboard KPI row (ref streamlit_app.py:180-190):
    total vehicles, avg year (1 dp), avg electric range (2 dp).

    ``skip_if_empty`` mirrors the reference's empty-dashboard guard
    (streamlit_app.py:172-174): zero input rows yield a zero-row KPI
    frame (the app layer renders "no data") instead of a
    count=0/NULL-averages row."""
    out = df.agg(
        F.count("*").alias("total_vehicles"),
        F.round(F.avg("year"), 1).alias("avg_year"),
        F.round(F.avg("electric_range"), 2).alias("avg_electric_range"),
    )
    if skip_if_empty and is_empty(df):
        return out.limit(0)
    return out


def group_size(df: DataFrame, col: str, ascending: bool = False) -> DataFrame:
    """Group-size chart feed (ref streamlit_app.py:205,215)."""
    counted = df.groupBy(col).count()
    return counted.orderBy(F.col("count").asc() if ascending else F.col("count").desc())
