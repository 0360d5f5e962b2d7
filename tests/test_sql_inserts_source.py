"""S5 source: the reference's SQL dump must parse into the same
dataset its CSV carries (two serializations, one table)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

POPULATE_SQL = "/root/reference/musemotion-populate-table.sql"
REFERENCE_CSV = "/root/reference/musemotion_databse.csv"


@pytest.mark.skipif(not os.path.exists(POPULATE_SQL), reason="reference dump unavailable")
def test_dump_parses_and_matches_csv(spark):
    from week4_musemotion_spark.operators.etl import clean_musemotion
    from week4_musemotion_spark.sources.csv import read_headerless_csv
    from week4_musemotion_spark.sources.sql_inserts import read_sql_inserts

    dump = read_sql_inserts(spark, POPULATE_SQL)
    # the reference's own serializations disagree by one record: the
    # CSV carries 1,499 rows, the SQL dump only 1,498 (VIN WA1E2AFY8R
    # appears twice in the CSV, zero times in the dump) — verified
    # against the raw files, not a parser artifact
    assert dump.count() == 1498
    # canonical naming applied
    for c in ("vin", "eligibility", "electric_range", "vehicle_id", "location", "utility"):
        assert c in dump.columns

    # same dataset as the CSV up to that one known row
    csv = read_headerless_csv(spark, REFERENCE_CSV)
    dump_vins = {tuple(r) for r in dump.groupBy("vin").count().collect()}
    csv_vins = {tuple(r) for r in csv.groupBy("vin").count().collect()}
    assert dump_vins - csv_vins == set()
    assert {v for v, _ in csv_vins - dump_vins} == {"WA1E2AFY8R"}

    # the dump feeds the same cleaning pipeline (two sources, one ETL)
    cleaned = clean_musemotion(dump)
    top = cleaned.groupBy("make").count().orderBy(F.desc("count")).first()
    assert top["make"] == "TESLA" and top["count"] == 605


def test_quoted_comma_paren_and_null_tuples(spark):
    from week4_musemotion_spark.sources.sql_inserts import read_sql_inserts

    p = "/tmp/_ins_test.sql"
    with open(p, "w") as f:
        f.write(
            "CREATE TABLE t (a VARCHAR, b VARCHAR, c VARCHAR);\n"
            "INSERT INTO `t` (`a`, `b`, `c`) VALUES\n"
            "('x, y', 'it''s (fine)', NULL),\n"
            "('', 'POINT (1 2)', '3');\n"
        )
    rows = read_sql_inserts(spark, p, canonicalize=False).collect()
    assert [tuple(r) for r in rows] == [("x, y", "it's (fine)", None), ("", "POINT (1 2)", "3")]


def test_cloud_path_builders():
    from week4_musemotion_spark.sources.cloud import abfss_path, s3a_path

    assert (
        abfss_path("raw", "evdata", "/musemotion/2025/*.csv")
        == "abfss://raw@evdata.dfs.core.windows.net/musemotion/2025/*.csv"
    )
    assert s3a_path("lake", "ev/part-*.parquet") == "s3a://lake/ev/part-*.parquet"


@pytest.mark.skipif(not os.path.exists(POPULATE_SQL), reason="reference dump unavailable")
def test_python_datasource_matches_driver_parser(spark):
    """The Spark-4 Python DataSource (partition-parallel parse) must
    produce exactly the driver-side parser's dataset."""
    from week4_musemotion_spark.sources.sql_inserts import read_sql_inserts
    from week4_musemotion_spark.sources.sql_inserts_ds import SqlInsertsDataSource

    spark.dataSource.register(SqlInsertsDataSource)
    ds = spark.read.format("sql_inserts").load(POPULATE_SQL)
    assert ds.rdd.getNumPartitions() > 1  # the parse actually distributes
    a = sorted(map(tuple, ds.collect()))
    b = sorted(map(tuple, read_sql_inserts(spark, POPULATE_SQL).collect()))
    assert a == b


def test_python_datasource_quoted_tuples(spark):
    from week4_musemotion_spark.sources.sql_inserts_ds import SqlInsertsDataSource

    p = "/tmp/_ins_ds_test.sql"
    with open(p, "w") as f:
        f.write(
            "INSERT INTO `t` (`a`, `b`, `c`) VALUES\n"
            "('x, y', 'it''s (fine)', NULL);\n"
            "INSERT INTO `t` (`a`, `b`, `c`) VALUES\n"
            "('', 'POINT (1 2)', '3');\n"
        )
    spark.dataSource.register(SqlInsertsDataSource)
    rows = (
        spark.read.format("sql_inserts")
        .option("canonicalize", "false")
        .load(p)
        .collect()
    )
    assert sorted(map(tuple, rows)) == [
        ("", "POINT (1 2)", "3"),
        ("x, y", "it's (fine)", None),
    ]
