"""Live JDBC sink round-trips (SURVEY §2 K1/K2/K3) against embedded
Derby — the in-memory database that ships with Spark's own jars, so
the writer paths that were environment-gated in round 1 are exercised
for real: full-replace overwrite, append, and read-back parity."""

from __future__ import annotations

import pytest

URL = "jdbc:derby:memory:jdbc_sink_test;create=true"
PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def _read(spark, table):
    df = spark.read.format("jdbc").options(url=URL, dbtable=table, **PROPS).load()
    return sorted(map(tuple, df.collect()))


def test_jdbc_overwrite_replaces(spark):
    from week4_musemotion_spark.sources.sinks import write_jdbc

    a = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    write_jdbc(a, URL, "t_repl", mode="overwrite", properties=PROPS)
    assert _read(spark, "t_repl") == [(1, "a"), (2, "b")]
    # K1 full-replace: the second overwrite drops the first load entirely
    b = spark.createDataFrame([(9, "z")], "id int, v string")
    write_jdbc(b, URL, "t_repl", mode="overwrite", properties=PROPS)
    assert _read(spark, "t_repl") == [(9, "z")]


def test_jdbc_append_accumulates(spark):
    from week4_musemotion_spark.sources.sinks import write_jdbc

    a = spark.createDataFrame([(1, "a")], "id int, v string")
    write_jdbc(a, URL, "t_app", mode="overwrite", properties=PROPS)
    write_jdbc(
        spark.createDataFrame([(2, "b")], "id int, v string"),
        URL,
        "t_app",
        mode="append",
        properties=PROPS,
        num_partitions=1,  # connection cap path
    )
    assert _read(spark, "t_app") == [(1, "a"), (2, "b")]


def test_jdbc_roundtrip_from_testdata(spark):
    """A real dim table survives the JDBC round-trip value-exact."""
    from tests.conftest import SF_SMOKE
    from week4_musemotion_spark.sources.sinks import write_jdbc

    region = spark.read.parquet(f"{SF_SMOKE}/region.parquet").select("r_regionkey", "r_name")
    write_jdbc(region, URL, "t_region", mode="overwrite", properties=PROPS)
    assert _read(spark, "t_region") == sorted(map(tuple, region.collect()))
