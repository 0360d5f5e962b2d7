"""SURVEY §2 partial-closers: emptiness guard (A8), explicit row
INSERT (C2), DROP TABLE wrapper (C5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_is_empty_guard_and_kpi_skip(spark):
    from week4_musemotion_spark.operators.etl import is_empty, kpi_summary

    df = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        F.col("c_custkey").alias("year"), F.col("c_nationkey").alias("electric_range")
    )
    none = df.filter(F.lit(False))
    assert not is_empty(df)
    assert is_empty(none)
    # guarded KPI: zero input rows -> zero-row frame, same schema
    assert kpi_summary(df, skip_if_empty=True).count() == 1
    guarded = kpi_summary(none, skip_if_empty=True)
    assert guarded.count() == 0
    assert guarded.columns == ["total_vehicles", "avg_year", "avg_electric_range"]
    # unguarded keeps the count=0 row (pre-existing behavior)
    assert kpi_summary(none).collect()[0]["total_vehicles"] == 0


def test_append_rows_single_insert(spark, tmp_path):
    from week4_musemotion_spark.sources.sinks import append_rows, write_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_parquet(base, path)
    append_rows(spark, path, [(3, "c")], schema="id long, v string")
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_drop_table_if_exists(spark):
    from week4_musemotion_spark.sources.sinks import drop_table

    spark.sql("CREATE TABLE IF NOT EXISTS t_drop_me (id INT) USING parquet")
    assert spark.catalog.tableExists("t_drop_me")
    drop_table(spark, "t_drop_me")
    assert not spark.catalog.tableExists("t_drop_me")
    drop_table(spark, "t_drop_me")  # absent: no error
