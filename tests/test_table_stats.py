"""ANALYZE TABLE / CBO statistics (operators/stats.py): analyzed row
counts must reach the catalog and the optimizer's estimates."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_analyze_populates_catalog_and_optimizer(spark):
    from week4_musemotion_spark.operators.stats import (
        analyze_table,
        optimizer_row_estimate,
        table_stats,
    )

    src = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    n = src.count()
    src.write.mode("overwrite").saveAsTable("t_stats_nation")
    try:
        assert table_stats(spark, "t_stats_nation").get("row_count") is None
        analyze_table(spark, "t_stats_nation", columns=["n_nationkey", "n_regionkey"])
        st = table_stats(spark, "t_stats_nation")
        assert st["row_count"] == n
        assert st["size_bytes"] > 0
        # CBO consumes the stats: the optimizer's own estimate for a
        # full-table read equals the analyzed row count
        old = spark.conf.get("spark.sql.cbo.enabled", "false")
        try:
            spark.conf.set("spark.sql.cbo.enabled", "true")
            est = optimizer_row_estimate(spark.table("t_stats_nation"))
            assert est == n
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_stats_nation")
