"""Custom stateful operator: streaming running totals must converge
to the batch aggregation after draining the source."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_running_user_totals_match_batch(spark):
    from week4_musemotion_spark.functions.exact import sum_money
    from week4_musemotion_spark.sources.tables import load_table
    from week4_musemotion_spark.streaming.ingest import read_events_stream
    from week4_musemotion_spark.streaming.stateful import running_user_totals

    q = (
        running_user_totals(read_events_stream(spark, f"{SF_SMOKE}/events.parquet"))
        .writeStream.format("memory")
        .queryName("t_user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit a row per micro-batch per key: last wins
    got = {
        r.user_id: (r.n_events, r.total_value_cents)
        for r in spark.table("t_user_totals").orderBy("n_events").collect()
    }
    batch = {
        r.user_id: (r.n, r.cents)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), sum_money("value").alias("cents"))
        .collect()
    }
    assert got == batch
    assert len(got) > 5


def test_tws_user_totals_match_batch(spark):
    """transformWithStateInPandas (Spark-4 stateful API) must converge
    to the same totals as the batch aggregation.  Requires protobuf on
    the Python workers — skipped where the wheel is absent/broken."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")

    from week4_musemotion_spark.functions.exact import sum_money
    from week4_musemotion_spark.sources.tables import load_table
    from week4_musemotion_spark.streaming.ingest import read_events_stream
    from week4_musemotion_spark.streaming.tws import user_totals_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    q = (
        user_totals_tws(read_events_stream(spark, f"{SF_SMOKE}/events.parquet"))
        .writeStream.format("memory")
        .queryName("t_tws_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, r.total_value_cents)
        for r in spark.table("t_tws_totals").orderBy("n_events").collect()
    }
    batch = {
        r.user_id: (r.n, r.cents)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), sum_money("value").alias("cents"))
        .collect()
    }
    assert got == batch
