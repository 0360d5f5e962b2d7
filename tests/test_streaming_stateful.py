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
