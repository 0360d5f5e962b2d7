"""Structured Streaming ingest: the stream result must equal the
batch computation over the same files (exactly-once file source)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_windowed_counts_match_batch(spark):
    from week4_musemotion_spark.streaming.ingest import run_to_memory_sink

    path = f"{SF_SMOKE}/events.parquet"
    run_to_memory_sink(spark, path, table_name="t_stream_counts")
    stream = {
        (r.window_start, r.event_type): r.cnt
        for r in spark.table("t_stream_counts").collect()
    }

    from week4_musemotion_spark.sources.tables import load_table

    from week4_musemotion_spark.functions.eventtime import event_time

    e = load_table(spark, SF_SMOKE, "events")
    batch = {
        (r.window_start, r.event_type): r.cnt
        for r in e.withColumn("event_time", event_time(e))
        .groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
        .collect()
    }
    assert stream == batch
    assert len(stream) > 5
