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


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """A row older than the advanced watermark must be DISCARDED, and
    only watermark-finalized windows emit in append mode — the
    bounded-state contract (late stragglers reconcile downstream via
    the batch upsert, not by keeping every window open forever)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from week4_musemotion_spark.streaming.ingest import windowed_event_counts

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "ev")
    # batch 1: two rows in the 00:00 window + one at 05:00 that pushes
    # the watermark (delay 1h) to 04:00
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 10), 1, "view", 0.0, "{}"),
         (2, dt.datetime(2024, 1, 1, 0, 20), 2, "view", 0.0, "{}"),
         (3, dt.datetime(2024, 1, 1, 5, 0), 3, "view", 0.0, "{}")],
        schema,
    ).write.mode("append").parquet(src)
    # batch 2: a LATE row for the 00:00 window (below the 04:00
    # watermark -> dropped) + one at 06:30 (keeps its window open)
    spark.createDataFrame(
        [(4, dt.datetime(2024, 1, 1, 0, 30), 4, "view", 0.0, "{}"),
         (5, dt.datetime(2024, 1, 1, 6, 30), 5, "view", 0.0, "{}")],
        schema,
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_late_drop").collect()
    got = {(r["window_start"], r["event_type"]): r["cnt"] for r in rows}
    # only the 00:00 window finalized; its count is 2 — the late row
    # (event 4) was dropped, and the 05:00/06:30 windows are still open
    assert got == {(dt.datetime(2024, 1, 1, 0, 0), "view"): 2}
