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
    """A row arriving AFTER its window was watermark-finalized must be
    discarded — it must neither re-open the window nor re-emit it with
    a different count (the bounded-state contract: late stragglers
    reconcile downstream via the batch upsert, not by keeping every
    window open forever).

    Spark applies a new watermark with one micro-batch of lag and only
    drops rows whose window state was already evicted, so the drop is
    observable only with the window finalized strictly BEFORE the late
    row's batch: file2 advances max event time, file3 triggers
    finalization under the advanced watermark, file4 carries the late
    row."""
    import datetime as dt
    import glob
    import os
    import time

    from week4_musemotion_spark.streaming.ingest import windowed_event_counts

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "ev")
    batches = [
        # the 00:00 window
        [(1, dt.datetime(2024, 1, 1, 0, 10), 1, "view", 0.0, "{}"),
         (2, dt.datetime(2024, 1, 1, 0, 20), 2, "view", 0.0, "{}")],
        # advances max event time -> watermark 04:00 takes effect next batch
        [(3, dt.datetime(2024, 1, 1, 5, 0), 3, "view", 0.0, "{}")],
        # processed under watermark 04:00 -> finalizes + evicts the 00:00 window
        [(4, dt.datetime(2024, 1, 1, 5, 1), 4, "view", 0.0, "{}")],
        # LATE row for the evicted 00:00 window + one open-window row
        [(5, dt.datetime(2024, 1, 1, 0, 30), 5, "view", 0.0, "{}"),
         (6, dt.datetime(2024, 1, 1, 6, 30), 6, "view", 0.0, "{}")],
    ]
    for i, rows in enumerate(batches):
        # one file per micro-batch (coalesce), mtime-ordered
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        if i < len(batches) - 1:
            time.sleep(1.1)
    assert len(glob.glob(f"{src}/part-*.parquet")) == len(batches)

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
    got = {}
    for r in rows:
        got.setdefault((r["window_start"], r["event_type"]), []).append(r["cnt"])
    # the 00:00 window emitted EXACTLY ONCE with count 2: the late row
    # (event 5) neither re-opened nor re-emitted it; the 05:00/06:30
    # windows are still open (no emission)
    assert got == {(dt.datetime(2024, 1, 1, 0, 0), "view"): [2]}, got
