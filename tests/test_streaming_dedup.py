"""Streaming dedup: duplicated input files collapse to unique events."""

from __future__ import annotations

import shutil

from tests.conftest import SF_SMOKE


def test_stream_dedup_collapses_duplicate_files(spark, tmp_path):
    from week4_musemotion_spark.streaming.ingest import deduped_stream, read_events_stream

    # simulate at-least-once delivery: the same batch lands twice
    src = tmp_path / "arrivals"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "batch1.parquet")
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "batch2.parquet")

    q = (
        deduped_stream(read_events_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_dedup_stream")
    n_unique = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique
