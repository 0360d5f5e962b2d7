"""Streaming session windows: the event-time counterpart of the
batch gap-sessionization (queries/temporal.q_sessionize), using
Spark's native ``session_window`` — state merges adjacent events
into variable-length sessions and the watermark closes (and frees)
sessions once no more late data can extend them.

Realizes the reference's aspirational "long-term tracking"
(README.md:41-45) as true streaming sessionization.  At scale the
state store holds one open session per active (user) key — bounded
by the watermark horizon, not by stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.streaming.ingest import (
    read_events_stream,
    with_event_time,
)


def session_event_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session aggregation with a dynamic-gap session
    window: a session extends while events arrive within ``gap`` of
    the previous one — identical semantics to the batch
    sessionization's lag()-based flagging, but computed by merging
    window state instead of a sorted scan."""
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_sessions_to_memory_sink(
    spark: SparkSession, path: str, table_name: str = "stream_sessions"
) -> None:
    """Drain the stream once (availableNow) into an in-memory table.
    Complete mode keeps every closed-or-open session in the sink so
    the test can compare against the batch computation; production
    uses append mode + checkpoint, emitting each session exactly once
    when the watermark passes its end."""
    q = (
        session_event_counts(read_events_stream(spark, path))
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
