"""Stream-stream interval join: purchases matched to the same
user's views within a bounded look-back — the streaming counterpart
of the batch range join (queries/temporal.q_range_join) and the
attribution join every event pipeline ships.

Both sides carry watermarks and the join condition carries a time
bound: together they let Spark expire buffered rows — without the
bound, each side's state grows with the stream (the stream-join OOM
at scale).  Inner-join results emit as soon as both sides arrive;
the watermark governs state cleanup, not result completeness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.streaming.ingest import (
    read_events_stream,
    with_event_time,
)


def split_views_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two event-type substreams with disjoint column
    names (stream-stream self-joins need unambiguous sides)."""
    e = with_event_time(events)
    views = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("event_time").alias("view_time"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("event_time").alias("purchase_time"),
    )
    return views, purchases


def purchases_with_recent_views(
    events: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Each (purchase, view) pair where the view happened within
    ``lookback`` at-or-before the purchase, per user.  The interval
    predicate is the state-expiry contract: a buffered view can be
    dropped once the watermark passes view_time + lookback."""
    views, purchases = split_views_purchases(events)
    if events.isStreaming:
        views = views.withWatermark("view_time", watermark)
        purchases = purchases.withWatermark("purchase_time", watermark)
    return purchases.join(
        views,
        F.expr(
            f"""
            p_user_id = v_user_id
            AND view_time <= purchase_time
            AND view_time >= purchase_time - INTERVAL {lookback}
            """
        ),
        "inner",
    ).select("purchase_id", "view_id", F.col("p_user_id").alias("user_id"))


def run_join_to_memory_sink(
    spark: SparkSession, path: str, table_name: str = "stream_attrib"
) -> None:
    """Drain the self-joined stream once (availableNow) into an
    in-memory table (append mode — the only mode stream-stream inner
    joins support)."""
    q = (
        purchases_with_recent_views(read_events_stream(spark, path))
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
