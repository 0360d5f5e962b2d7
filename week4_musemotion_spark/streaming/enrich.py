"""Stream-static enrichment: join the live event stream against a
static (periodically rebuilt) profile table.

The canonical serving-pipeline shape: a micro-batch stream of events
enriched per-row with each user's historical profile (here: lifetime
event count and exact-cents value total computed from the batch
table).  Spark plans the static side as an ordinary batch relation
inside every micro-batch — with a small profile it broadcasts, so
the stream never shuffles; at 100 TB-of-history scale the profile
table would be bucketed on user_id and the stream side shuffled once
per micro-batch onto the same layout.

The static side is deliberately an *aggregate* of history (tiny,
one row per user), not raw history — the stream-static join's cost
model only works when the static side is the compacted view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.session import ensure_runtime_conf
from week4_musemotion_spark.sources.tables import load_table
from week4_musemotion_spark.streaming.ingest import read_events_stream


def user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static per-user profile: lifetime event count + exact-cents
    value total (the compacted history view the stream joins to)."""
    ensure_runtime_conf(spark)
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("lifetime_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("lifetime_value_cents"),
    )


def enriched_stream(spark: SparkSession, stream_path: str, sf_dir: str) -> DataFrame:
    """Event stream ⋈ static user profile (broadcast, stream side
    never shuffles)."""
    stream = read_events_stream(spark, stream_path)
    profiles = F.broadcast(user_profiles(spark, sf_dir))
    return stream.join(profiles, "user_id", "left").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        "lifetime_events",
        "lifetime_value_cents",
    )
