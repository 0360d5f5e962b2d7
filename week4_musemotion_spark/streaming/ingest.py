"""Structured Streaming ingest of the events stream.

Realizes the reference's aspirational "long-term tracking / alerts"
(README.md:41-45 Future Improvements — no code exists there) as an
idiomatic Structured Streaming pipeline: file source → event-time
windowed aggregation with a watermark for late data.

Event time derives encoding-agnostically from the ts column
(functions.eventtime: the testdata has shipped both TIMESTAMP(NANOS)→
BIGINT and TIMESTAMP(MICROS)→NTZ layouts) with integer math only —
never float, which loses precision above 2^53.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from week4_musemotion_spark.functions.eventtime import event_time
from week4_musemotion_spark.session import ensure_runtime_conf

#: Fallback/fixture schema of the events stream (file streams require
#: an explicit schema — inference needs a listing pass that an
#: unbounded source can't do).  ts here is the legacy epoch-ns BIGINT
#: used by synthesized test fixtures; ``read_events_stream`` prefers
#: the actual on-disk schema via a one-footer batch read, so real
#: streams follow whatever ts encoding the files carry (event-time
#: derivation is dtype-aware either way).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over events parquet (path may be a file,
    directory, or glob — new files are discovered incrementally).

    The streaming file source derives its basePath from the input
    path and requires a directory or glob — a bare file path fails
    with "Option 'basePath' must be a directory".  A single file is
    therefore rewritten into a self-matching glob (last char becomes
    a character class), which makes the source anchor basePath at the
    parent directory.
    """
    ensure_runtime_conf(spark)
    import os

    try:
        # one-footer batch read: the stream's schema tracks whatever
        # ts encoding the files actually carry
        schema = spark.read.parquet(path).schema
    except AnalysisException:  # pragma: no cover - surfaces at start()
        # ONLY the path-not-yet-created case falls back to the legacy
        # epoch-ns layout (a stream may legitimately start before its
        # first input file lands); any other error — permissions,
        # corrupt footer, transient FS — must fail fast here rather
        # than silently read MICROS files with a BIGINT ts later
        schema = EVENTS_STREAM_SCHEMA
    if os.path.isfile(path):
        path = f"{path[:-1]}[{path[-1]}]"
    return spark.readStream.schema(schema).parquet(path)


def with_event_time(df: DataFrame) -> DataFrame:
    """ts (any supported encoding) → TIMESTAMP event time (exact
    integer µs; see functions.eventtime)."""
    return df.withColumn("event_time", event_time(df))


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts per event type, late data bounded by the
    watermark (state for closed windows is dropped — unbounded state
    is the classic streaming OOM at scale)."""
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def deduped_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-key streaming dedup: drop repeated event_ids
    within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds state: an event_id seen
    again after the watermark expires would re-emit, which is the
    explicit contract (bounded state beats unbounded exactness at
    scale — the batch upsert reconciles stragglers downstream).
    """
    return with_event_time(stream).withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory_sink(spark: SparkSession, path: str, table_name: str = "stream_counts") -> None:
    """Drain the stream once (availableNow) into an in-memory table —
    the test/demo harness; production writes to parquet/Kafka with a
    checkpoint location."""
    q = (
        windowed_event_counts(read_events_stream(spark, path))
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
