"""Stateful streaming funnel: with a user's whole history delivered
(single availableNow batch, or in-order batches), the per-user stage
must EXACTLY match the batch q_funnel_conversion stage counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _drain(spark, stream, name):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_streaming_funnel_matches_batch_stage_counts(spark):
    from week4_musemotion_spark.queries import REGISTRY
    from week4_musemotion_spark.streaming.funnel import streaming_funnel
    from week4_musemotion_spark.streaming.ingest import read_events_stream

    out = _drain(
        spark,
        streaming_funnel(read_events_stream(spark, f"{SF_SMOKE}/events.parquet")),
        "t_funnel",
    )
    # update mode: last emission per user wins
    latest = (
        out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.col("stage").desc())
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    stream_counts = {
        k: sum(1 for r in latest if r["stage"] >= k) for k in (1, 2, 3)
    }
    batch = {
        r["stage"]: r["users"]
        for r in REGISTRY["q_funnel_conversion"].builder(spark, SF_SMOKE).collect()
    }
    assert stream_counts == batch


def test_streaming_funnel_in_order_batches_exact(spark, tmp_path):
    """Two in-order micro-batches (one file each): state carries the
    stage-1 entry across batches and the click in batch 2 advances
    the user; a click BEFORE the view (user 2) never counts."""
    import datetime as dt

    from week4_musemotion_spark.streaming.funnel import streaming_funnel

    b1 = [(1, dt.datetime(2024, 1, 1, 0), 10, "view", 0.0, "{}"),
          (2, dt.datetime(2024, 1, 1, 0), 20, "click", 0.0, "{}")]
    b2 = [(3, dt.datetime(2024, 1, 2, 0), 10, "click", 0.0, "{}"),
          (4, dt.datetime(2024, 1, 2, 1), 20, "view", 0.0, "{}")]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "ev")
    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = _drain(spark, streaming_funnel(stream), "t_funnel_micro")
    latest = {
        r["user_id"]: r["stage"]
        for r in out.groupBy("user_id").agg(F.max("stage").alias("stage")).collect()
    }
    # user 10: view then click -> stage 2; user 20: click preceded its
    # first view -> stuck at stage 1 after the view arrives
    assert latest == {10: 2, 20: 1}
