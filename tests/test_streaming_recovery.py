"""Checkpoint recovery: a stateful streaming query stopped and
restarted from the same checkpoint must carry its keyed state across
the restart (no double counting, no resets) — the exactly-once
contract the state store + checkpoint exist for."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _drain(spark, src, checkpoint, out_dir):
    """Drain via foreachBatch → parquet: the memory sink is not
    fault-tolerant (cannot recover from a checkpoint); foreachBatch
    is, and is how a real pipeline lands stateful update-mode output."""
    from week4_musemotion_spark.streaming.stateful import running_user_totals

    stream = spark.readStream.schema(_SCHEMA).parquet(src)

    def _sink(batch_df, batch_id):
        batch_df.withColumn("_batch", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def test_stateful_totals_survive_restart(spark, tmp_path):
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 10, "view", 1.50, "{}"),
         (2, dt.datetime(2024, 1, 1), 20, "view", 2.00, "{}")],
        _SCHEMA,
    ).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, str(tmp_path / "out"))

    # second batch arrives while the query is DOWN; restart from the
    # same checkpoint must process exactly the new file
    spark.createDataFrame(
        [(3, dt.datetime(2024, 1, 2), 10, "click", 0.25, "{}"),
         (4, dt.datetime(2024, 1, 2), 30, "view", 4.00, "{}")],
        _SCHEMA,
    ).write.mode("append").parquet(src)
    out = _drain(spark, src, ckpt, str(tmp_path / "out"))

    latest = {
        r["user_id"]: (r["n_events"], r["total_value_cents"])
        for r in out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value_cents").alias("total_value_cents"))
        .collect()
    }
    # user 10's state carried across the restart: 2 events, 175 cents;
    # user 30 seen only after restart; user 20 emitted nothing in run 2
    # (no new rows), so only its pre-restart state exists
    assert latest[10] == (2, 175)
    assert latest[30] == (1, 400)
    assert 20 not in latest or latest[20] == (1, 200)
