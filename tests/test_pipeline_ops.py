"""Hash sampling / splits, profiling, and streaming-upsert loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_train_test_split_disjoint_exhaustive_stable(spark):
    from week4_musemotion_spark.operators.sampling import train_test_split

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    train, test = train_test_split(o, "o_orderkey", test_fraction=0.2)
    n_train, n_test, n = train.count(), test.count(), o.count()
    assert n_train + n_test == n
    assert train.join(test, "o_orderkey", "inner").count() == 0  # disjoint
    assert 0.1 < n_test / n < 0.3  # roughly the requested fraction
    # stability: repartitioned input yields the identical split
    train2, _ = train_test_split(o.repartition(7), "o_orderkey", test_fraction=0.2)
    assert sorted(r.o_orderkey for r in train.select("o_orderkey").collect()) == sorted(
        r.o_orderkey for r in train2.select("o_orderkey").collect()
    )


def test_profile_detects_nulls_and_ranges(spark):
    from week4_musemotion_spark.operators.profiling import profile

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, -3.0), (None, "a", None)], ["i", "s", "d"]
    )
    got = {r.column: r for r in profile(df).collect()}
    assert got["i"].n_nulls == 1 and got["i"].n_distinct == 2
    assert got["s"].n_nulls == 1 and got["s"].n_distinct == 1
    assert got["s"].min_value is None  # non-numeric: no range
    assert got["d"].min_value == -3.0 and got["d"].max_value == 1.5


def test_stream_upsert_snapshot_converges(spark, tmp_path):
    from week4_musemotion_spark.sources.tables import load_table
    from week4_musemotion_spark.streaming.foreach_upsert import stream_upsert_to_snapshot
    from week4_musemotion_spark.streaming.ingest import read_events_stream

    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, f"{SF_SMOKE}/events.parquet")
    q = stream_upsert_to_snapshot(stream, snap, keys=["user_id"], checkpoint_dir=ckpt)
    q.awaitTermination()
    got = spark.read.parquet(snap)
    n_users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert got.count() == n_users  # one current row per key
    assert got.select("user_id").distinct().count() == n_users
    assert set(got.columns) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
