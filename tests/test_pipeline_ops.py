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


def test_profile_decimal_and_tinyint_ranges(spark):
    from pyspark.sql import functions as F

    from week4_musemotion_spark.operators.profiling import profile

    df = spark.range(3).select(
        F.col("id").cast("decimal(10,2)").alias("dec"),
        F.col("id").cast("tinyint").alias("tiny"),
    )
    got = {r.column: r for r in profile(df).collect()}
    assert got["dec"].min_value == 0.0 and got["dec"].max_value == 2.0
    assert got["tiny"].min_value == 0.0 and got["tiny"].max_value == 2.0


def test_frequent_values_exact_support_boundary(spark):
    from week4_musemotion_spark.operators.sketches import frequent_values

    # 300 rows; 'x' at exactly 7% (21) must qualify at min_support=0.07
    # despite 300*0.07 = 21.000000000000004 in float
    df = spark.createDataFrame([("x",)] * 21 + [("y",)] * 279, ["v"])
    got = {r.v for r in frequent_values(df, "v", min_support=0.07).collect()}
    assert "x" in got


def test_stateful_totals_skip_null_values(spark, tmp_path):
    import pandas as pd

    from week4_musemotion_spark.streaming.ingest import EVENTS_STREAM_SCHEMA
    from week4_musemotion_spark.streaming.stateful import running_user_totals

    src = tmp_path / "ev"
    src.mkdir()
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [10**18, 10**18 + 1, 10**18 + 2],
            "user_id": [7, 7, 7],
            "event_type": ["view", "view", "view"],
            "value": [1.25, None, 2.75],
            "props": ["{}", "{}", "{}"],
        }
    )
    spark.createDataFrame(pdf, schema=EVENTS_STREAM_SCHEMA).write.parquet(str(src / "b.parquet"))
    # point at the parquet output dir itself: the file stream source
    # does not recurse into nested directories
    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(str(src / "b.parquet"))
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_null_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    row = spark.table("t_null_totals").collect()[-1]
    assert row.n_events == 3 and row.total_value_cents == 400  # null skipped, rows counted


def test_upsert_recovers_from_orphaned_old_snapshot(spark, tmp_path):
    import os

    from week4_musemotion_spark.operators.upsert import upsert_parquet_snapshot

    path = str(tmp_path / "snap")
    upsert_parquet_snapshot(spark, path, spark.createDataFrame([("a", 1)], ["k", "v"]), ["k"])
    # simulate a crash after the live snapshot was renamed aside but
    # before staging was promoted
    os.rename(path, path + "._old")
    upsert_parquet_snapshot(spark, path, spark.createDataFrame([("b", 2)], ["k", "v"]), ["k"])
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == [("a", 1), ("b", 2)]  # pre-crash data recovered, update merged
    assert not os.path.exists(path + "._old")


def test_sql_inserts_mysql_backslash_escapes(spark, tmp_path):
    from week4_musemotion_spark.sources.sql_inserts import read_sql_inserts

    p = tmp_path / "my.sql"
    p.write_text(
        "INSERT INTO t (a, b) VALUES ('O\\'Brien', 'back\\\\slash'), ('plain', 'x');\n"
    )
    rows = sorted(map(tuple, read_sql_inserts(spark, str(p), canonicalize=False).collect()))
    assert rows == [("O'Brien", "back\\slash"), ("plain", "x")]


def test_expectations_gate(spark):
    import pytest

    from week4_musemotion_spark.operators.expectations import Expectation, check_expectations

    df = spark.createDataFrame(
        [(1, "BEV", 100.0), (2, "PHEV", -5.0), (None, "BEV", 50.0), (2, "JET", 70.0)],
        ["id", "kind", "range"],
    )
    rules = [
        Expectation("id", "not_null"),
        Expectation("id", "unique"),
        Expectation("range", "min", 0.0),
        Expectation("kind", "isin", ("BEV", "PHEV")),
        Expectation("range", "max_null_fraction", 0.5),  # holds
    ]
    got = dict(check_expectations(df, rules))
    assert got == {
        "id not_null": 1,
        "id unique": 1,
        "range min 0.0": 1,
        "kind isin ('BEV', 'PHEV')": 1,
    }
    with pytest.raises(ValueError, match="expectations failed"):
        check_expectations(df, rules, fail_fast=True)
    # clean data passes silently
    clean = spark.createDataFrame([(1, "BEV", 1.0)], ["id", "kind", "range"])
    assert check_expectations(clean, rules) == []


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """Format breadth: the engine's tables survive an ORC round-trip
    bit-identically (ORC is the other columnar format Spark ships
    built-in — no extra packages)."""
    from pyspark.sql import functions as F

    from week4_musemotion_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    src = load_table(spark, SF_SMOKE, "orders")
    p = str(tmp_path / "orders_orc")
    src.write.format("orc").save(p)
    back = spark.read.format("orc").load(p)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # predicate pushdown works on ORC scans too
    plan_df = back.filter(F.col("o_orderkey") == 7)
    from week4_musemotion_spark.plans.audit import plan_string

    assert "orc" in plan_string(plan_df, "simple").lower()


def test_dq_violations_counts_on_dirty_fixture(spark, tmp_path):
    """Each audit rule must count exactly its planted violations."""
    import datetime as dt

    d = str(tmp_path)
    spark.createDataFrame(
        [(1, 10, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", None),
         (1, 11, 1, 2, -2.0, 1.0, 0.0, 0.0, "N", "O", None),   # nonpositive qty
         (99, 12, 1, 1, 3.0, 1.0, 0.0, 0.0, "N", "O", None)],  # orphan order 99
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 1, "O", 10.0, dt.datetime(1995, 1, 1), "1-URGENT"),
         (2, 1, "O", 10.0, dt.datetime(1999, 6, 1), "1-URGENT")],  # future date
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(1, "hello", "en", "web", 5), (2, "   ", "en", "web", 3), (3, None, "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "view", 0.0, "{}"),
         (1, dt.datetime(2024, 1, 2), 2, "view", 0.0, "{}"),   # dup event_id
         (2, dt.datetime(2024, 1, 3), 1, "click", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")

    from week4_musemotion_spark.queries import REGISTRY

    got = {
        r["rule"]: (r["n_violations"], r["n_checked"])
        for r in REGISTRY["q_dq_violations"].builder(spark, d).collect()
    }
    assert got == {
        "orphan_lineitem": (1, 3),
        "nonpositive_quantity": (1, 3),
        "blank_document_text": (2, 3),
        "duplicate_event_id": (1, 3),
        "future_orderdate": (1, 2),
    }


def test_apply_cdc_latest_change_wins_and_deletes(spark):
    """Multi-change-per-key ordering: within a key, the highest seq
    wins; a winning delete removes the key even if an earlier upsert
    exists; a delete superseded by a later upsert keeps the row."""
    from week4_musemotion_spark.operators.upsert import apply_cdc

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    chg = spark.createDataFrame(
        [
            (1, "a2", "U", 1), (1, None, "D", 2),   # delete wins (seq 2)
            (2, None, "D", 1), (2, "b2", "U", 2),   # upsert wins (seq 2)
            (4, "d", "U", 1),                        # insert of absent key
            (5, None, "D", 1),                       # delete of absent key: no-op
        ],
        "k long, v string, op string, seq long",
    )
    got = {
        r["k"]: r["v"]
        for r in apply_cdc(snap, chg, ["k"], order_by=["seq"]).drop("seq").collect()
    }
    assert got == {2: "b2", 3: "c", 4: "d"}
