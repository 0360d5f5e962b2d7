"""Schema evolution (sources/evolution.py): drifted appends, union
reads across generations, widening lattice, conflict errors.

Reference contrast: the reference's load paths are full-replace /
drop-and-recreate (pipeline.py:150-175, load_local_to_db.py:120-140)
— evolve_append is the append-only generalization a long-lived
corpus needs."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from week4_musemotion_spark.sources.evolution import (
    dataset_schema,
    evolve_append,
    read_evolved,
    reconcile_to,
)


@pytest.fixture
def path(tmp_path):
    p = str(tmp_path / "evo")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def test_first_write_then_added_column(spark, path):
    r0 = evolve_append(
        spark.createDataFrame([(1, "a")], "id long, name string"), path
    )
    assert r0 == {"added": [], "filled": [], "widened": [], "generation": 0}
    # generation 1 adds a column; older rows read it as NULL
    r1 = evolve_append(
        spark.createDataFrame([(2, "b", "en")], "id long, name string, lang string"),
        path,
    )
    assert r1["added"] == ["lang"] and r1["generation"] == 1
    got = {r.id: (r.name, r.lang) for r in read_evolved(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("b", "en")}


def test_dropped_column_null_fills_new_rows(spark, path):
    evolve_append(spark.createDataFrame([(1, "a")], "id long, name string"), path)
    r = evolve_append(spark.createDataFrame([(2,)], "id long"), path)
    assert r["filled"] == ["name"]
    got = {r.id: r.name for r in read_evolved(spark, path).collect()}
    assert got == {1: "a", 2: None}


def test_widening_int_to_long_across_generations(spark, path):
    evolve_append(spark.createDataFrame([(1, 10)], "id long, v int"), path)
    r = evolve_append(
        spark.createDataFrame([(2, 2**40)], "id long, v long"), path
    )
    assert r["widened"] == [("v", "int", "bigint")]
    df = read_evolved(spark, path)
    # the union schema carries the wider type; the int-generation file
    # up-casts at scan time (no rewrite happened)
    assert df.schema["v"].dataType.simpleString() == "bigint"
    got = {r.id: r.v for r in df.collect()}
    assert got == {1: 10, 2: 2**40}
    # and the narrow-generation file is still physically int32
    assert dataset_schema(spark, path)["v"].dataType.simpleString() == "bigint"


def test_float_to_double_and_stability_of_repeat_appends(spark, path):
    evolve_append(spark.createDataFrame([(1, 1.5)], "id long, x float"), path)
    r = evolve_append(spark.createDataFrame([(2, 2.5)], "id long, x double"), path)
    assert r["widened"] == [("x", "float", "double")]
    # a third append at the original narrow type needs no evolution —
    # the batch up-casts into the established double
    r2 = evolve_append(spark.createDataFrame([(3, 3.5)], "id long, x float"), path)
    assert r2["widened"] == []
    got = {r.id: r.x for r in read_evolved(spark, path).collect()}
    assert got == {1: 1.5, 2: 2.5, 3: 3.5}


def test_incompatible_drift_raises_curated_error(spark, path):
    evolve_append(spark.createDataFrame([(1, 10)], "id long, v int"), path)
    with pytest.raises(ValueError, match="schema evolution conflict on column 'v'"):
        evolve_append(spark.createDataFrame([(2, "x")], "id long, v string"), path)
    # precision-losing int -> double is refused, not coerced
    with pytest.raises(ValueError, match="no lossless widening"):
        evolve_append(spark.createDataFrame([(3, 1.0)], "id long, v double"), path)


def test_sidecar_lost_footer_sweep_recovers_union(spark, path):
    evolve_append(spark.createDataFrame([(1, 10)], "id long, v int"), path)
    evolve_append(
        spark.createDataFrame([(2, 2**40, "en")], "id long, v long, lang string"),
        path,
    )
    os.remove(os.path.join(path, "_evolution_schema.json"))
    df = read_evolved(spark, path)  # footer-sweep fallback
    assert df.schema["v"].dataType.simpleString() == "bigint"
    got = {r.id: (r.v, r.lang) for r in df.collect()}
    assert got == {1: (10, None), 2: (2**40, "en")}


def test_reconcile_rejects_unknown_columns(spark):
    from pyspark.sql import types as T

    df = spark.createDataFrame([(1, "x")], "id long, rogue string")
    target = T.StructType([T.StructField("id", T.LongType(), True)])
    with pytest.raises(ValueError, match="unexpected columns.*rogue"):
        reconcile_to(df, target)


def test_reconcile_refuses_lossy_narrowing(spark):
    from pyspark.sql import types as T

    # df bigint vs target int: _widen resolves to the DF's side, i.e.
    # the cast would truncate — reconcile_to must refuse, not coerce
    df = spark.createDataFrame([(2**40,)], "v long")
    target = T.StructType([T.StructField("v", T.IntegerType(), True)])
    with pytest.raises(ValueError, match="narrower"):
        reconcile_to(df, target)


def test_remote_uri_refused_not_misread_as_absent(spark):
    # an s3:// path must never take the silent first-write branch
    with pytest.raises(NotImplementedError, match="local-filesystem only"):
        dataset_schema(spark, "s3://bucket/corpus")
    with pytest.raises(NotImplementedError, match="local-filesystem only"):
        evolve_append(spark.createDataFrame([(1,)], "id long"), "hdfs://nn/corpus")


def test_sidecar_publishes_before_data_torn_append_safe(spark, path):
    """Crash between sidecar publish and data write: readers see a
    SUPERSET schema (harmless NULL-filled column), never files newer
    than the sidecar."""
    from week4_musemotion_spark.sources.evolution import _publish_union

    evolve_append(spark.createDataFrame([(1, "a")], "id long, name string"), path)
    # a torn append == the sidecar landed, the data never did
    drifted = spark.createDataFrame(
        [(2, "b", "en")], "id long, name string, lang string"
    )
    _publish_union(spark, path, drifted.schema)
    df = read_evolved(spark, path)
    assert [f.name for f in df.schema.fields] == ["id", "name", "lang"]
    assert {r.id: (r.name, r.lang) for r in df.collect()} == {1: ("a", None)}
    # the retry lands under a fresh generation and reads whole
    r = evolve_append(drifted, path)
    assert r["generation"] == 2 and r["added"] == []  # sidecar already knew lang
    got = {r.id: (r.name, r.lang) for r in read_evolved(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("b", "en")}


def test_sidecar_lock_contention_times_out_with_curated_error(spark, path):
    from week4_musemotion_spark.sources.evolution import _publish_union

    evolve_append(spark.createDataFrame([(1,)], "id long"), path)
    lock = os.path.join(path, "_evolution_schema.json.lock")
    with open(lock, "w") as fh:
        fh.write("999999")
    try:
        with pytest.raises(TimeoutError, match="crashed writer"):
            _publish_union(
                spark, path, spark.createDataFrame([(2,)], "id long").schema,
                timeout=0.2,
            )
    finally:
        os.remove(lock)
    # once the stale lock is cleared the append proceeds
    r = evolve_append(spark.createDataFrame([(2,)], "id long"), path)
    assert r["generation"] == 1


def test_concurrent_appends_keep_both_added_columns(spark, path):
    """The lost-update race the lock exists for: two appends adding
    DIFFERENT columns run concurrently; without mutual exclusion the
    last sidecar write would drop the other's column from the
    declared union."""
    import threading

    evolve_append(spark.createDataFrame([(0,)], "id long"), path)
    errs = []

    def appender(col, val):
        try:
            df = spark.createDataFrame([(val, f"x{val}")], f"id long, {col} string")
            evolve_append(df, path)
        except Exception as e:  # pragma: no cover - failure reporter
            errs.append(e)

    ts = [
        threading.Thread(target=appender, args=(c, i + 1))
        for i, c in enumerate(["left_col", "right_col"])
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    got = read_evolved(spark, path)
    assert {"id", "left_col", "right_col"} <= {f.name for f in got.schema.fields}
    rows = {r.id: (r.left_col, r.right_col) for r in got.collect()}
    assert rows == {0: (None, None), 1: ("x1", None), 2: (None, "x2")}


def test_stale_lock_raises_immediately_naming_holder(spark, path):
    """Round-12 advice: a crashed holder's leftover lock used to make
    every appender sit out the FULL timeout; a lock whose mtime is
    older than the timeout must now raise at once, naming the pid."""
    import time

    from week4_musemotion_spark.sources.evolution import _publish_union

    evolve_append(spark.createDataFrame([(1,)], "id long"), path)
    lock = os.path.join(path, "_evolution_schema.json.lock")
    with open(lock, "w") as fh:
        fh.write("424242")
    old = time.time() - 1000
    os.utime(lock, (old, old))
    t0 = time.monotonic()
    try:
        with pytest.raises(TimeoutError, match=r"stale lock.*pid 424242"):
            _publish_union(
                spark, path, spark.createDataFrame([(2,)], "id long").schema,
                timeout=300.0,
            )
    finally:
        os.remove(lock)
    # the point of the check: no 300s wait happened
    assert time.monotonic() - t0 < 30
