"""Streaming fuzzy entity resolution against a static registry."""

from __future__ import annotations


def test_stream_resolves_dirty_names_to_registry(spark, tmp_path):
    import pyspark.sql.functions as F

    from week4_musemotion_spark.streaming.resolve import resolve_with_sink

    # registry names are mutually >= 3 edits apart (triple-letter
    # blocks), so each arrival has exactly one candidate truth
    registry = spark.createDataFrame(
        [(i, f"record-{chr(65 + i) * 3}-tail") for i in range(26)],
        "reg_id long, reg_name string",
    )
    # arriving records: one deletion, one insertion, one exact, one garbage
    arrivals = [
        (100, "record-DDDtail"),      # deletion of '-'  -> reg_id 3
        (101, "record-HHH-ttail"),    # insertion        -> reg_id 7
        (102, "record-LLL-tail"),     # exact            -> reg_id 11
        (103, "zzzzzzzz"),            # no match within distance 1
    ]
    import glob
    import shutil

    src = tmp_path / "arrivals"
    src.mkdir()
    stage = tmp_path / "stage"
    spark.createDataFrame(arrivals, "rec_id long, name string").coalesce(1).write.parquet(
        str(stage)
    )
    # the file stream source lists FLAT files, not nested dirs
    shutil.copy(glob.glob(str(stage / "part-*.parquet"))[0], src / "b1.parquet")

    stream = spark.readStream.schema("rec_id long, name string").parquet(str(src))
    got: dict[int, list] = {}

    def sink(df, batch_id):
        for r in df.collect():
            got.setdefault(r.rec_id, []).append((r.reg_id, r.dist))

    q = resolve_with_sink(stream, registry, "name", "reg_name", sink)
    q.awaitTermination()

    assert got[100] == [(3, 1)]
    assert got[101] == [(7, 1)]
    assert got[102] == [(11, 0)]
    assert 103 not in got  # garbage resolves to nothing
    # exactly one row per (record, registry) match — variant-key
    # multiplicity collapsed per batch
    assert all(len(v) == 1 for v in got.values())


def test_resolve_stream_plan_is_stateless(spark, tmp_path):
    """The raw resolve join must carry NO stateful streaming operator
    (no state store): each record resolves independently, so a
    restart can never lose or duplicate state it doesn't have."""
    from week4_musemotion_spark.streaming.resolve import resolve_stream

    registry = spark.createDataFrame([(1, "abc")], "reg_id long, reg_name string")
    import glob
    import shutil

    src = tmp_path / "arrivals2"
    src.mkdir()
    stage2 = tmp_path / "stage2"
    spark.createDataFrame([(1, "abd")], "rec_id long, name string").coalesce(1).write.parquet(
        str(stage2)
    )
    shutil.copy(glob.glob(str(stage2 / "part-*.parquet"))[0], src / "b1.parquet")
    stream = spark.readStream.schema("rec_id long, name string").parquet(str(src))
    q = (
        resolve_stream(stream, registry, "name", "reg_name")
        .writeStream.format("memory")
        .queryName("t_resolve_raw")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("t_resolve_raw").count() >= 1
    assert not q.lastProgress.stateOperators  # EMPTY: stateless plan
