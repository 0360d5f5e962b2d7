"""Manifest-driven partitioned corpus export (sinks.export_with_manifest
/ verify_export): the writer twin of the q_data_card manifest."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _card(df):
    return df.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_sum"),
    )


def test_export_roundtrip_and_tamper_detection(spark, tmp_path):
    from week4_musemotion_spark.sources.tables import load_table
    from week4_musemotion_spark.sources.sinks import export_with_manifest, verify_export

    d = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "corpus")
    export_with_manifest(d, out, _card)

    # layout: one directory family per shard, manifest published
    assert (tmp_path / "corpus" / "_manifest").is_dir()
    assert any((tmp_path / "corpus").glob("source=*/lang=*"))

    # value round-trip: re-read equals the original, column-for-column
    back = spark.read.parquet(out).select(*d.columns)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))

    # clean export verifies clean
    assert verify_export(spark, out, _card).count() == 0

    # tamper: drop one shard directory -> exactly its manifest rows flag
    shard = next((tmp_path / "corpus").glob("source=*"))
    n_langs = len(list(shard.glob("lang=*")))
    shutil.rmtree(shard)
    bad = verify_export(spark, out, _card).collect()
    assert len(bad) == n_langs
    assert all(r["actual_n_docs"] is None for r in bad)
    src_val = shard.name.split("=", 1)[1]
    assert all(r["source"] == src_val for r in bad)
