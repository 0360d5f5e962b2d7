"""Round-20 staged queries (queries/staged_r20.py — not yet imported
by queries/__init__): Spark-vs-DuckDB differential + semantics for
the small-files compaction certificate."""

from __future__ import annotations

import glob
import os

from tests.conftest import staged_diff


def _diff(spark, name, tables):
    from week4_musemotion_spark.queries import staged_r20  # noqa: F401 — registers

    return staged_diff(spark, name, tables)


def test_compact_optimize_matches_oracle(spark):
    got = _diff(spark, "q_compact_optimize", ("documents",))
    assert (got.files_before == 64).all()
    assert (got.files_after == 1).all()


def test_compacted_dataset_really_is_one_file(spark):
    from week4_musemotion_spark.queries.staged_r20 import _compact_fixture

    ds = os.path.join(_compact_fixture(spark, "/root/testdata/sf0.001"), "dataset")
    parts = glob.glob(os.path.join(ds, "*.parquet"))
    assert len(parts) == 1
    # no staging/old debris left behind by the promotion
    assert not os.path.exists(ds + "._staging")
    assert not os.path.exists(ds + "._old")
