"""Versioned snapshots (operators/versioned.py): write/list/read/
vacuum lifecycle, time travel, and crash-garbage handling."""

from __future__ import annotations

import os

import pytest


def test_version_lifecycle_and_time_travel(spark, tmp_path):
    from week4_musemotion_spark.operators.versioned import (
        list_versions,
        read_version,
        vacuum,
        write_version,
    )

    base = str(tmp_path / "tbl")
    for i in (1, 2, 3):
        n = write_version(spark.range(i * 10).withColumnRenamed("id", "x"), base)
        assert n == i
    assert list_versions(base) == [1, 2, 3]
    # time travel: every retained version readable, latest by default
    assert read_version(spark, base, 1).count() == 10
    assert read_version(spark, base, 2).count() == 20
    assert read_version(spark, base).count() == 30
    # vacuum retains the newest two
    assert vacuum(base, keep_last=2) == [1]
    assert list_versions(base) == [2, 3]
    with pytest.raises(FileNotFoundError):
        read_version(spark, base, 1)
    # vacuum never removes the last version
    assert vacuum(base, keep_last=0) == [2]
    assert list_versions(base) == [3]


def test_uncommitted_versions_invisible_and_cleaned(spark, tmp_path):
    from week4_musemotion_spark.operators.versioned import (
        list_versions,
        read_version,
        write_version,
    )

    base = str(tmp_path / "tbl")
    write_version(spark.range(5), base)
    # simulate a crashed writer: directory without _SUCCESS
    crashed = os.path.join(base, "v_00002")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-junk.parquet"), "w") as fh:
        fh.write("garbage")
    assert list_versions(base) == [1]
    assert read_version(spark, base).count() == 5
    # next write cleans the garbage and takes the number
    n = write_version(spark.range(7), base)
    assert n == 2
    assert read_version(spark, base, 2).count() == 7
