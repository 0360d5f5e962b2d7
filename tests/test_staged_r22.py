"""Round-22 staged queries (queries/staged_r22.py — not yet imported
by queries/__init__): Spark-vs-DuckDB differential + semantics for
the vacuum/retention certificate."""

from __future__ import annotations

from tests.conftest import staged_diff


def _diff(spark, name, tables):
    from week4_musemotion_spark.queries import staged_r22  # noqa: F401 — registers

    return staged_diff(spark, name, tables)


def test_vacuum_retention_matches_oracle_and_certifies(spark):
    import duckdb

    from tests.conftest import SF_SMOKE

    got = _diff(spark, "q_vacuum_retention", ("documents",))
    # both kept snapshots present, retention constants pinned
    assert sorted(got.version.unique()) == [4, 5]
    assert (got.versions_before == 5).all()
    assert (got.versions_removed == 3).all()
    assert (got.versions_kept == 2).all()
    # the newest snapshot is the FULL table (predicate covers all ids)
    total = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    assert got[got.version == 5].n_docs.sum() == total
    # snapshots are strictly widening slices
    assert got[got.version == 4].n_docs.sum() < total


def test_vacuum_never_removes_latest(spark, tmp_path):
    from week4_musemotion_spark.operators.versioned import (
        list_versions,
        vacuum,
        write_version,
    )

    base = str(tmp_path / "v")
    df = spark.range(5).withColumnRenamed("id", "x")
    write_version(df, base)
    # keep_last=0 still pins the latest version
    assert vacuum(base, keep_last=0) == []
    assert list_versions(base) == [1]
