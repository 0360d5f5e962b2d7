"""Round-18 staged queries (queries/staged_r18.py — not yet imported
by queries/__init__): Spark-vs-DuckDB differential + semantics for
the lifecycle layer (schema evolution + quarantine ingestion)."""

from __future__ import annotations

import glob
import os

from tests.conftest import staged_diff


def _diff(spark, name, tables):
    from week4_musemotion_spark.queries import staged_r18  # noqa: F401 — registers

    return staged_diff(spark, name, tables)


def test_schema_evolution_read_matches_oracle(spark):
    got = _diff(spark, "q_schema_evolution_read", ("documents",))
    # the dropped-lang generation groups under NULL
    assert got.lang.isna().any()
    assert (got.generations == 2).all()
    # gen0 (every third doc) has no source column value
    assert (got.with_source <= got.n_docs).all()
    assert got.with_source.sum() < got.n_docs.sum()


def test_evolution_fixture_files_span_physical_types(spark):
    """The dataset really holds MIXED physical schemas (int32 and
    int64 n_chars files) — the read is an up-cast, not a rewrite."""
    import pyarrow.parquet as pq

    from week4_musemotion_spark.queries.staged_r18 import _evolution_fixture

    ds = os.path.join(_evolution_fixture(spark, "/root/testdata/sf0.001"), "dataset")
    types = set()
    for f in glob.glob(os.path.join(ds, "*.parquet")):
        s = pq.ParquetFile(f).schema_arrow
        if "n_chars" in s.names:
            types.add(str(s.field("n_chars").type))
    assert types == {"int32", "int64"}


def test_quarantine_split_matches_oracle_and_loses_nothing(spark):
    import duckdb

    from tests.conftest import SF_SMOKE

    got = _diff(spark, "q_quarantine_split", ("documents",))
    con = duckdb.connect()
    total = con.execute(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    # zero loss: every line is in exactly one lane
    assert got.n_clean.sum() + got.n_bad.iloc[0] == total
    assert got.n_bad.iloc[0] > 0  # the fixture really planted breakage
