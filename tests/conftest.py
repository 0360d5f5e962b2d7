from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from week4_musemotion_spark.session import get_spark

    spark = get_spark("pytest", master="local[4]")
    yield spark
    spark.stop()


def staged_oracle(sql: str, tables: tuple[str, ...]) -> "pandas.DataFrame":  # noqa: F821
    """DuckDB oracle run for a staged (not-yet-registered) query:
    views over the smoke-SF parquet tables, one connection per call."""
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def staged_diff(spark, name: str, tables: tuple[str, ...]):
    """Spark-vs-DuckDB differential for a staged registry query:
    same column set, same row count, order-insensitive value
    equality.  Returns the Spark result for extra asserts.  The
    staged module must already be imported (registration side
    effect)."""
    import pandas as pd

    from week4_musemotion_spark.queries.registry import REGISTRY

    spec = REGISTRY[name]
    got = spec.builder(spark, SF_SMOKE).toPandas()
    want = staged_oracle(spec.oracle, tables)
    assert sorted(got.columns) == sorted(want.columns), (got.columns, want.columns)
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w), (name, len(g), len(w))
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    return got
