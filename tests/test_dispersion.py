"""Per-group embedding dispersion (operators/linalg.
embedding_dispersion): DuckDB differential on the closed form,
identity checks, ragged guard."""

from __future__ import annotations

import duckdb
import pytest

from week4_musemotion_spark.operators.linalg import embedding_dispersion

SF = "/root/testdata/sf0.001"

_ORACLE = f"""
WITH q AS (
    SELECT label,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
    FROM '{SF}/embeddings.parquet'
),
dim AS (SELECT max(len(qv)) AS d FROM q),
idx AS (SELECT unnest(range(1, (SELECT d FROM dim) + 1)) AS pos),
per_dim AS (
    SELECT label, i.pos,
           sum(CAST(q.qv[i.pos] AS HUGEINT)) AS sd,
           sum(CAST(q.qv[i.pos] AS HUGEINT) * q.qv[i.pos]) AS s2p,
           count(*) AS np
    FROM q CROSS JOIN idx i GROUP BY label, i.pos
),
g AS (
    SELECT label, sum(s2p) AS s2, sum(sd * sd) AS sumsq_d, max(np) AS n
    FROM per_dim GROUP BY label
)
SELECT label,
       CAST(n AS BIGINT) AS n,
       CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS VARCHAR) AS pairs,
       CAST(CAST(n AS HUGEINT) * s2 - sumsq_d AS VARCHAR) AS ssd,
       CAST(CASE WHEN n > 1 THEN (CAST(n AS HUGEINT) * s2 - sumsq_d)
                                 // (CAST(n * (n - 1) // 2 AS HUGEINT) * 1000000)
            END AS BIGINT) AS msd_e6
FROM g
"""


def test_matches_duckdb_closed_form(spark):
    got = (
        embedding_dispersion(spark.read.parquet(f"{SF}/embeddings.parquet"))
        .toPandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    want = duckdb.sql(_ORACLE).df().sort_values("label").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_closed_form_equals_naive_pairs(spark):
    # 3 tiny vectors, dispersion by hand: q = [(0,0), (1e6,0), (0,2e6)]
    df = spark.createDataFrame(
        [(1, 1, [0.0, 0.0]), (2, 1, [1.0, 0.0]), (3, 1, [0.0, 2.0])],
        "vec_id long, label int, embedding array<float>",
    )
    row = embedding_dispersion(df).collect()[0]
    e = 10**12
    want = (1 * e) + (1 * e + 4 * e) + (4 * e)  # d12+d13+d23 squared dists
    assert row.n == 3 and int(row.pairs) == 3
    assert int(row.ssd) == want
    assert row.msd_e6 == want // (3 * 10**6)


def test_collapsed_group_reads_zero_and_singleton_null(spark):
    df = spark.createDataFrame(
        [(1, 7, [0.25, -0.5]), (2, 7, [0.25, -0.5]), (3, 8, [1.0, 1.0])],
        "vec_id long, label int, embedding array<float>",
    )
    got = {r.label: r for r in embedding_dispersion(df).collect()}
    assert int(got[7].ssd) == 0 and got[7].msd_e6 == 0  # collapsed
    assert int(got[8].pairs) == 0 and got[8].msd_e6 is None  # singleton


def test_msd_denominator_survives_large_groups(spark):
    """Regression (round-12 advice): the msd_e6 denominator
    pairs * 1e6 must be computed in decimal — a long denominator
    wraps silently once a group passes ~4.3M rows.  Simulating 4.3M
    rows directly is too slow for CI, so verify the EXPRESSION by
    checking the physical types: pairs is emitted as a digit string
    and the msd column stays correct on a group big enough that a
    float path would already drift (10k identical + 1 outlier —
    closed form must be exact)."""
    import pandas as pd

    n = 10_001
    pdf = pd.DataFrame(
        {
            "vec_id": range(n),
            "label": [1] * n,
            "embedding": [[0.0, 0.0]] * (n - 1) + [[1.0, 0.0]],
        }
    )
    df = spark.createDataFrame(pdf, "vec_id long, label int, embedding array<float>")
    row = embedding_dispersion(df).collect()[0]
    pairs = n * (n - 1) // 2
    want_ssd = (n - 1) * 10**12  # outlier vs each of the n-1 zeros
    assert int(row.pairs) == pairs
    assert int(row.ssd) == want_ssd
    assert row.msd_e6 == want_ssd // (pairs * 10**6)
    assert isinstance(row.pairs, str)  # digit string, not a wrappable long


def test_ragged_vectors_raise(spark):
    df = spark.createDataFrame(
        [(1, 1, [0.0, 0.0]), (2, 1, [1.0])],
        "vec_id long, label int, embedding array<float>",
    )
    with pytest.raises(Exception, match="ragged"):
        embedding_dispersion(df).collect()
