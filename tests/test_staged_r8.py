"""Round-8 staged queries (queries/staged_r8.py — not yet imported
by queries/__init__): full Spark-vs-DuckDB differential checks here,
so activation ships with evidence already in hand."""

from __future__ import annotations

import duckdb
import pandas as pd

from tests.conftest import SF_SMOKE

TABLES = ("documents", "lineitem", "part")


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _diff(spark, name):
    from week4_musemotion_spark.queries import staged_r8  # noqa: F401 — registers
    from week4_musemotion_spark.queries.registry import REGISTRY

    spec = REGISTRY[name]
    got = spec.builder(spark, SF_SMOKE).toPandas()
    want = _oracle(spec.oracle)
    assert sorted(got.columns) == sorted(want.columns), (got.columns, want.columns)
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w), (name, len(g), len(w))
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    return got


def test_dup_span_coverage_matches_oracle(spark):
    got = _diff(spark, "q_dup_span_coverage")
    assert len(got) == 20, "one row per source"
    assert (got.dup_spans <= got.n_spans).all()
    assert got.coverage_ppm.between(0, 1_000_000).all()
    # planted near-dups must register as duplicated spans somewhere
    assert got.dup_spans.sum() > 0


def test_bloom_fp_audit_matches_oracle(spark):
    got = _diff(spark, "q_bloom_fp_audit")
    assert (got.outcome != "lost_true_key").all(), "bloom dropped a true key"
    small, big = got[got.num_bits == 64], got[got.num_bits == 32768]
    # saturated end exhibits FPs; provisioned end actually prunes
    assert small[small.outcome == "false_positive"].n_keys.sum() > 0
    assert big[big.outcome == "pruned"].n_keys.sum() > 0
    # fp KEY count is monotone non-increasing in bitmap size
    fp = got[got.outcome == "false_positive"].set_index("num_bits").n_keys
    fps = [fp.get(b, 0) for b in (64, 512, 4096, 32768)]
    assert all(a >= b for a, b in zip(fps, fps[1:])), fps
    # every size sees every true key as a hit
    hit = got[got.outcome == "hit"].set_index("num_bits").n_keys
    assert hit.nunique() == 1
