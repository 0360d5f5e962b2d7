"""Third-engine replays for the staged r21 statistical kernels.

The staged differential (tests/test_staged_r21.py) proves Spark ==
DuckDB; these tests re-derive each result a THIRD way in plain
Python (hashlib md5, int arithmetic, no SQL at all), so a shared
misreading of the spec between the two SQL engines cannot hide —
the same triangulation discipline the sketch family uses.  Also
pins the frozen Poisson inverse-CDF thresholds against a fresh
60-digit Decimal recomputation, so a typo'd literal fails loudly.
"""

from __future__ import annotations

import hashlib
from decimal import Decimal, getcontext

import duckdb
import pytest

from tests.conftest import SF_SMOKE


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, n_chars FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()


def _h(s: str) -> int:
    """Pure-Python stable_hash64: leading 15 md5 hex digits."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_poisson_thresholds_match_decimal_recomputation():
    from week4_musemotion_spark.queries.staged_r21 import _POIS_T

    getcontext().prec = 60
    fact = 1
    e1 = sum(
        (Decimal(-1) ** k) / Decimal(__import__("math").factorial(k))
        for k in range(60)
    )
    cdf = Decimal(0)
    want = []
    for k in range(8):
        if k > 0:
            fact *= k
        cdf += e1 / fact
        want.append(int(cdf * (1 << 60)))
    assert list(_POIS_T) == want
    # strictly increasing, all inside the 60-bit hash range
    assert all(a < b for a, b in zip(want, want[1:]))
    assert want[-1] < 1 << 60


def test_bootstrap_ci_replayed_in_pure_python(spark):
    from week4_musemotion_spark.queries.registry import REGISTRY
    from week4_musemotion_spark.queries.staged_r21 import _POIS_T, _R, _SEED_BASE

    got = {
        r["source"]: r
        for r in REGISTRY["q_bootstrap_ci"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    rows = _docs()
    per_src: dict[str, list[tuple[int, int]]] = {}
    for doc_id, source, n_chars in rows:
        per_src.setdefault(source, []).append((doc_id, n_chars))
    for source, docs in per_src.items():
        means = []
        for r in range(_R):
            n_r = s_r = 0
            for doc_id, n_chars in docs:
                u = _h(f"{_SEED_BASE + r}:{doc_id}")
                w = sum(1 for t in _POIS_T if u >= t)
                n_r += w
                s_r += w * n_chars
            if n_r > 0:
                means.append((s_r * 1_000_000 // n_r, r))
        means.sort()
        n_reps = len(means)
        lo = means[(25 * n_reps + 999) // 1000 - 1][0]
        hi = means[(975 * n_reps + 999) // 1000 - 1][0]
        n_docs = len(docs)
        mean_e6 = sum(c for _, c in docs) * 1_000_000 // n_docs
        g = got[source]
        assert (g.n_docs, g.mean_e6, g.ci_lo_e6, g.ci_hi_e6, g.n_reps) == (
            n_docs,
            mean_e6,
            lo,
            hi,
            n_reps,
        ), source


def test_ks_drift_replayed_in_pure_python(spark):
    from week4_musemotion_spark.queries.registry import REGISTRY

    got = {
        r["source"]: r
        for r in REGISTRY["q_ks_drift"].builder(spark, SF_SMOKE).collect()
    }
    rows = _docs()
    values = sorted({v for _, _, v in rows})
    sources = sorted({s for _, s, _ in rows})
    n_tot = len(rows)
    for source in sources:
        mine = sorted(v for _, s, v in rows if s == source)
        n_s, n_rest = len(mine), n_tot - len(mine)
        best = None
        for v in values:
            cum_s = sum(1 for x in mine if x <= v)
            cum_all = sum(1 for _, _, x in rows if x <= v)
            d_num = abs(cum_s * n_rest - (cum_all - cum_s) * n_s)
            if best is None or d_num > best[0]:
                best = (d_num, v)
        g = got[source]
        assert (g.n_s, g.n_rest) == (n_s, n_rest)
        assert g.ks_e6 == best[0] * 1_000_000 // (n_s * n_rest)
        assert g.ks_at_value == best[1]


def test_loo_influence_replayed_in_pure_python(spark):
    from week4_musemotion_spark.queries.registry import REGISTRY

    got = {
        r["source"]: r
        for r in REGISTRY["q_loo_influence"].builder(spark, SF_SMOKE).collect()
    }
    rows = _docs()
    n = len(rows)
    s = sum(c for _, _, c in rows)
    for source in {src for _, src, _ in rows}:
        mine = [c for _, src, c in rows if src == source]
        n_s, s_s = len(mine), sum(mine)
        g = got[source]
        assert g.n_docs == n_s
        assert g.share_ppm == n_s * 1_000_000 // n
        assert g.mean_e6 == s_s * 1_000_000 // n_s
        assert g.global_mean_e6 == s * 1_000_000 // n
        assert g.loo_mean_e6 == (s - s_s) * 1_000_000 // (n - n_s)
        assert g.influence_e6 == g.loo_mean_e6 - g.global_mean_e6


@pytest.fixture(autouse=True)
def _register(spark):
    from week4_musemotion_spark.queries import staged_r21  # noqa: F401
