"""PCA / gram operators: the float path is pinned against a full
numpy recomputation (the eigensolve is not SQL-expressible, so this
is its oracle), the exact path against hand-built integer moments."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _load_np(spark):
    pdf = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    return pdf, X


def test_gram_exact_matches_integer_moments(spark):
    from week4_musemotion_spark.operators.linalg import gram_exact

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    _, X = _load_np(spark)
    # int64 BEFORE object: astype(object) on the float array would
    # keep floats, and the reference products pass 2^53 within ~2x of
    # the current fixture size
    q = np.floor(X * 1e6 + 0.5).astype(np.int64).astype(object)
    n, d = q.shape
    sxy = q.T @ q
    sx = q.sum(axis=0)
    ref = {
        (i + 1, j + 1): int(n * sxy[i, j] - sx[i] * sx[j])
        for i in range(d)
        for j in range(i, d)
    }
    for parts in (None, 7):
        df = emb if parts is None else emb.repartition(parts)
        rows = gram_exact(df, "embedding").collect()
        assert len(rows) == d * (d + 1) // 2
        assert all(r.n == n for r in rows)
        got = {(r.i, r.j): int(r.cov_num) for r in rows}
        assert got == ref, parts


def test_gram_exact_ragged_raises(spark):
    from week4_musemotion_spark.operators.linalg import gram_exact

    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4, 0.5])], "id long, embedding array<double>"
    )
    # within one partition: the kernel raises.  repartition(32, lit(0))
    # colocates both rows in one of 32 partitions AND keeps the
    # operator's spread() a no-op (32 partitions already ≥ target), so
    # this pins the in-kernel check, not the cross-partition guard
    with pytest.raises(Exception, match="ragged"):
        gram_exact(df.repartition(32, F.lit(0)), "embedding").collect()
    # across partitions (spread redistributes the 2 rows): the
    # count-row dim tags disagree and the raise_error guard fires
    with pytest.raises(Exception, match="ragged|disagree on embedding dim"):
        gram_exact(df.repartition(2, "id"), "embedding").collect()


def test_pca_fit_matches_numpy_eigh(spark):
    from week4_musemotion_spark.operators.linalg import pca_fit

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    _, X = _load_np(spark)
    cov = np.cov(X.T)  # n-1 denominator, matches pca_fit
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    m = pca_fit(emb.repartition(5), "embedding", k=8)
    assert np.allclose(m.eigvals, w[order], rtol=1e-9)
    # eigenvectors match up to the fixed sign convention
    for r in range(8):
        ref = v[:, order[r]]
        dot = abs(float(np.dot(m.components[r], ref)))
        assert dot == pytest.approx(1.0, abs=1e-9), r
        j = int(np.argmax(np.abs(m.components[r])))
        assert m.components[r, j] > 0, "sign convention"
    assert np.allclose(m.mean, X.mean(axis=0), rtol=1e-12)
    assert (np.diff(m.eigvals) <= 1e-15).all(), "descending eigvals"
    assert 0 < m.explained.sum() <= 1 + 1e-12


def test_pca_project_and_whiten(spark):
    from week4_musemotion_spark.operators.linalg import pca_fit, pca_project

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    m = pca_fit(emb, "embedding", k=6)
    proj = pca_project(emb, m, "embedding", whiten=True)
    assert proj.columns == ["vec_id", "label", "proj"]
    pdf = proj.toPandas().sort_values("vec_id")
    Y = np.array([np.asarray(v) for v in pdf.proj])
    assert Y.shape[1] == 6
    C = np.cov(Y.T)
    assert np.allclose(C, np.eye(6), atol=1e-6), "whitened covariance is identity"
    # un-whitened projection matches the direct numpy transform
    _, X = _load_np(spark)
    ref = (X - m.mean) @ np.asarray(m.components).T
    got = np.array(
        [np.asarray(v) for v in pca_project(emb, m, "embedding").toPandas()
         .sort_values("vec_id").proj]
    )
    assert np.allclose(got, ref, atol=1e-12)


def test_pca_fit_validates(spark):
    from week4_musemotion_spark.operators.linalg import pca_fit

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(emb, "embedding", k=0)
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(emb, "embedding", k=65)
    with pytest.raises(ValueError, match="empty"):
        pca_fit(
            spark.createDataFrame([], "embedding array<double>"), "embedding", k=2
        )


def test_rp_project_matches_numpy_and_nests(spark):
    """rp_project == sequential-fold numpy recompute; smaller-dim
    matrices are row prefixes (the one-pass grid contract)."""
    import numpy as np

    from week4_musemotion_spark.operators.linalg import rp_project, rp_signs

    rows = [(i, [float(np.sin(i * 17 + k)) for k in range(6)]) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    signs = rp_signs(6, 4, seed=3)
    got = {
        r.id: r.y
        for r in df.select("id", rp_project("v", signs).alias("y")).collect()
    }
    S = np.array(signs, dtype=np.float64)
    for i, v in rows:
        want = []
        for j in range(4):
            acc = 0.0
            for k in range(6):  # left-to-right fold, like the engine
                acc += v[k] * S[j, k]
            want.append(acc)
        assert got[i] == want, i  # bit-exact
    # determinism + nesting
    assert rp_signs(6, 2, seed=3) == signs[:2]
    assert rp_signs(6, 4, seed=3) == signs
    assert rp_signs(6, 4, seed=4) != signs
