"""Product quantization (PQ) — the standard memory-compression layer
of scale ANN (Jégou, Douze & Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011; FAISS's ``IndexPQ``/``IVFPQ``).

Split each d-dim vector into ``m`` contiguous subvectors, learn a
``k``-centroid codebook per subspace, store each vector as ``m``
small codes (m·log2(k) bits — 32 bits per vector at m=4, k=8 instead
of 64 float64s), and answer queries by ASYMMETRIC distance
computation (ADC): per query, an (m × k) table of exact
query-subvector-to-centroid distances, then each database vector's
distance is ``m`` table lookups summed — no decompression.

Spark shapes (nothing quadratic, nothing driver-bound):

- :func:`pq_fit` — ``m`` independent :func:`~.similarity.kmeans_fit`
  runs over sliced subvector frames (each a linear scan; only the
  (m × k × d/m) codebook tensor reaches the driver).
- :func:`pq_encode` — one Arrow-batched ``mapInPandas`` pass,
  codebooks broadcast; argmin ties break to the LOWEST centroid id
  (numpy argmin's first-occurrence rule — the same rule the
  expression/SQL twin uses, so the two paths are comparable).
- :func:`adc_topk` — queries collected + broadcast (the query set is
  small by contract, same as ``knn_brute_force``), corpus codes
  scanned once, per-partition top-k then global top-k.

Evidence split (the repo's exact-twin pattern): the Lloyd-fitted
path is rows-only (k-means is not SQL-expressible); its
oracle-checked twin is the SEED-codebook encode
(:func:`seed_codebooks` — the k lowest-id vectors' subvectors, no
iteration), which both engines can replay exactly: distances are
sequential-fold float sums (the ``_dot`` discipline) and the argmin
is an ORDER BY (dist, centroid) rank, so ``q_pq_code_hist`` value-
hashes cross-engine.  pytest pins the numpy path AGAINST that
expression path on the same codebooks, closing the loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.vector import double_array_lit


@dataclass(frozen=True)
class PQModel:
    """``codebooks``: (m, k, d/m) float64 — subspace j's centroid c is
    ``codebooks[j, c]``."""

    codebooks: np.ndarray

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def k(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]


def _check_dims(dim: int, m: int) -> int:
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    return dim // m


def seed_codebooks(
    emb: DataFrame, m: int, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> PQModel:
    """Deterministic NON-iterative codebooks: subspace j's codebook is
    the k lowest-``id_col`` vectors' j-th subvectors.  Zero training
    cost, fully SQL-replayable — the oracle-able baseline the fitted
    model is measured against (a fitted codebook must beat this or
    the training is broken; tests/test_pq.py pins that)."""
    from week4_musemotion_spark.operators.similarity import _collect_matrix

    _, X = _collect_matrix(emb.select(id_col, vec_col).orderBy(id_col).limit(k), id_col, vec_col)
    if X.shape[0] < k:
        raise ValueError(f"corpus has {X.shape[0]} rows < k={k} codebook seeds")
    dsub = _check_dims(X.shape[1], m)
    return PQModel(X.reshape(k, m, dsub).transpose(1, 0, 2).copy())


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
) -> PQModel:
    """Lloyd-fitted codebooks: ``m`` independent k-means problems
    solved in FUSED passes — per Lloyd iteration ONE Arrow-batched
    scan assigns every subspace and emits per-batch PARTIAL SUM
    tensors (map-side reduction: ≤ partitions × m × k × d/m tiny
    rows reach the shuffle, never corpus rows), then one small
    aggregate finishes the means.  Semantics per subspace are
    identical to :func:`~.similarity.kmeans_fit` (same lowest-k-id
    seeding, same expand-identity argmin with first-min tie rule,
    empty clusters keep their centroid); only the pass structure
    differs: m separate kmeans runs cost m·(iters+1) corpus jobs,
    the fused fit costs iters+1 regardless of m.  ``fit_fraction``
    fits on a seeded Bernoulli sample (the FAISS train-on-sample
    move), falling back to the full corpus when the sample cannot
    seed ``k`` clusters."""
    import pandas as pd

    from week4_musemotion_spark.operators.similarity import (
        _collect_matrix,
        _to_matrix,
    )
    from week4_musemotion_spark.sources.tables import spread

    if fit_fraction is not None and not 0.0 < fit_fraction <= 1.0:
        raise ValueError(f"fit_fraction must be in (0, 1], got {fit_fraction!r}")
    # NULL vectors carry no information for codebook fitting and would
    # crash the kmeans matrix build — exclude them from the whole fit.
    emb = emb.filter(F.col(vec_col).isNotNull())
    if fit_fraction is not None and fit_fraction < 1.0:
        fit_df = emb.select(id_col, vec_col).sample(fraction=fit_fraction, seed=seed)
    else:
        fit_df = emb
    # Seeds: the k lowest-id vectors, collected ONCE for all m
    # subspaces (the per-subspace seeds are these rows' j-th
    # subvectors — identical to m separate seed collects); the seed
    # matrix doubles as the dimension probe, so no extra first() job.
    _, X = _collect_matrix(
        fit_df.select(id_col, vec_col).orderBy(id_col).limit(k), id_col, vec_col
    )
    if fit_df is not emb and X.shape[0] < k:
        # sample too thin to seed k clusters — fall back to the full
        # corpus (the seeds collect already told us, no extra job)
        fit_df = emb
        _, X = _collect_matrix(
            fit_df.select(id_col, vec_col).orderBy(id_col).limit(k), id_col, vec_col
        )
    if X.shape[0] == 0:
        raise ValueError(
            "pq_fit: no non-null vector found to probe the dimension from"
        )
    dim = X.shape[1]
    dsub = _check_dims(dim, m)
    if X.shape[0] < k:
        raise ValueError(f"corpus has {X.shape[0]} rows < k={k} codebook seeds")
    books = X.reshape(k, m, dsub).transpose(1, 0, 2).copy()
    spark = emb.sparkSession
    scan = spread(fit_df.select(id_col, vec_col))
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(books)

        def _partials(batches):
            cb = bc.value  # (m, k, dsub)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                Xs = _to_matrix(pdf[vec_col]).reshape(len(pdf), m, dsub)
                js, cs, ps, ss, ns = [], [], [], [], []
                for j in range(m):
                    cj = cb[j]
                    # |x|² − 2x·c + |c|²; |x|² constant per row, dropped
                    d = (cj**2).sum(axis=1)[None, :] - 2.0 * (Xs[:, j, :] @ cj.T)
                    a = np.argmin(d, axis=1)  # first min = lowest id
                    for c in np.unique(a):
                        rows = Xs[a == c, j, :]
                        js.extend([j] * dsub)
                        cs.extend([int(c)] * dsub)
                        ps.extend(range(dsub))
                        ss.extend(rows.sum(axis=0).tolist())
                        ns.extend([len(rows)] * dsub)
                yield pd.DataFrame(
                    {"j": js, "cluster": cs, "pos": ps, "s": ss, "n": ns}
                )

        means = (
            scan.mapInPandas(
                _partials, "j int, cluster int, pos int, s double, n long"
            )
            .groupBy("j", "cluster", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new_books = books.copy()  # empty clusters keep their centroid
        for r in means:
            new_books[r["j"], r["cluster"], r["pos"]] = r["s"] / r["n"]
        books = new_books
    return PQModel(books)


def pq_encode(
    emb: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, code)`` rows, ``code`` an m-array of centroid ids —
    one Arrow-batched pass, codebooks broadcast.  Ties in the
    per-subspace argmin break to the lowest centroid id."""
    import pandas as pd

    from week4_musemotion_spark.operators.similarity import _to_matrix
    from week4_musemotion_spark.sources.tables import spread

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(model.codebooks)
    m, k, dsub = model.m, model.k, model.dsub

    def _enc(batches):
        cb = bc.value  # (m, k, dsub)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _to_matrix(pdf[vec_col])
            Xs = X.reshape(len(pdf), m, dsub)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                # |x|^2 - 2 x.c + |c|^2; |x|^2 constant per row, dropped
                d = (cb[j] ** 2).sum(axis=1)[None, :] - 2.0 * Xs[:, j, :] @ cb[j].T
                codes[:, j] = np.argmin(d, axis=1)  # first min = lowest id
            yield pd.DataFrame({id_col: pdf[id_col], "code": list(codes)})

    return spread(emb.select(id_col, vec_col)).mapInPandas(
        _enc, f"{id_col} long, code array<int>"
    )


def adc_topk(
    codes: DataFrame,
    model: PQModel,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: exact query-subvector-to-centroid
    tables (m × k_codebook per query, float64), database distances by
    table lookup over the broadcast tables, per-partition then global
    top-k.  Returns ``(query_id, neighbor_id, rank)`` with rank 1 the
    nearest; ties break to the lowest neighbor id.  ``queries`` is
    collected and broadcast — small by contract, exactly like
    ``knn_brute_force``."""
    import pandas as pd

    from week4_musemotion_spark.operators.similarity import _collect_matrix

    qids, Q = _collect_matrix(queries.select(id_col, vec_col), id_col, vec_col)
    m, kc, dsub = model.m, model.k, model.dsub
    if Q.shape[1] != m * dsub:
        raise ValueError(f"query dim {Q.shape[1]} != model dim {m * dsub}")
    Qs = Q.reshape(len(qids), m, dsub)
    # (n_q, m, k): exact distance from each query subvector to every centroid
    tables = np.stack(
        [
            ((model.codebooks[j][None, :, :] - Qs[:, j, :][:, None, :]) ** 2).sum(axis=2)
            for j in range(m)
        ],
        axis=1,
    )
    spark = codes.sparkSession
    bc = spark.sparkContext.broadcast((qids, tables))

    def _score(batches):
        ids_q, tab = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["code"].to_numpy())  # (n, m)
            n = len(pdf)
            # dist[q, i] = sum_j tab[q, j, C[i, j]]
            dist = np.zeros((len(ids_q), n))
            for j in range(tab.shape[1]):
                dist += tab[:, j, :][:, C[:, j]]
            nb = pdf[id_col].to_numpy()
            # per-partition prune to k per query (global top-k downstream).
            # PQ guarantees exact distance ties (vectors sharing all m codes
            # have identical ADC distance), so the prune must respect the
            # global (dist, neighbor_id) tie law: keep everything strictly
            # under the kk-th distance, then fill from the LOWEST-id members
            # of the cutoff tie group.  O(n) per query row (np.partition +
            # flatnonzero; only the tie group itself is sorted) — a full
            # argsort of the batch, or an id-reorder copy of the whole
            # (n_q x n) matrix, would turn the scan superlinear for no
            # additional correctness.
            kk = min(k, n)
            part = np.empty((len(ids_q), kk), dtype=np.int64)
            if kk == n:
                part[:] = np.arange(n)
            else:
                for qi in range(len(ids_q)):
                    row = dist[qi]
                    v = np.partition(row, kk - 1)[kk - 1]
                    if np.isnan(v):
                        # Fewer than kk finite distances in this batch
                        # (NaN query vector, or a NaN codebook centroid
                        # poisoning some neighbors): NaN compares false
                        # to everything, so the lt/eq selection below
                        # would go empty and drop the real candidates.
                        # Keep EVERY finite candidate (there are < kk),
                        # then fill with the lowest-id NaN rows —
                        # deterministic, and the global window orders
                        # NaN distances last, so finite neighbors win.
                        fin = np.flatnonzero(~np.isnan(row))
                        nanidx = np.flatnonzero(np.isnan(row))
                        nanidx = nanidx[np.argsort(nb[nanidx], kind="stable")]
                        part[qi, : len(fin)] = fin
                        part[qi, len(fin) :] = nanidx[: kk - len(fin)]
                        continue
                    # v finite => at least kk non-NaN distances <= v,
                    # so lt/eq always fill kk here
                    lt = np.flatnonzero(row < v)
                    eq = np.flatnonzero(row == v)
                    eq = eq[np.argsort(nb[eq], kind="stable")]
                    part[qi, : len(lt)] = lt
                    part[qi, len(lt) :] = eq[: kk - len(lt)]
            rows = {
                "query_id": np.repeat(ids_q, kk),
                "neighbor_id": nb[part].ravel(),
                "dist": np.take_along_axis(dist, part, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    scored = codes.mapInPandas(_score, "query_id long, neighbor_id long, dist double")
    from pyspark.sql.window import Window

    # asc_nulls_last: NaN distances cross the Arrow boundary as NULLs,
    # and Spark's default NULLS FIRST would rank NaN-poisoned rows
    # ABOVE every finite neighbor
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc_nulls_last(), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def pq_encode_expr(
    emb: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Expression-only encode: ``(id, j, code)`` long-format rows,
    the per-subspace distances lowered entirely to Catalyst
    expressions — a SEQUENTIAL left-to-right fold per distance (the
    ``_dot`` discipline), so the doubles are bit-identical to a SQL
    oracle's ``list_sum`` replay and the argmin is engine-stable
    (ties to the lowest centroid id via first-match
    ``array_position``).  Use for oracle-checked audits; the numpy
    path (:func:`pq_encode`) is the production kernel, and
    tests/test_pq.py pins the two equal on real data."""
    m, k, dsub = model.m, model.k, model.dsub

    def dist(j: int, c: int):
        cent = double_array_lit(model.codebooks[j, c])
        sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        return F.aggregate(
            F.zip_with(sub, cent, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    rows = []
    for j in range(m):
        dl = F.array(*[dist(j, c) for c in range(k)])
        rows.append(
            F.struct(
                F.lit(j).alias("j"),
                (F.array_position(dl, F.array_min(dl)) - 1).cast("int").alias("code"),
            )
        )
    from week4_musemotion_spark.sources.tables import spread

    # spread: m*k interpreted fold distances per row is expensive
    # per-row work — parallelize above a single-task scan (no-op on
    # wide scans / shuffled frames)
    return spread(emb.select(id_col, vec_col)).select(
        id_col, F.explode(F.array(*rows)).alias("jc")
    ).select(id_col, F.col("jc.j").alias("j"), F.col("jc.code").alias("code"))


def pq_distortion_expr(
    emb: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, j, err_e6)`` — each vector's per-subspace squared
    reconstruction error under its argmin centroid, QUANTIZED to e6
    integers per row (floor(err·1e6 + 0.5)) so any downstream sum is
    partition-order-independent and value-oracle-able.  Same
    sequential-fold/argmin laws as :func:`pq_encode_expr`."""
    m, k, dsub = model.m, model.k, model.dsub

    def dist(j: int, c: int):
        cent = double_array_lit(model.codebooks[j, c])
        sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        return F.aggregate(
            F.zip_with(sub, cent, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    rows = []
    for j in range(m):
        best = F.array_min(F.array(*[dist(j, c) for c in range(k)]))
        rows.append(
            F.struct(
                F.lit(j).alias("j"),
                F.floor(best * 1_000_000 + F.lit(0.5)).cast("long").alias("err_e6"),
            )
        )
    from week4_musemotion_spark.sources.tables import spread

    # spread: same heavy-expression rationale as pq_encode_expr
    return spread(emb.select(id_col, vec_col)).select(
        id_col, F.explode(F.array(*rows)).alias("je")
    ).select(id_col, F.col("je.j").alias("j"), F.col("je.err_e6").alias("err_e6"))
