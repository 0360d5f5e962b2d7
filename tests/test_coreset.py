"""Greedy k-center coreset selection (operators/coreset.py): exact
agreement with a sequential reference, invariants, and assignment."""

from __future__ import annotations

import numpy as np
import pytest

from week4_musemotion_spark.operators.coreset import (
    assign_to_centers,
    k_center_select,
)

SF = "/root/testdata/sf0.001"


def _load_ref(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    Q = np.floor(
        np.array([r.embedding for r in rows], dtype=np.float64) * 1_000_000 + 0.5
    ).astype(object)
    order = np.argsort(ids)
    return ids[order], Q[order]


def _ref_k_center(ids, Q, k):
    """Sequential reference with the operator's exact contract:
    min-id seed, integer squared distances, argmax ties to min id."""
    sel = [0]  # ids sorted ascending -> index 0 is the min id
    radii = [None]
    mind = np.full(len(ids), None, dtype=object)
    for _ in range(1, k):
        c = Q[sel[-1]]
        d = ((Q - c) ** 2).sum(axis=1)  # object ints: exact
        mind = d if mind[0] is None else np.minimum(mind, d)
        cand = [i for i in range(len(ids)) if i not in sel]
        best = max(cand, key=lambda i: (mind[i], -ids[i]))
        sel.append(best)
        radii.append(int(mind[best]))
    return [int(ids[i]) for i in sel], radii


def test_selection_matches_sequential_reference(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = k_center_select(emb, 6)
    ids, Q = _load_ref(spark)
    want_ids, want_radii = _ref_k_center(ids, Q, 6)
    assert [s["id"] for s in got] == want_ids
    assert [s["radius_num"] for s in got] == want_radii


def test_radii_non_increasing_and_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = k_center_select(emb.repartition(7), 5)
    b = k_center_select(emb.repartition(2), 5)
    assert a == b  # partitioning cannot perturb the selection
    radii = [s["radius_num"] for s in a[1:]]
    assert all(x >= y for x, y in zip(radii, radii[1:]))


def test_assignment_covers_everything_at_selected_radius(spark):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sel = k_center_select(emb, 5)
    chosen = [s["id"] for s in sel]
    centers = emb.filter(F.col("vec_id").isin(chosen)).select(
        F.col("vec_id").alias("center_id"), "embedding"
    )
    asg = assign_to_centers(emb, centers)
    n = emb.count()
    assert asg.count() == n  # every row assigned exactly once
    # centers assign to themselves at distance 0
    self_rows = {r.vec_id: (r.center_id, r.dist2_num) for r in asg.collect()}
    for cid in chosen:
        assert self_rows[cid] == (cid, "0")
    # realized coverage radius: had we selected ONE MORE center, its
    # radius would be the max assigned distance — so every assigned
    # distance is <= the would-be round-5 radius, and the greedy
    # guarantee says the last selected radius bounds it within 2x in
    # metric space; here we check the direct invariant instead: the
    # max assigned dist equals the next pick's min-distance.
    more = k_center_select(emb, 6)
    next_radius = more[5]["radius_num"]
    max_assigned = max(int(v) for _, v in self_rows.values())
    assert max_assigned == next_radius


def test_small_and_degenerate_inputs(spark):
    df = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [0.0, 0.0]), (12, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    got = k_center_select(df, 3)
    # seed = min id (10); farthest = (3,4) at 25e12; duplicate last
    assert [s["id"] for s in got] == [10, 12, 11]
    assert got[1]["radius_num"] == 25 * 10**12
    assert got[2]["radius_num"] == 0
    # k larger than n stops early
    assert len(k_center_select(df, 9)) == 3
    with pytest.raises(ValueError, match="k must be"):
        k_center_select(df, 0)
