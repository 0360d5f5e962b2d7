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


def test_null_and_ragged_embeddings_fail_loudly(spark):
    """Round-12 advice: a null vec used to raise a raw TypeError on
    the seed row and be SILENTLY never-selected elsewhere; both must
    now produce a curated error naming the column."""
    # null on the seed (min-id) row -> driver-side curated ValueError
    df_seed_null = spark.createDataFrame(
        [(1, None), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="null 'embedding'.*seed"):
        k_center_select(df_seed_null, 2)
    # null on a non-seed row -> distributed assert, not silence
    df_mid_null = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="null or ragged"):
        k_center_select(df_mid_null, 2)
    # ragged row -> same guard (zip_with pads with null)
    df_ragged = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="null or ragged"):
        k_center_select(df_ragged, 2)


def test_assignment_null_embedding_fails_loudly(spark):
    """A null/ragged vector nulls d2; Spark's NULLS-FIRST asc sort
    would silently 'assign' the row to an arbitrary center."""
    centers = spark.createDataFrame(
        [(100, [0.0, 0.0])], "center_id long, embedding array<float>"
    )
    rows = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="null or ragged"):
        assign_to_centers(rows, centers).collect()


def test_dist2_exact_beyond_long_component_square(spark):
    """Round-12 advice: dec((a-b)*(a-b)) squared in LONG first, so a
    quantized component diff past ~3.0e9 (raw |x| over ~3037) wrapped
    silently.  4000 raw units quantize to 4e9; the squared distance
    per dim is 1.6e19 > 2^63 — must come out exact, not wrapped."""
    df = spark.createDataFrame(
        [(1, [-2000.0, 0.0]), (2, [2000.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = k_center_select(df, 2)
    assert got[1]["radius_num"] == (4000 * 10**6) ** 2
    centers = spark.createDataFrame(
        [(1, [-2000.0, 0.0])], "center_id long, embedding array<float>"
    )
    asg = {r.vec_id: r.dist2_num for r in assign_to_centers(df, centers).collect()}
    assert int(asg[2]) == (4000 * 10**6) ** 2
