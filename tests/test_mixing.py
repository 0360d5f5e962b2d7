"""operators/mixing + ranks.with_global_cumsum: distributed-vs-window
equivalence, mixture maths, and budget boundary behavior."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_global_cumsum_matches_single_window(spark):
    """The two-pass distributed cumsum must equal SUM() OVER (ORDER
    BY ...) exactly, including across range-partition boundaries
    (many partitions forced so offsets really compose)."""
    from week4_musemotion_spark.operators.ranks import with_global_cumsum

    df = spark.range(0, 997).select(
        F.col("id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(101))).alias("v"),
    )
    got = with_global_cumsum(df, ["id"], "v", "cum", num_partitions=13)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(map(tuple, got.select("id", "cum").collect())) == sorted(
        map(tuple, want.select("id", "cum").collect())
    )


def test_temperature_rebalance_flattens_skew(spark):
    """Acceptance follows min(1, sqrt(n_min/n_s)): the smallest group
    keeps everything; a group 4x the size keeps ~half; realized keep
    counts land near n_s * accept (hash-uniformity, loose bound)."""
    from week4_musemotion_spark.operators.mixing import temperature_rebalance

    rows = [(i, "big") for i in range(4000)] + [(i + 10_000, "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, g string")
    out = temperature_rebalance(df, "g", "k")
    acc = {r["g"]: r["accept_e4"] for r in out.select("g", "accept_e4").distinct().collect()}
    assert acc["small"] == 10_000
    assert acc["big"] == math.floor(10_000 * math.sqrt(1000 / 4000))  # 5000
    kept = {r["g"]: r["cnt"] for r in out.groupBy("g").agg(F.count("*").alias("cnt")).collect()}
    assert kept["small"] == 1000
    assert abs(kept["big"] - 2000) < 200  # hash-Bernoulli tolerance
    # determinism: a second run is row-identical
    again = temperature_rebalance(df, "g", "k")
    assert sorted(r["k"] for r in out.collect()) == sorted(r["k"] for r in again.collect())


def test_token_budget_boundary_inclusive(spark):
    """Docs are taken in (quality desc, id) order; the last kept doc
    is the one whose INCLUSIVE cumsum still fits the budget, and the
    next-ranked doc would overflow it."""
    from week4_musemotion_spark.operators.mixing import select_token_budget

    df = spark.createDataFrame(
        [(1, 40, 900), (2, 40, 800), (3, 40, 700), (4, 40, 600), (5, 40, 500)],
        "doc_id long, n_tokens long, quality_e4 long",
    )
    got = select_token_budget(df, budget=100)
    rows = {r["doc_id"]: r["cum_tokens"] for r in got.collect()}
    assert rows == {1: 40, 2: 80}  # doc 3 would reach 120 > 100


def test_deterministic_shuffle_is_permutation_and_stable(spark):
    from week4_musemotion_spark.operators.mixing import deterministic_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = deterministic_shuffle(df, "k")
    pos = [r["pos"] for r in a.orderBy("k").collect()]
    assert sorted(pos) == list(range(500))  # a true permutation
    b = deterministic_shuffle(df, "k")
    assert a.orderBy("k").collect() == b.orderBy("k").collect()
    # and it is not the identity order (hash actually shuffles)
    assert pos != list(range(500))


def test_curriculum_order_rejects_stage_collision(spark):
    """A pre-existing column named like the stage output must raise
    (two identically-named columns would poison every downstream
    reference) — and stage_out_col reroutes the name cleanly."""
    import pytest

    from pyspark.sql import functions as F

    from week4_musemotion_spark.operators.mixing import curriculum_order

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("stage")
    )
    with pytest.raises(ValueError, match="stage"):
        curriculum_order(df, F.col("stage"), "doc_id")
    out = curriculum_order(df, F.col("stage"), "doc_id", stage_out_col="cur_stage")
    assert out.columns.count("cur_stage") == 1 and "pos" in out.columns
    assert out.count() == 10
