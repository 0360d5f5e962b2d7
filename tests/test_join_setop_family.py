"""Semantic invariants for the join/set-op family completions
(q_full_outer_join, q_cross_join, q_intersect_all, q_except_all).

The oracle harness already checks value parity vs DuckDB; these tests
pin the *bag/outer semantics* that a hash compare alone would not
explain if it broke (e.g. full-outer silently degrading to left)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from week4_musemotion_spark.queries import REGISTRY


def _run(spark, name):
    return REGISTRY[name].builder(spark, SF_SMOKE)


def test_full_outer_preserves_both_sides(spark):
    df = _run(spark, "q_full_outer_join").cache()
    try:
        left_only = df.filter(F.col("n_nationkey").isNull()).count()
        right_only = df.filter(F.col("c_custkey").isNull()).count()
        matched = df.filter(
            F.col("c_custkey").isNotNull() & F.col("n_nationkey").isNotNull()
        ).count()
        # customer is filtered to custkey%4==0 over nationkeys 0..24 while
        # nation keeps only n_regionkey>=2: both unmatched classes must exist.
        assert left_only > 0, "unmatched customers must survive"
        assert right_only + matched > 0
        assert df.count() == left_only + right_only + matched
    finally:
        df.unpersist()


def test_cross_join_is_cartesian(spark):
    from week4_musemotion_spark.sources.tables import load_table

    df = _run(spark, "q_cross_join")
    r = load_table(spark, SF_SMOKE, "region").count()
    n = load_table(spark, SF_SMOKE, "nation").count()
    assert df.count() == r * n


def test_intersect_except_all_multiplicity(spark):
    """min/max-of-multiplicity law: for every key,
    |A ∩all B| = min(a, b) and |A \\all B| = a - min(a, b)."""
    inter = (
        _run(spark, "q_intersect_all").groupBy("o_custkey").count().withColumnRenamed("count", "i")
    )
    exc = (
        _run(spark, "q_except_all").groupBy("o_custkey").count().withColumnRenamed("count", "e")
    )
    from week4_musemotion_spark.sources.tables import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    a = (
        o.filter(F.col("o_totalprice") > 300000.0)
        .groupBy("o_custkey")
        .count()
        .withColumnRenamed("count", "a")
    )
    b = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .count()
        .withColumnRenamed("count", "b")
    )
    law = (
        a.join(b, "o_custkey", "left")
        .na.fill({"b": 0})
        .join(inter, "o_custkey", "left")
        .na.fill({"i": 0})
        .join(exc, "o_custkey", "left")
        .na.fill({"e": 0})
        .withColumn("want_i", F.least("a", "b"))
        .withColumn("want_e", F.col("a") - F.least("a", "b"))
    )
    bad = law.filter((F.col("i") != F.col("want_i")) | (F.col("e") != F.col("want_e"))).count()
    assert bad == 0
