"""Scale-mechanics tests: salted joins preserve semantics; bucketed
tables join without a shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    from week4_musemotion_spark.operators.skew import salted_join

    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    n = spark.read.parquet(f"{SF_SMOKE}/nation.parquet").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    plain = c.join(n, "c_nationkey").select("c_custkey", "n_name")
    salted = salted_join(c, n, on="c_nationkey").select("c_custkey", "n_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    from week4_musemotion_spark.operators.skew import salted_join

    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    n = (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .filter(F.col("n_regionkey") < 2)
        .withColumnRenamed("n_nationkey", "c_nationkey")
    )
    plain = c.join(n, "c_nationkey", "left").select("c_custkey", "n_name")
    salted = salted_join(c, n, on="c_nationkey", how="left").select("c_custkey", "n_name")
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_bucketed_join_has_no_exchange(spark):
    from week4_musemotion_spark.plans.audit import plan_string
    from week4_musemotion_spark.sources.sinks import write_bucketed_table

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    write_bucketed_table(li.select("l_orderkey", "l_quantity"), "t_li_b", "l_orderkey", 8)
    write_bucketed_table(o.select("o_orderkey", "o_totalprice"), "t_o_b", "o_orderkey", 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale the planner prefers broadcast (which disables
        # bucketed reads); force the merge path a 100 TB fact⋈fact
        # join would take
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("t_li_b")
        b = spark.table("t_o_b")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        # co-bucketed sides: the join plans without any shuffle Exchange
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_o_b")
