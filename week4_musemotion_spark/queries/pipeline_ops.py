"""Pipeline-utility queries: deterministic hash sampling / splits and
one-pass data profiling — the reproducibility and hygiene layer of a
training-data pipeline, oracle-checked like everything else."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from week4_musemotion_spark.functions.hashing import stable_hash64_sql
from week4_musemotion_spark.operators.profiling import profile
from week4_musemotion_spark.operators.sampling import GRANULARITY, hash_sample
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

_BUCKET_SQL = f"({stable_hash64_sql('CAST(o_orderkey AS VARCHAR)')} % {GRANULARITY})"


@query(
    "q_hash_sample",
    covers=("X-SAMPLE",),
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE {_BUCKET_SQL} < 100
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample keyed on the order key — membership
    is a pure function of the key (stable across re-runs, engines,
    and repartitioning; ``df.sample``'s per-partition RNG is none of
    those), which is what makes train/test splits leak-proof."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return hash_sample(o, "o_orderkey", 0.10)


@query(
    "q_profile",
    covers=("X-PROFILE",),
    oracle="""
    SELECT 'l_quantity' AS column, count(*) AS n_rows,
           count(*) - count(l_quantity) AS n_nulls,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(min(l_quantity) AS DOUBLE) AS min_value,
           CAST(max(l_quantity) AS DOUBLE) AS max_value
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag), NULL, NULL
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
           count(DISTINCT l_extendedprice),
           CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE)
    FROM lineitem
    """,
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile (rows/nulls/distincts/min/max)
    over a lineitem projection — the ingest hygiene report."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_returnflag", "l_extendedprice"
    )
    return profile(li)
