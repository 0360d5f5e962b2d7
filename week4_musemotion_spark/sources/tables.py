"""Parquet loaders for the driver testdata star schema (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from week4_musemotion_spark.schemas import TESTDATA_TABLES
from week4_musemotion_spark.session import ensure_runtime_conf

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one testdata table.

    Plain ``spark.read.parquet`` so Catalyst keeps full pushdown /
    pruning freedom — callers express filters and projections
    declaratively and the scan narrows itself.  Runtime-settable
    semantic configs are ensured first so the engine behaves the same
    on a SparkSession it did not build (see session.RUNTIME_CONF).
    """
    ensure_runtime_conf(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names or TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register testdata tables as temp views for the SQL entry path.

    ``createOrReplaceTempView`` is metadata-only: each view is a lazy
    plan over the parquet scan, not a materialization.
    """
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Round-robin repartition to ``defaultParallelism`` when the
    input has too few partitions to parallelize CPU-heavy downstream
    work (shingling, hashing, Arrow kernels).

    Why: a single-file/single-row-group parquet scan is ONE task no
    matter the split knobs (splits beyond the row-group start are
    empty — SCALING.md round-4 note), so an expensive lineage above
    it inherits single-threaded execution right up to the first
    shuffle; worse, the shuffle WRITE of the exploded stream is also
    that one task.  Redistributing the small pre-explosion rows first
    costs one trivial shuffle and lets every core work (measured 8×
    on sf0.1 shingle hashing).  At production scale (many files /
    row groups) the scan is already wide and this is a no-op — the
    conditional keeps it from adding exchanges where parallelism
    exists."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df
