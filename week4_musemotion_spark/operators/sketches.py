"""Approximate sketches — the constant-memory summaries that replace
exact operators when 100 TB won't fit a hash table.

- :func:`approx_distinct_by` — HyperLogLog++ distinct counts
  (builtin ``approx_count_distinct``): O(1) state per group vs the
  exact count-distinct's shuffle of every distinct value.
- :func:`approx_quantiles` — Greenwald-Khanna quantile sketch
  (builtin ``approx_percentile``): mergeable, bounded error.
- :func:`frequent_values` — heavy hitters by grouped count with a
  minimum support threshold: the exact small-scale stand-in for a
  count-min/space-saving sketch, with the same output contract
  (value, count ≥ support) so a sketch can swap in behind it.

Approximation is run-deterministic (same data + partitioning → same
sketch) but NOT engine-portable, so these ship with tolerance tests
rather than DuckDB value oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, relative
    standard deviation ``rsd``)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct")
    )


def approx_quantiles(
    df: DataFrame, value_col: str, probabilities: list[float], accuracy: int = 10_000
) -> DataFrame:
    """Approximate quantiles of a numeric column (one row, one array
    column ``quantiles`` aligned with ``probabilities``)."""
    probs = F.array(*[F.lit(p) for p in probabilities])
    return df.agg(
        F.percentile_approx(value_col, probs, F.lit(accuracy)).alias("quantiles")
    )


def frequent_values(
    df: DataFrame, col: str, min_support: float = 0.01
) -> DataFrame:
    """Values of ``col`` appearing in at least ``min_support`` of all
    rows, with counts — heavy-hitter contract (exact implementation;
    swap a space-saving sketch behind the same signature at scale)."""
    import math

    total = df.count()
    # 'at least' contract: ceil, but guard the float product landing a
    # hair ABOVE the exact integer (300*0.07 = 21.000000000000004
    # would wrongly exclude a value at exactly 7% support)
    threshold = math.ceil(total * min_support - 1e-9)
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(max(threshold, 1)))
        .orderBy(F.col("cnt").desc(), F.col(col).asc())
    )
