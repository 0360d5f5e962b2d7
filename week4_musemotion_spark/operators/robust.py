"""Robust (median/MAD-based) statistics with an exact↔sketch switch.

The MAD outlier audit (see ``queries/lifecycle.q_mad_outliers``) uses
exact grouped medians — correct and oracle-checkable, but an exact
median is a full sort (or ``F.median``'s grouped buffer) per group.
At warehouse scale the right tool is the Greenwald-Khanna quantile
sketch behind builtin ``percentile_approx``: mergeable, constant
memory, rank error ≤ n/accuracy — and crucially the DATAFLOW is
identical, so this operator takes ``exact=`` and swaps only the
median expression.  The sketch returns an actual element of the
group (no interpolation), so the deviation-vs-threshold comparisons
stay integer-exact either way.

Divergence contract (pinned in ``tests/test_robust.py``): the sketch
median's rank is within ``n/accuracy`` of the true median rank, so
its VALUE lies within the exact quantile envelope
``[percentile(0.5 - 1/accuracy), percentile(0.5 + 1/accuracy)]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _median(col: str, exact: bool, accuracy: int) -> Column:
    if exact:
        return F.median(col)
    return F.percentile_approx(col, F.lit(0.5), F.lit(accuracy)).cast("double")


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group robust outlier audit: median, median absolute
    deviation, and the count of rows whose deviation exceeds
    ``k``×MAD.  ``exact=True`` uses exact medians (oracle-checkable);
    ``exact=False`` swaps in the GK quantile sketch (``accuracy`` =
    inverse rank-error) with the SAME dataflow — two grouped
    aggregates over O(groups) rows plus two broadcast joins of the
    tiny per-group stats back onto the stream, which is never sorted
    globally.

    Output: ``(<group_col>, n, median, mad, n_outliers, max_dev)``.
    """
    from week4_musemotion_spark.sources.tables import spread

    # spread: both exact-median aggregates otherwise sort/accumulate
    # the whole stream inside the single scan task of a one-row-group
    # file (no-op on wide scans; floor skips provably tiny frames)
    c = spread(df.select(group_col, F.col(value_col).alias("_v")), min_rows=65536)
    med = c.groupBy(group_col).agg(_median("_v", exact, accuracy).alias("_med"))
    dev = c.join(F.broadcast(med), group_col).select(
        group_col, F.abs(F.col("_v") - F.col("_med")).alias("_dev"), "_med"
    )
    mad = dev.groupBy(group_col).agg(_median("_dev", exact, accuracy).alias("_mad"))
    return (
        dev.join(F.broadcast(mad), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("_med").cast("double").alias("median"),
            F.min("_mad").cast("double").alias("mad"),
            F.count(F.when(F.col("_dev") > F.lit(k) * F.col("_mad"), 1))
            .cast("long")
            .alias("n_outliers"),
            F.max("_dev").cast("double").alias("max_dev"),
        )
    )
