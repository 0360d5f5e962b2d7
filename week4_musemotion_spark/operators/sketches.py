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


def heavy_hitters(df: DataFrame, col: str, den: int) -> DataFrame:
    """Exact heavy hitters at support 1/``den`` via a Misra-Gries
    candidate pass + exact recount — the two-pass plan that replaces
    :func:`frequent_values`' full groupBy when the value domain is
    too wide to shuffle (URLs, n-grams, user ids at 100 TB).

    Pass 1 runs a ``den``-counter Misra-Gries summary PER PARTITION
    inside one Arrow-batched ``mapInPandas`` (mergeable-summaries
    bound, Agarwal et al. 2012: any value with partition frequency
    > n_p/(den+1) survives; a global value with frequency >= n/den
    is, by the weighted-pigeonhole argument, locally that frequent in
    at least one partition — so the candidate set has NO false
    negatives).  Each partition emits <= den candidate rows plus one
    row-count row: the shuffle carries O(partitions * den) rows, not
    one row per distinct value.  Pass 2 broadcast-semi-joins the
    candidates back and recounts them exactly, so the final
    ``(value, cnt, share_ppm)`` rows are EXACT — partitioning decides
    only which non-hitters get pruned early, never the answer —
    which is what makes the operator oracle-checkable.

    ``value`` must be a string column with no nulls (token/term
    streams; explode first).  The support is the exact rational
    1/den and the threshold ceil(n/den) is computed in integer
    arithmetic, so there is no float product to drift cross-engine;
    ``share_ppm`` is floor(cnt * 1e6 / n) widened to decimal before
    the pre-scale (a long wraps at 100 TB token counts with ANSI
    off)."""
    import pandas as pd

    if den < 2:
        raise ValueError(f"den must be >= 2, got {den}")

    def _mg(batches):
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            s = pdf[col].dropna()
            n += len(s)
            for v, c in s.value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > den:
                # merge-reduce: subtract the (den+1)-th largest count
                # from every counter, drop the non-positive — the
                # classic MG decrement, batched
                cut = sorted(counters.values(), reverse=True)[den]
                counters = {v: c - cut for v, c in counters.items() if c > cut}
        yield pd.DataFrame(
            {
                "candidate": list(counters.keys()) + [None],
                "part_rows": [0] * len(counters) + [n],
            }
        )

    src = df.select(F.col(col).cast("string").alias(col))
    part = src.mapInPandas(
        _mg, "candidate string, part_rows long"
    ).localCheckpoint(eager=False)
    cand = part.filter(F.col("candidate").isNotNull()).select(
        F.col("candidate").alias(col)
    ).distinct()
    total = part.agg(F.sum("part_rows").cast("long").alias("total"))
    counts = (
        src.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    from week4_musemotion_spark.functions.exact import dec, int_div_trunc

    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            # cnt >= ceil(total/den), all-integer: (total + den - 1) div den
            # (widened first: the +den-1 on a raw long could wrap at the
            # extreme end of the range with ANSI off)
            F.col("cnt")
            >= int_div_trunc(dec(F.col("total")) + F.lit(den - 1), F.lit(den))
        )
        .select(
            col,
            "cnt",
            int_div_trunc(dec(F.col("cnt")) * 1_000_000, F.col("total")).alias(
                "share_ppm"
            ),
        )
    )
