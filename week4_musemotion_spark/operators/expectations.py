"""Data-quality expectations: declarative gates over a DataFrame.

The pipeline-circuit-breaker pattern: declare per-column invariants
(max null fraction, value ranges, uniqueness, accepted sets), get
back a violations report — and optionally fail fast — before bad
data reaches training.  All rules compile into ONE aggregate pass
(never one job per rule).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule; ``kind`` ∈ {not_null, max_null_fraction, unique,
    min, max, isin}."""

    column: str
    kind: str
    value: object = None

    def describe(self) -> str:
        return f"{self.column} {self.kind}" + (f" {self.value!r}" if self.value is not None else "")


def _violation_count(e: Expectation):
    c = F.col(e.column)
    if e.kind == "not_null":
        return F.count(F.lit(1)) - F.count(c)
    if e.kind == "max_null_fraction":
        # when the fraction exceeds the bound, report the actual null
        # count (not a bare flag) so the report is truthful
        nulls = F.count(F.lit(1)) - F.count(c)
        frac = nulls / F.count(F.lit(1))
        return F.when(frac > F.lit(float(e.value)), nulls).otherwise(F.lit(0))
    if e.kind == "unique":
        return F.count(c) - F.countDistinct(c)
    if e.kind == "min":
        return F.sum(F.when(c < F.lit(e.value), 1).otherwise(0))
    if e.kind == "max":
        return F.sum(F.when(c > F.lit(e.value), 1).otherwise(0))
    if e.kind == "isin":
        return F.sum(F.when(~c.isin(*e.value) & c.isNotNull(), 1).otherwise(0))
    raise ValueError(f"unknown expectation kind: {e.kind}")


def check_expectations(
    df: DataFrame, expectations: list[Expectation], fail_fast: bool = False
) -> list[tuple[str, int]]:
    """Evaluate all expectations in one aggregate; returns
    ``[(rule description, violation count), ...]`` for violated rules
    (empty = all good).  ``fail_fast`` raises instead."""
    if not expectations:
        return []
    aggs = [
        _violation_count(e).cast("long").alias(f"_e{i}") for i, e in enumerate(expectations)
    ]
    row = df.agg(*aggs).collect()[0]
    violations = [
        (e.describe(), int(row[f"_e{i}"]))
        for i, e in enumerate(expectations)
        if (row[f"_e{i}"] or 0) > 0
    ]
    if violations and fail_fast:
        detail = "; ".join(f"{d}: {n} violations" for d, n in violations)
        raise ValueError(f"data-quality expectations failed: {detail}")
    return violations


def observe_expectations(
    df: DataFrame, expectations: list[Expectation], name: str = "expectations"
):
    """Attach the expectation metrics to the DataFrame via
    ``df.observe`` so they are collected DURING whatever job next
    consumes it (the write, the aggregate, ...) — zero extra scans,
    versus :func:`check_expectations`'s dedicated aggregate pass.

    Returns ``(observed_df, observation)``; after an action runs on
    ``observed_df``, call :func:`observed_violations` on the
    observation.  At 100 TB this is the difference between "quality
    report for free" and "second full read of the input".
    """
    from pyspark.sql import Observation

    if not expectations:
        raise ValueError("no expectations given")
    unsupported = [e for e in expectations if e.kind == "unique"]
    if unsupported:
        # CollectMetrics forbids DISTINCT aggregates — uniqueness needs
        # the dedicated pass (check_expectations); failing loudly beats
        # silently approximating a data-quality gate
        raise ValueError(
            "observe_expectations cannot ride 'unique' rules "
            f"({[e.column for e in unsupported]}); use check_expectations"
        )
    obs = Observation(name)
    metrics = [
        _violation_count(e).cast("long").alias(f"_e{i}")
        for i, e in enumerate(expectations)
    ]
    return df.observe(obs, *metrics), obs


def observed_violations(
    obs, expectations: list[Expectation]
) -> list[tuple[str, int]]:
    """Violated-rule report from a completed Observation (same shape
    as :func:`check_expectations`'s return)."""
    got = obs.get
    return [
        (e.describe(), int(got[f"_e{i}"] or 0))
        for i, e in enumerate(expectations)
        if (got[f"_e{i}"] or 0) > 0
    ]
