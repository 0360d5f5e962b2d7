"""Exact cross-engine arithmetic for money-like doubles.

``round(avg(double_col), 2)`` is NOT reproducible across engines, for
two stacked reasons observed in differential testing:

1. partial-aggregation sum order differs → last-ulp drift;
2. even on bit-identical doubles, Spark's ``round`` rounds the
   *shortest decimal string* (4201.315 → 4201.32) while DuckDB
   rounds the *binary value* (4201.31499999999987… → 4201.31).

The testdata's monetary columns carry 2-decimal values, so money
aggregates are computed — and emitted — in exact integer cents:
BIGINT in, BIGINT out, no doubles anywhere near the result.  Paired
Spark/SQL builders live together so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-decimal double column.  (The *100
    lands within 1e-10 of an integer for 2-dp data, so the
    double-round here is engine-stable.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def cents_sql(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def sum_money(col: Column | str) -> Column:
    """Exact sum in cents (BIGINT)."""
    return F.sum(cents(col))


def sum_money_sql(expr: str) -> str:
    return f"CAST(sum({cents_sql(expr)}) AS BIGINT)"


def avg_money(col: Column | str) -> Column:
    """Average in cents, rounded half-away-from-zero to the nearest
    cent with pure integer arithmetic (BIGINT): |p|/q rounds as
    (2|p| + q) div 2q — truncating division agrees across engines for
    non-negative operands.  Divides by the NON-NULL count (SQL AVG
    semantics), not count(*)."""
    c = cents(col)
    p = F.sum(c)
    q = F.count(c)
    # decimal(38,0) throughout: a long/double path is exact only under
    # 2^53, and a global cents sum at warehouse scale can exceed that
    mag = int_div_round_dec(F.abs(p), q)
    return F.when(p >= 0, mag).otherwise(-mag)


def avg_money_sql(expr: str) -> str:
    c = cents_sql(expr)
    n = f"count({c})"
    return (
        f"CAST(CASE WHEN sum({c}) >= 0 "
        f"THEN (2 * sum({c}) + {n}) // (2 * {n}) "
        f"ELSE -((2 * -sum({c}) + {n}) // (2 * {n})) END AS BIGINT)"
    )


def int_div_round(p: Column, q: Column) -> Column:
    """round-half-away-from-zero of p/q for non-negative integer
    columns, in pure integer arithmetic: (2p + q) div 2q.

    All arithmetic runs in decimal(38,0): the earlier long/double
    formulation was exact only while ``2p + q`` stayed within 2^53 —
    beyond that the double division rounded the exact multiple before
    dividing (caught by a Fraction-reference property test at
    p ≈ 10^12 with the e4 pre-scale applied).  Decimal keeps every
    intermediate exact for any long input."""
    return int_div_round_dec(p, q)


def int_div_round_sql(p: str, q: str) -> str:
    return f"CAST((2 * ({p}) + ({q})) // (2 * ({q})) AS BIGINT)"


def ratio_e4(num: Column, den: Column) -> Column:
    """p/q as ten-thousandths (BIGINT), exactly rounded.

    ``round(p/q, 4)`` on doubles is engine-divergent whenever the
    rational's shortest decimal repr ends in a half at the 5th place
    (e.g. 3/160 = 0.01875: Spark string-rounds up, DuckDB
    binary-rounds the slightly-low double down) — integer arithmetic
    sidesteps the whole class.  The ×10⁴ pre-scale is applied AFTER
    widening to decimal so a large numerator cannot wrap the long."""
    return int_div_round_dec(dec(num) * 10_000, den)


def ratio_e4_sql(num: str, den: str) -> str:
    return int_div_round_sql(f"({num}) * 10000", den)


def stddev_money(col: Column | str) -> Column:
    """Sample stddev in ten-thousandths of a cent-unit (BIGINT):
    computed from exact integer moments (sum, sum-of-squares in
    decimal128) so partition order cannot perturb it, then scaled
    ×10⁴ and rounded to an integer.  The builtin ``stddev_samp``
    accumulates doubles in partition order and is not reproducible."""
    c = cents(col)
    n = F.count(c).cast("double")
    s1 = F.sum(c).cast("double")
    # widen BEFORE multiplying: long c*c overflows silently at values
    # >= ~$30M (the SQL side multiplies in HUGEINT — keep them equal)
    s2 = F.sum(c.cast("decimal(38,0)") * c).cast("double")
    # clamp: cancellation can drive the moment formula a hair negative
    # for near-constant data, and sqrt(negative) is NaN/NULL
    var = F.greatest((s2 - s1 * s1 / n) / (n - F.lit(1.0)), F.lit(0.0))
    # single-row groups: sample stddev is undefined (NULL, matching
    # stddev_samp; NaN would cast to 0 here but error in DuckDB)
    return F.when(n > 1, F.round(F.sqrt(var) * 100).cast("long"))  # cents*1e2 = dollars*1e4


def stddev_money_sql(expr: str) -> str:
    c = cents_sql(expr)
    n = f"count({c})"
    body = (
        f"round(sqrt(greatest((CAST(sum(CAST({c} AS HUGEINT) * {c}) AS DOUBLE)"
        f" - CAST(sum({c}) AS DOUBLE) * CAST(sum({c}) AS DOUBLE) / {n})"
        f" / ({n} - 1.0), 0.0)) * 100)"
    )
    return f"CAST(CASE WHEN {n} > 1 THEN {body} ELSE NULL END AS BIGINT)"


def dec(col: Column) -> Column:
    """Widen to decimal(38,0) — the JVM-side analog of DuckDB's
    automatic HUGEINT promotion in sum().  Use for any accumulation
    or product that can pass 2^63: with ``ansi.enabled=false`` a long
    overflow WRAPS SILENTLY while the DuckDB oracle stays exact, so
    the divergence surfaces only at scale."""
    return col.cast("decimal(38,0)")


def int_div_trunc(p: Column, q: Column) -> Column:
    """Truncating integer division (q > 0, p ≥ 0) in decimal(38,0),
    exact for ANY long input — the safe general-purpose twin of
    :func:`int_div_round_dec`.  Strip the remainder with pmod, then
    dividing an exact multiple is exactly representable at the result
    scale, so the quotient is engine-stable.  Mirrors DuckDB's ``//``
    for non-negative operands.  Prefer this over hand-rolled
    ``((p - pmod(p,q)) / q).cast("long")`` on raw longs: that double
    quotient is exact only for p < 2^53."""
    return int_div_trunc_dec(p, q).cast("long")


def int_div_trunc_dec(p: Column, q: Column) -> Column:
    """:func:`int_div_trunc` that STAYS in decimal(38,0) — for
    quotients that feed further exact arithmetic or can themselves
    exceed long (e.g. a pair count n(n−1)/2 past ~4.3e9 rows).  The
    long-casting variant would wrap silently under ansi-off exactly
    where the decimal pipeline was supposed to be exact."""
    pd_, qd = dec(p), dec(q)
    return ((pd_ - F.pmod(pd_, qd)) / qd).cast("decimal(38,0)")


def int_div_round_dec(p: Column, q: Column) -> Column:
    """:func:`int_div_round` in decimal(38,0) (q > 0, p ≥ 0): strip
    the remainder with pmod, then the division of an exact multiple
    is exactly representable at the result scale, so the quotient is
    engine-stable.  Operands are widened BEFORE the doubling so a
    long input near 2^62 cannot wrap on ``2 * p``."""
    num = 2 * dec(p) + dec(q)
    den = 2 * dec(q)
    return ((num - F.pmod(num, den)) / den).cast("long")
