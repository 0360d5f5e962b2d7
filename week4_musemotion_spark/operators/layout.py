"""Multi-dimensional data layout: Z-order (Morton-curve) clustering.

A sorted write clusters ONE column: parquet row-group min/max stats
then prune scans filtered on that column, but a second column's
values scatter across every file.  Interleaving the bits of two
rank-scaled columns (the Z-order / Morton curve) gives BOTH columns
locality: each file covers a small rectangle of the (a, b) value
space, so row-group stats prune point/range predicates on either
dimension.  This is the same layout trick Delta's OPTIMIZE ZORDER BY
ships; here it is a pure-Spark composition — an aggregate for the
scale bounds, a bitwise expression for the key, and a range
repartition + in-partition sort for the write.

Everything is builtin bitwise/arithmetic expressions (codegen'd); at
100 TB the only extra cost over a plain sorted write is the one
min/max aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the interleaved key (2 dims × 16 = 32-bit z-value)
DEFAULT_BITS = 16


def _scale_to_bits(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Affine-map an integer column from [lo, hi] onto [0, 2^bits)."""
    span = max(hi - lo, 1)
    return F.least(
        F.lit((1 << bits) - 1),
        ((col - F.lit(lo)).cast("double") / F.lit(span) * F.lit((1 << bits) - 1))
        .cast("long"),
    )


def interleave_bits(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton z-value of two ``bits``-wide non-negative ints.

    Expression tree of 2·``bits`` masked shifts OR'd together — wide
    but flat, stays inside whole-stage codegen (no UDF).
    """
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    z = parts[0]
    for p in parts[1:]:
        z = z.bitwiseOR(p)
    return z


def zorder_key(df: DataFrame, col_a: str, col_b: str, bits: int = DEFAULT_BITS) -> Column:
    """Z-order key over two integer columns, rank-scaled by the
    DataFrame's own min/max (one tiny aggregate pass)."""
    lo_a, hi_a, lo_b, hi_b = (
        df.agg(
            F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
        ).first()
    )
    return interleave_bits(
        _scale_to_bits(F.col(col_a), int(lo_a), int(hi_a), bits),
        _scale_to_bits(F.col(col_b), int(lo_b), int(hi_b), bits),
        bits,
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of
    (``col_a``, ``col_b``): range-repartition by the z-key (balanced
    files covering disjoint curve segments) and sort within each
    partition (monotone row groups → tight per-group min/max stats
    on BOTH columns)."""
    z = zorder_key(df, col_a, col_b, bits).alias("_zkey")
    (
        df.withColumn("_zkey", z)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ``ceil(total_bytes / target_file_bytes)`` files (the 100-TB
    operational hygiene op — a table accreted by micro-batches or
    row-appends degrades every scan with per-file open/footer costs
    and starves the scheduler with million-task stages).

    Uses the same crash-safe staging/rename promotion as the upsert
    sink: the live dataset is never deleted before its replacement is
    fully written.  Returns the output file count.  At warehouse
    scale the equivalent is the table format's OPTIMIZE/rewrite
    action; partition-preserving compaction composes this per
    partition directory.
    """
    import math
    import os
    import shutil

    base = path.rstrip("/")
    staging, old = base + "._staging", base + "._old"
    if os.path.exists(old):
        if not os.path.exists(base):
            # crashed between rename(base, old) and rename(staging,
            # base): the old data is still the only copy — restore it
            os.rename(old, base)
        else:
            # crashed after the swap completed but before cleanup:
            # base is the new data, old is the superseded copy —
            # remove it or the next compaction's rename(base, old)
            # hits an existing directory and raises
            shutil.rmtree(old)
    if os.path.exists(staging):
        shutil.rmtree(staging)

    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(base)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    # coalesce, not repartition: compaction must not pay a shuffle —
    # it only glues input splits together
    spark.read.parquet(base).coalesce(n_files).write.mode("overwrite").parquet(staging)
    os.rename(base, old)
    os.rename(staging, base)
    shutil.rmtree(old)
    return sum(
        1 for r, _, fs in os.walk(base) for f in fs if f.endswith(".parquet")
    )
