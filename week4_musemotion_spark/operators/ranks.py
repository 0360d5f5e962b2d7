"""Scale-safe GLOBAL ranking: row numbers and NTILE over a total
order without the single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` is correct but
serializes: Spark coalesces every row into ONE task to number them.
Fine at 10⁴ rows, a cluster-stall at 10⁹.  The distributed classic
(used by every MPP engine) is implemented here with pure DataFrame
ops:

1. ``repartitionByRange`` on the order columns — the range
   partitioner guarantees partition p's keys all sort before
   partition p+1's;
2. sort within each partition (keyed, parallel);
3. count rows per partition — a P-row table; its running offsets
   are the only single-partition work (P ≈ shuffle partitions, not
   data size);
4. global index = partition offset + per-partition ``row_number``
   (a KEYED window on the partition id).

The produced index depends only on the total order (callers must
include a unique tie-break column), not on where the sampled range
boundaries land — so it is deterministic and engine-reproducible.

``global_ntile`` reproduces SQL NTILE semantics exactly: with
``n = q·k + r``, the first ``r`` buckets get ``q+1`` rows.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_index(
    df: DataFrame,
    order_cols: Sequence[str],
    index_col: str = "_gidx",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """``df`` plus a 0-based dense global index over ``order_cols``.

    ``order_cols`` must yield a TOTAL order (include a unique key as
    tie-break) with no NULLs, or the index is ill-defined.
    """
    cols = [F.col(c) for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)  # spark.sql.shuffle.partitions
    ranged = ranged.sortWithinPartitions(*cols).withColumn("_pid", F.spark_partition_id())
    # the ranged subtree is consumed TWICE (offsets + data); the range
    # partitioner SAMPLES its boundaries, so if the exchange were ever
    # not reused (exchange-reuse disabled, plan de-canonicalization),
    # the two materializations could place rows in different
    # partitions and the offsets would belong to the wrong layout —
    # checkpoint pins one materialization so correctness does not
    # depend on the optimizer's reuse decision.  (At cluster scale,
    # prefer a reliable checkpoint dir; localCheckpoint storage is
    # executor-local.)
    ranged = ranged.localCheckpoint(eager=False)
    # per-partition counts -> running offsets: a table of ~P rows, the
    # only place a single-partition window runs (on P rows, not n)
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("_cnt")
    )
    rn = F.row_number().over(Window.partitionBy("_pid").orderBy(*cols))
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(index_col, (F.col("_offset") + rn - 1).cast("long"))
        .drop("_pid", "_offset")
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "_cum",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """``df`` plus the inclusive running sum of ``value_col`` over the
    global total order — same two-pass range-partition scheme as
    :func:`with_global_index` (the single-partition work is the P-row
    offset table, never the data), so ``SUM(...) OVER (ORDER BY ...
    ROWS UNBOUNDED PRECEDING)`` runs distributed.

    ``order_cols`` must yield a TOTAL order (unique tie-break, no
    NULLs); ``value_col`` must be integral (sums accumulate in long —
    widen to decimal upstream if the global sum can pass 2^63).
    """
    cols = [F.col(c) for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged = ranged.sortWithinPartitions(*cols).withColumn("_pid", F.spark_partition_id())
    # pin one materialization: the subtree feeds both the offsets agg
    # and the data pass (see with_global_index for the rationale)
    ranged = ranged.localCheckpoint(eager=False)
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.sum(value_col).cast("long").alias("_psum"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_psum").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("_psum")
    )
    within = F.sum(value_col).over(
        Window.partitionBy("_pid").orderBy(*cols).rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_offset") + within).cast("long"))
        .drop("_pid", "_offset")
    )


def global_ntile(
    df: DataFrame,
    order_cols: Sequence[str],
    k: int,
    out_col: str,
    num_partitions: Optional[int] = None,
    n: Optional[int] = None,
) -> DataFrame:
    """``df`` plus SQL-NTILE(k) bucket numbers over a global total
    order, computed distributed (see module docstring).

    Exact NTILE semantics: n = q·k + r ⇒ buckets 1..r hold q+1 rows,
    buckets r+1..k hold q rows — bit-identical to the window NTILE
    every SQL engine runs, so oracle hashes cannot drift.

    ``n``: pass the known row count to skip the counting job (e.g.
    when tiling the same table on several different orders).
    """
    idx = "_gidx"
    if n is None:
        n = df.count()  # count the INPUT: running the indexed plan just for n
        # would pay the range shuffle + sort + offset join twice
    with_idx = with_global_index(df, order_cols, idx, num_partitions)
    q, r = divmod(n, k)
    if q == 0:
        # fewer rows than buckets: NTILE assigns bucket idx+1
        tile = F.col(idx) + 1
    else:
        big = r * (q + 1)  # rows living in the q+1-sized buckets
        tile = (
            F.when(F.col(idx) < big, F.floor(F.col(idx) / (q + 1)) + 1)
            .otherwise(r + F.floor((F.col(idx) - big) / q) + 1)
        )
    return with_idx.withColumn(out_col, tile.cast("int")).drop(idx)
