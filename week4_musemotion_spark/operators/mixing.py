"""Corpus mixing & ordering — the knobs between "cleaned corpus" and
"training batches": source rebalancing, token-budget selection,
curriculum ordering, and reproducible shuffling.

Every operator here is deterministic by construction (hash-keyed
membership, exact integer or IEEE-exact float arithmetic, total
orders with unique tie-breaks) so a re-run, a backfill, or another
engine reproduces the same mixture row-for-row — the property a
training-data pipeline needs for auditability and for incremental
rebuilds that don't churn previously-shipped shards.

Scale shapes: rebalancing is a per-group agg (tiny) broadcast back
onto a filter; budget selection and shuffling ride the two-pass
range-partition rank/cumsum operators (``operators/ranks``) — no
single-partition window ever touches the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.hashing import stable_hash64
from week4_musemotion_spark.operators.ranks import with_global_cumsum, with_global_index

#: Acceptance-probability resolution (ten-thousandths).
_E4 = 10_000


def temperature_rebalance(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Down-sample large groups toward the τ=0.5 temperature mixture:
    group ``s`` keeps rows with probability ``min(1, sqrt(n_min /
    n_s))`` (the smallest group keeps everything), so effective group
    sizes follow ``sqrt(n_s)`` — the standard temperature-rebalanced
    sampling that keeps rare sources/languages from drowning.

    Membership is a pure function of the row key (hash-bucket <
    acceptance), not an RNG draw — re-runs agree row-for-row.
    τ is fixed at 0.5 because ``sqrt`` is IEEE-correctly-rounded in
    every engine while a general ``pow(x, τ)`` is not; other
    temperatures need a table of per-group acceptance integers
    computed once on the driver.

    One tiny aggregate (|groups| rows) broadcast into a filter — no
    fact-table shuffle at any scale.

    Output: input rows that survive, plus ``accept_e4`` (the group's
    acceptance in ten-thousandths) for auditing.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    accept = (
        counts.crossJoin(F.broadcast(n_min))
        .select(
            group_col,
            F.least(
                F.lit(_E4).cast("long"),
                F.floor(F.lit(_E4) * F.sqrt(F.col("_n_min").cast("double") / F.col("_n"))).cast(
                    "long"
                ),
            ).alias("accept_e4"),
        )
    )
    bucket = F.pmod(stable_hash64(F.col(key_col).cast("string")), F.lit(_E4))
    return (
        df.join(F.broadcast(accept), group_col)
        .filter(bucket < F.col("accept_e4"))
    )


def select_token_budget(
    df: DataFrame,
    budget: int,
    quality_col: str = "quality_e4",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Highest-quality subset under a global token budget: order by
    (quality desc, id) and keep every document whose inclusive
    running token total stays ≤ ``budget`` — the greedy knapsack
    relaxation every "best N billion tokens" curation pass uses.

    The running total is a distributed two-pass cumsum
    (``ranks.with_global_cumsum``): range-partition on the order,
    per-partition sums → P-row offset table, local window — no
    global single-partition sort.

    Output: surviving docs with ``cum_tokens`` (inclusive position of
    the budget line).
    """
    d = df.withColumn("_negq", -F.col(quality_col))
    cum = with_global_cumsum(d, ["_negq", id_col], token_col, "cum_tokens")
    return cum.filter(F.col("cum_tokens") <= budget).drop("_negq")


def curriculum_order(
    df: DataFrame,
    stage_col,
    key_col: str = "doc_id",
    out_col: str = "pos",
    stage_out_col: str = "stage",
) -> DataFrame:
    """Global training order: ascending curriculum stage, then a
    deterministic hash shuffle within each stage (so each stage is
    internally unordered-but-reproducible).  ``stage_col`` is any
    integer Column expression (e.g. a difficulty bucket).

    Positions come from the two-pass distributed global index over
    ``(stage, hash(key), key)`` — total order, no single-partition
    window.  The computed stage lands in ``stage_out_col``; a caller
    whose frame already carries a column of that name must rename one
    side (erroring beats silently emitting two identically-named
    columns that poison every downstream reference).
    """
    for col, param in ((stage_out_col, "stage_out_col"), (out_col, "out_col")):
        if col in df.columns:
            raise ValueError(
                f"curriculum_order: input already has a {col!r} column; "
                f"pass {param}=<other name> or drop/rename the existing one"
            )
    if stage_out_col == out_col:
        raise ValueError("curriculum_order: stage_out_col and out_col must differ")
    d = df.withColumn("_stage", stage_col).withColumn(
        "_h", stable_hash64(F.col(key_col).cast("string"))
    )
    return with_global_index(d, ["_stage", "_h", key_col], out_col).withColumnRenamed(
        "_stage", stage_out_col
    ).drop("_h")


def deterministic_shuffle(
    df: DataFrame, key_col: str, out_col: str = "pos"
) -> DataFrame:
    """Reproducible global shuffle: position = rank of
    ``(hash(key), key)`` — uniform, total, and a pure function of the
    keys, so the training order is identical across re-runs, engines,
    and cluster layouts (``df.orderBy(rand())`` is none of those).
    Two-pass distributed ranking; no single-partition window.
    """
    d = df.withColumn("_h", stable_hash64(F.col(key_col).cast("string")))
    return with_global_index(d, ["_h", key_col], out_col).drop("_h")
