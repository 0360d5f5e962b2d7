"""Blocked fuzzy string join (entity resolution) — PassJoin-style
segment blocking for edit distance ≤ 1, exact recall by pigeonhole.

A pair within edit distance 1 has ONE edit, which lies in (or at the
boundary of) exactly one of the two halves of the clean string — so
the OTHER half appears intact in the dirty string: the first half as
an exact prefix, or the second half as an exact suffix (shifted by
the length delta).  Blocking on (assumed_clean_length, segment_id,
segment_text) therefore proposes every true match (recall is exact,
not probabilistic), and a final ``levenshtein ≤ 1`` verify removes
false candidates.  This is the PassJoin partition scheme (Li, Deng,
Wang, Feng — "PassJoin: A Partition-based Method for Similarity
Joins", ICDE 2011) specialized to τ=1.

Scale shape: each clean row emits 2 keys, each dirty row 6 (3 length
hypotheses × 2 segments); the join is a plain equi-join on short
substring keys — never a cross join — and only candidates pay the
edit-distance compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean_keys(col: str):
    """(length, segment, text) keys: the two halves of the string."""
    L = f"length({col})"
    h = f"({L} div 2)"
    return F.array(
        F.struct(
            F.expr(L).cast("int").alias("klen"),
            F.lit(1).alias("seg"),
            F.expr(f"substring({col}, 1, {h})").alias("ktext"),
        ),
        F.struct(
            F.expr(L).cast("int").alias("klen"),
            F.lit(2).alias("seg"),
            F.expr(f"substring({col}, {h} + 1, {L})").alias("ktext"),
        ),
    )


def _dirty_keys(col: str):
    """Probe keys for every clean-length hypothesis L' ∈ len±1: the
    would-be first half as a prefix, the would-be second half as a
    suffix."""
    keys = []
    for dl in (-1, 0, 1):
        Lp = f"(length({col}) + {dl})"
        hp = f"({Lp} div 2)"
        keys.append(
            F.struct(
                F.expr(Lp).cast("int").alias("klen"),
                F.lit(1).alias("seg"),
                F.expr(f"substring({col}, 1, {hp})").alias("ktext"),
            )
        )
        keys.append(
            F.struct(
                F.expr(Lp).cast("int").alias("klen"),
                F.lit(2).alias("seg"),
                F.expr(
                    f"substring({col}, length({col}) - ({Lp} - {hp}) + 1, {Lp} - {hp})"
                ).alias("ktext"),
            )
        )
    return F.array(*keys)


def fuzzy_join_edit1(
    clean: DataFrame,
    dirty: DataFrame,
    clean_col: str,
    dirty_col: str,
) -> DataFrame:
    """All (dirty, clean) pairs with edit distance ≤ 1, via segment
    blocking + levenshtein verify.  Output: every column of both
    inputs plus ``dist``."""
    ck = clean.withColumn("_k", F.explode(_clean_keys(clean_col)))
    dk = dirty.withColumn("_k", F.explode(_dirty_keys(dirty_col)))
    cands = (
        dk.join(ck, dk["_k"] == ck["_k"])
        .drop("_k")
        .dropDuplicates([c for c in dirty.columns] + [c for c in clean.columns])
    )
    return cands.withColumn("dist", F.levenshtein(F.col(dirty_col), F.col(clean_col))).filter(
        F.col("dist") <= 1
    )
