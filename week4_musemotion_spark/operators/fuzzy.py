"""Blocked fuzzy string join (entity resolution) for edit distance ≤ 1
via the deletion-neighborhood technique — exact recall, key selectivity
that tracks FULL-string entropy.

For a string ``s`` let ``D(s) = {s} ∪ {s with one character deleted}``
(|s| + 1 variants).  Two strings ``u, v`` are within edit distance 1
iff ``D(u) ∩ D(v) ≠ ∅``:

- equal:        ``u ∈ D(u) ∩ D(v)``.
- deletion:     ``v = del_i(u)`` ⇒ ``v ∈ D(u)`` and ``v ∈ D(v)``.
- insertion:    symmetric to deletion.
- substitution: delete the substituted position from both ⇒ same string.

Conversely a shared variant implies edit distance ≤ 2, so a final
``levenshtein ≤ 1`` verify over candidates only removes the (rare)
false positives.  This is the classic "fast similarity search with
deletions" scheme (Mor–Fraenkel 1982; popularized by FastSS, Bocek et
al. 2007, and SymSpell) — public knowledge.

Why not PassJoin segment blocking here: on templated key corpora
(e.g. TPC-H's ``Customer#000000042``) the first-half segment has ~1
distinct value, so segment blocking degenerates into a cross join
(measured: 1 distinct seg-1 key over 15k customers ⇒ 49% of the whole
bench in one query).  Deletion variants always contain the
high-entropy part of the string, so block sizes track true near-dup
group sizes, not shared-prefix mass.

Scale shape: each row emits ≤ len+1 keys, each hashed to a fixed
64-bit ``xxhash64`` (short shuffle rows regardless of string length);
the join is a plain long-key equi-join — never a cross join — and the
candidate set is deduped on caller-supplied id columns BEFORE the
edit-distance verify so each pair pays ``levenshtein`` once.

Reference parity: /root/reference has no fuzzy join; this extends the
entity-resolution family the curation pipeline needs at scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_keys(col: str):
    """64-bit hashes of ``{s} ∪ single-char-deletions(s)``.

    ``i = 0`` is the string itself; ``i ≥ 1`` deletes position ``i``.
    ``array_distinct`` collapses repeated-character duplicates (e.g.
    "aab" → "ab" twice) so a row never emits the same key twice.
    Hash collisions are harmless: candidates are verified exactly.
    """
    return F.expr(
        f"array_distinct(transform(sequence(0, length({col})), "
        f"i -> xxhash64(CASE WHEN i = 0 THEN {col} "
        f"ELSE concat(substring({col}, 1, i - 1), "
        f"substring({col}, i + 1, length({col}))) END)))"
    )


def fuzzy_join_edit1(
    clean: DataFrame,
    dirty: DataFrame,
    clean_col: str,
    dirty_col: str,
    dedup_on: Optional[Sequence[str]] = None,
) -> DataFrame:
    """All (dirty, clean) pairs with edit distance ≤ 1, via
    deletion-neighborhood blocking + levenshtein verify.

    Output: every column of both inputs plus ``dist``.

    ``dedup_on``: columns (drawn from either input) that uniquely
    identify a candidate pair — typically the two primary keys.  When
    given, candidate dedup shuffles only those narrow columns instead
    of every column of both inputs.  Defaults to all columns.
    """
    ck = clean.withColumn("_k", F.explode(_deletion_keys(clean_col)))
    dk = dirty.withColumn("_k", F.explode(_deletion_keys(dirty_col)))
    keys = list(dedup_on) if dedup_on else list(dirty.columns) + list(clean.columns)
    cands = dk.join(ck, dk["_k"] == ck["_k"]).drop("_k").dropDuplicates(keys)
    return cands.withColumn(
        "dist", F.levenshtein(F.col(dirty_col), F.col(clean_col))
    ).filter(F.col("dist") <= 1)


def candidate_pairs_edit1(
    clean: DataFrame,
    dirty: DataFrame,
    clean_col: str,
    dirty_col: str,
    dedup_on: Optional[Sequence[str]] = None,
) -> DataFrame:
    """The blocked candidate set BEFORE the levenshtein verify — used
    by tests to assert the candidate count stays near-linear (the
    guard against a degenerate-blocking regression)."""
    ck = clean.withColumn("_k", F.explode(_deletion_keys(clean_col)))
    dk = dirty.withColumn("_k", F.explode(_deletion_keys(dirty_col)))
    keys = list(dedup_on) if dedup_on else list(dirty.columns) + list(clean.columns)
    return dk.join(ck, dk["_k"] == ck["_k"]).drop("_k").dropDuplicates(keys)
