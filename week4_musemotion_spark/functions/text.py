"""Text primitives for the dedup / text-analysis operators.

Everything is a builtin-function composition (split / transform /
sequence / concat_ws) — tokenization and shingling run JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty tokens removed)."""
    return F.filter(F.split(_c(col), r"\s+"), lambda t: t != "")


def shingles(tok: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of a token array → array<string>.

    Built as ``transform(sequence(0, size-n), i -> concat_ws(' ',
    slice(tok, i+1, n)))``; documents shorter than ``n`` tokens yield
    an empty array.
    """
    t = _c(tok)
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(-1)))
    return F.when(
        F.size(t) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n))),
    ).otherwise(F.array().cast("array<string>"))
