"""Skew mitigation: salted joins.

AQE's skew-join handles most runtime skew, but the classic
hand-salting pattern is still the tool when one hot key dwarfs
everything (a 40%-TESLA-style distribution — the reference's own
``make`` column, FIXTURES.md): split each hot key into N synthetic
sub-keys so the shuffle spreads one key's rows over N reducers.

``salted_join`` is semantics-preserving: the big side gets a
deterministic per-row salt, the small side is replicated once per
salt value, and the join key becomes (key, salt).  Result rows are
exactly those of the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted
    ``n_salts`` ways.

    The salt is derived from the whole big-side row id-lessly via
    ``monotonically_increasing_id`` hashed into [0, n_salts) — cheap,
    deterministic within a job, and independent of the join key (a
    key-derived salt would put the hot key back on one reducer).
    The small side is exploded ×``n_salts`` (keep it broadcast-small
    or ``n_salts`` modest: replication is the price of the spread).

    Only inner and left joins are supported: under right/full outer,
    an unmatched small-side key would survive once per salt replica
    (``n_salts`` duplicate null-extended rows) — reverse the sides or
    use AQE skew handling for outer-preserving-the-small-side joins.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    salted_small = small.select("*", salts)
    joined = salted_big.join(salted_small, [on, _SALT], how)
    return joined.drop(_SALT)
