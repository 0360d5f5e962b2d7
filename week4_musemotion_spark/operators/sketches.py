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

Those two builtin-backed sketches are run-deterministic but NOT
engine-portable (xxhash64/GK internals), so they ship with tolerance
tests rather than DuckDB value oracles.

The rest of the module is the PORTABLE sketch family, built on
functions.hashing.stable_hash64 so every estimate replays bit-for-bit
in a SQL oracle — approximate answers, exactly checkable:

- :func:`heavy_hitters` — Misra-Gries candidates + exact recount
  (frequency, exact output);
- :func:`hll_registers` / :func:`hll_merge` / :func:`hll_estimate` —
  HyperLogLog (distinct count, mergeable m-row state);
- :func:`build_key_bloom` / :func:`bloom_might_contain` /
  :func:`bloom_prune` — bloom membership (join pruning, exact after
  the join);
- :func:`cms_sketch` / :func:`cms_merge` / :func:`cms_lookup` —
  count-min (point frequency, mergeable depth×width state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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

    from week4_musemotion_spark.sources.tables import exact_scan_rows

    total = exact_scan_rows(df)
    if total is None:
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

    from week4_musemotion_spark.sources.tables import spread

    # spread: the MG pass is per-partition mapInPandas — a single-
    # row-group scan would run it (and the exact recount's scan side)
    # in one task; more partitions only ADD candidate rows (still
    # O(partitions × den)), never lose one
    src = spread(df.select(F.col(col).cast("string").alias(col)))
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


# ---------------------------------------------------------------------------
# Portable HyperLogLog — engine-replayable distinct sketch
# ---------------------------------------------------------------------------

from week4_musemotion_spark.functions.hashing import _HEX_DIGITS as _HASH_HEX

#: Hash width of functions.hashing.stable_hash64 — derived from the
#: hashing module's own digit count (4 bits/hex digit) so the two
#: can never drift.
_HASH_BITS = 4 * _HASH_HEX


def hll_alpha_e7(m: int) -> int:
    """The HLL bias constant α_m = 0.7213/(1 + 1.079/m), pinned as an
    e7 fixed-point integer.  Computed once in Python and injected as
    the SAME literal into both the Spark plan and the SQL oracle, so
    no cross-engine float arithmetic ever touches the estimate.
    Valid for m >= 128 (the classic constant-α regime; Flajolet et
    al. 2007 §4 give per-m constants below that)."""
    if m < 128:
        raise ValueError(f"hll_alpha_e7 requires m >= 128, got {m}")
    return round(0.7213 / (1 + 1.079 / m) * 10_000_000)


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 8
) -> DataFrame:
    """Per-group HyperLogLog register table (Flajolet et al. 2007)
    built ENTIRELY from engine-portable primitives, so the estimate
    is an exact integer reproducible bit-for-bit by a SQL oracle —
    unlike the builtin ``approx_count_distinct``, whose xxhash64
    sketch cannot be replayed outside the JVM.

    Layout: one row per NON-EMPTY register, ``(*group_cols, bucket,
    reg, p)`` with ``bucket = h & (m-1)``, ``reg = max rank of the
    leading 1-bit in the remaining ``60 - p`` hash bits (all-zero
    suffix → W+1), and ``p`` the build precision (checked by
    :func:`hll_estimate`).  This is the sketch's full mergeable state: m
    rows per group bound the shuffle no matter how many distinct
    values stream through, duplicates never change a register, and
    two partial sketches merge by ``max`` per bucket
    (:func:`hll_merge`) — the 100 TB contract that a per-shard
    distinct count can be combined without re-reading shards.

    ``p`` in [7, 16]: m = 2^p registers, standard error
    ~1.04/sqrt(m).  ``value_col`` is hashed as a string.
    """
    if not 7 <= p <= 16:
        raise ValueError(f"p must be in [7, 16], got {p}")
    from week4_musemotion_spark.functions.hashing import stable_hash64

    m = 1 << p
    width = _HASH_BITS - p  # suffix bits ranked for the register
    h = stable_hash64(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w))
    )
    return (
        # NULLs contribute zero distinct (approx_count_distinct
        # semantics) — unguarded they would hash to a NULL bucket row
        # that inflates `present` without a dp term in hll_estimate
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.bitwiseAND(m - 1).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("reg"))
        # the table carries its own precision so hll_estimate can
        # verify it was built with the p it is decoding at — ANY
        # mismatch (larger or smaller) fails loudly instead of
        # silently skewing the harmonic denominator
        .withColumn("p", F.lit(p).cast("int"))
    )


def hll_registers_grid(
    df: DataFrame, group_cols: list[str], value_col: str, ps: tuple[int, ...]
) -> DataFrame:
    """Register tables for a precision GRID in ONE pass: the md5 hash
    — the scan's actual CPU cost — is computed once per value, and
    every precision's (bucket, rho) derives from the same 60 hash
    bits, so ``grid.filter(p == q)`` is bit-identical to
    ``hll_registers(df, ..., p=q)`` (pinned by tests).  Use when an
    audit needs INDEPENDENT direct builds at several precisions
    (q_hll_fold_grid): len(ps) separate hll_registers calls would
    re-hash the corpus len(ps) times for byte-identical h values.
    Output layout matches :func:`hll_registers` plus the grid: one
    row per non-empty ``(*group_cols, p, bucket)`` register, state
    sum(2^p for p in ps) rows per group at most."""
    for p in ps:
        if not 7 <= p <= 16:
            raise ValueError(f"p must be in [7, 16], got {p}")
    if len(set(ps)) != len(ps):
        raise ValueError(f"duplicate precision in grid: {ps}")
    from week4_musemotion_spark.functions.hashing import stable_hash64

    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, stable_hash64(F.col(value_col).cast("string")).alias("h")
    )
    structs = []
    for p in ps:
        width = _HASH_BITS - p
        w = F.shiftright(F.col("h"), p)
        rho = F.when(w == 0, F.lit(width + 1)).otherwise(
            F.lit(width + 1) - F.length(F.bin(w))
        )
        structs.append(
            F.struct(
                F.lit(p).cast("int").alias("p"),
                F.col("h").bitwiseAND((1 << p) - 1).alias("bucket"),
                rho.cast("int").alias("rho"),
            )
        )
    return (
        hashed.select(*group_cols, F.explode(F.array(*structs)).alias("pbr"))
        .select(*group_cols, "pbr.p", "pbr.bucket", "pbr.rho")
        .groupBy(*group_cols, "p", "bucket")
        .agg(F.max("rho").cast("int").alias("reg"))
        .select(*group_cols, "bucket", "reg", "p")
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two register tables (same ``p``): union, max per bucket.
    The mergeable-summaries property — sketch(A ∪ B) =
    merge(sketch(A), sketch(B)) exactly.  ``p`` rides the grouping
    key: merging tables built at different precisions keeps both p
    values, which :func:`hll_estimate`'s per-group check then
    rejects."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket", "p")
        .agg(F.max("reg").cast("int").alias("reg"))
        .select(*group_cols, "bucket", "reg", "p")
    )


def hll_fold(registers: DataFrame, new_p: int, group_cols: list[str] | None = None) -> DataFrame:
    """Fold an HLL register table down to a SMALLER precision —
    EXACTLY ``hll_registers(df, ..., p=new_p)``, register for
    register, derived from the high-precision table alone.

    Why it is exact (layout: ``bucket = h & (m-1)``, ``rho`` ranks
    the leading 1-bit of the suffix ``w = h >> p``): narrowing the
    index moves the dropped index bits ``d = bucket >> new_p`` to the
    BOTTOM of the ranked suffix, so when ``w != 0`` the leading
    1-bit's distance from the top is unchanged — ``rho`` is
    invariant.  In the ``w == 0`` sentinel case (``reg == W_p + 1``)
    the new rank is determined entirely by ``d``, which the register
    row itself carries; the sentinel's image ``W_q + 1 -
    len(bin(d))`` is ``>= W_p + 1``, i.e. still dominates every
    non-sentinel rho in its bucket, so per-value mapping commutes
    with the per-bucket max.  Hence a PRECISION GRID costs one corpus
    pass (build at the grid max) plus re-aggregations of the
    ``<= m`` register rows — the same one-build trick as
    :func:`cms_fold` (width) and :func:`bloom_words` (bitmap size).

    Folding UP is impossible (the discarded suffix bits are gone);
    an in-plan guard fails the job if ``new_p >= build p``.
    """
    if not 7 <= new_p <= 16:
        raise ValueError(f"new_p must be in [7, 16], got {new_p}")
    gcols = group_cols or []
    old_sent = F.lit(_HASH_BITS + 1) - F.col("p")  # W_p + 1, from the row's own p
    new_w1 = _HASH_BITS - new_p + 1  # W_q + 1
    d = F.shiftright(F.col("bucket"), new_p)
    mapped = F.when(F.col("reg") < old_sent, F.col("reg")).otherwise(
        # bin(0) is "0" (length 1), not length 0 — the d == 0 branch
        # must be explicit or the double-sentinel folds one short
        F.when(d == 0, F.lit(new_w1)).otherwise(F.lit(new_w1) - F.length(F.bin(d)))
    )
    p_ok = F.assert_true(
        F.col("p") > new_p,
        F.lit(f"hll_fold: new_p={new_p} must be < the build precision"),
    )
    return (
        registers.select(
            *gcols,
            F.col("bucket").bitwiseAND((1 << new_p) - 1).alias("bucket"),
            # the assert must ride the USED expression or Catalyst
            # prunes it (assert_true yields NULL on success)
            F.when(p_ok.isNull(), mapped).alias("reg"),
        )
        .groupBy(*gcols, "bucket")
        .agg(F.max("reg").cast("int").alias("reg"))
        .withColumn("p", F.lit(new_p).cast("int"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Distinct-count estimates from a register table, per group:

    - ``hll_e2`` (long) — the RAW HLL estimate α_m·m²/Σ2^(-M_j) as an
      exact hundredths integer: the harmonic denominator is
      accumulated as Σ2^(W+1-M_j) (exact longs, order-independent —
      empty registers contribute 2^(W+1)), and the final value is one
      truncating decimal division by a pinned integer constant.  An
      oracle repeating the formula gets the identical integer.
    - ``zero_regs`` (long) — empty-register count V: callers needing
      the small-range regime (raw estimate ≤ 2.5m) apply linear
      counting m·ln(m/V) driver-side from this column; the raw form
      is kept float-free because its regime (n > 2.5m) is where a
      sketch is wanted at all.
    - ``estimate`` (double) — the branched HLL estimate (linear
      counting when raw ≤ 2.5m and V > 0, raw otherwise) for direct
      use where cross-engine integer exactness is not required.

    ``p`` must match the value the registers were built with; the
    register table carries its build precision, and a per-group
    ``assert_true`` fails the job on ANY mismatch (larger p: extra
    buckets; smaller p: phantom empty registers) — both would
    otherwise skew the harmonic denominator silently.
    """
    from week4_musemotion_spark.functions.exact import dec, int_div_trunc

    if not 7 <= p <= 16:
        raise ValueError(f"p must be in [7, 16], got {p}")
    m = 1 << p
    width = _HASH_BITS - p
    top = 1 << (width + 1)  # contribution of an empty register
    num = hll_alpha_e7(m) * m * m * top  # α_e7 · m² · 2^(W+1)
    num_dec = F.lit(str(num)).cast("decimal(38,0)")
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.lit(width + 1) - F.col("reg")).cast("int"),
            )
        ).alias("dp"),
        F.min("p").alias("_p_lo"),
        F.max("p").alias("_p_hi"),
    )
    # the assert must live inside a USED expression or Catalyst prunes
    # it: assert_true yields NULL on success, so the when() branch is
    # always taken — and the job fails loudly on a p mismatch
    p_ok = F.assert_true(
        (F.col("_p_lo") == p) & (F.col("_p_hi") == p),
        F.lit(f"hll_estimate: registers were not built with p={p}"),
    )
    d_col = F.when(
        p_ok.isNull(),
        F.col("dp") + (F.lit(m) - F.col("present")) * F.lit(top),
    )
    raw_e2 = int_div_trunc(num_dec, dec(d_col) * 100_000)
    zeros = (F.lit(m) - F.col("present")).cast("long")
    raw = F.col("hll_e2").cast("double") / 100.0
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_regs"))
    return (
        agg.select(
            *group_cols,
            raw_e2.alias("hll_e2"),
            zeros.alias("zero_regs"),
        )
        .withColumn(
            "estimate",
            F.when((raw <= 2.5 * m) & (F.col("zero_regs") > 0), linear).otherwise(raw),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter join pruning — runtime semi-join filter, exact results
# ---------------------------------------------------------------------------


def build_key_bloom(
    keys: DataFrame, key_col: str, num_bits: int = 1 << 15, num_hashes: int = 3
) -> list[int]:
    """Bloom bitmap of a key column as ``num_bits / 64`` signed longs.

    The build is distributed: each key hashes to ``num_hashes`` bit
    positions JVM-side (seeded portable hash), and only the DISTINCT
    positions — at most ``num_bits`` ints, a few KB no matter how
    many keys — ever reach the driver.  That bound is what makes this
    usable where a broadcast join is not: a dim side of 100 M keys
    broadcasts megabytes of hashes, but its bloom is still
    ``num_bits/8`` bytes.  False-positive rate ≈ (1-e^(-kn/m))^k;
    size ``num_bits`` ≈ 10–16 bits per expected key for ~1 % or
    better."""
    return bloom_words(
        bloom_positions(keys, key_col, num_bits, num_hashes), num_bits
    )


def bloom_positions(
    keys: DataFrame, key_col: str, num_bits: int, num_hashes: int = 3
) -> list[int]:
    """The distributed half of the bloom build: distinct set bit
    positions of every non-NULL key (NULL never equi-joins, so it
    contributes no bits).  Because positions are ``hash & (bits-1)``,
    a position set built at ``num_bits`` folds down to any smaller
    power of two with ``p & (smaller-1)`` — one Spark job can feed a
    whole bitmap-size grid (see :func:`bloom_words`)."""
    if num_bits & (num_bits - 1) or num_bits < 64:
        raise ValueError(f"num_bits must be a power of two >= 64, got {num_bits}")
    from week4_musemotion_spark.functions.hashing import stable_hash64

    key = F.col(key_col).cast("string")
    pos = (
        keys.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(stable_hash64(key, seed=s), num_bits)
                        for s in range(num_hashes)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    return [r.pos for r in pos.collect()]


def bloom_words(positions: list[int], num_bits: int) -> list[int]:
    """Fold a position set into the ``num_bits/64`` signed-long bitmap.
    ``positions`` may come from a LARGER power-of-two build (they are
    masked down), so a size grid shares one distributed build."""
    if num_bits & (num_bits - 1) or num_bits < 64:
        raise ValueError(f"num_bits must be a power of two >= 64, got {num_bits}")
    words = [0] * (num_bits // 64)
    for p in positions:
        p &= num_bits - 1
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    col: Column, words: list[int], num_hashes: int = 3
) -> Column:
    """Membership predicate against a :func:`build_key_bloom` bitmap —
    a pure builtin-expression column (literal long array + shifts),
    so it runs inside whole-stage codegen on the scan side, BEFORE
    any exchange.  May pass false positives (the downstream equi-join
    removes them); never drops a true key."""
    num_bits = 64 * len(words)
    from week4_musemotion_spark.functions.hashing import stable_hash64

    arr = F.array(*[F.lit(w).cast("long") for w in words])
    s_col = col.cast("string")
    conds = []
    for s in range(num_hashes):
        pos = F.pmod(stable_hash64(s_col, seed=s), num_bits)
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, pos.bitwiseAND(63).cast("int")
        ).bitwiseAND(1)
        conds.append(bit == 1)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _fast_bloom_positions(
    keys: DataFrame, key_col: str, num_bits: int, num_hashes: int
) -> list[int]:
    """Distinct set bit positions of every non-NULL key under the
    NATIVE ``xxhash64(key, seed)`` family — the probe-cost-optimized
    twin of :func:`bloom_positions` for advisory filters whose bits
    are never replayed by a SQL oracle (the portable md5 family costs
    ~50× more per probed row: string cast + concat + MD5 + hex
    substring + base conversion vs one codegen'd long hash)."""
    if num_bits & (num_bits - 1) or num_bits < 64:
        raise ValueError(f"num_bits must be a power of two >= 64, got {num_bits}")
    key = F.col(key_col).cast("long")
    pos = (
        keys.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(key, F.lit(s)), num_bits)
                        for s in range(num_hashes)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    return [r.pos for r in pos.collect()]


def _fast_might_contain(
    col: Column, words: list[int], num_hashes: int = 3
) -> Column:
    """Membership predicate under the native xxhash64 family — must
    pair with :func:`_fast_bloom_positions` (same hash family, same
    ``key.cast("long")`` canonicalization so int32/int64 key columns
    hash identically on both sides).  Pure builtin expressions: runs
    inside whole-stage codegen on the scan side, before any
    exchange."""
    num_bits = 64 * len(words)
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    probe = col.cast("long")
    out = None
    for s in range(num_hashes):
        pos = F.pmod(F.xxhash64(probe, F.lit(s)), num_bits)
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, pos.bitwiseAND(63).cast("int")
        ).bitwiseAND(1)
        cond = bit == 1
        out = cond if out is None else out & cond
    return out


def bloom_prune(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    num_bits: int = 1 << 15,
    num_hashes: int = 3,
) -> DataFrame:
    """Pre-filter ``fact`` to rows whose ``fact_key`` MIGHT appear in
    ``keys[dim_key]`` — the explicit form of a runtime bloom join
    filter (the optimization AQE's ``runtime.bloomFilter`` applies
    opportunistically), for the join shape where the dim side is too
    large to broadcast raw but its bloom is a few KB.  The pruned
    fact then feeds the real equi-join unchanged: false positives die
    there, so composite results are EXACT — the bitmap only decides
    how much of the fact table never enters the shuffle.  At 16
    bits/key the filter passes ~0.05 % of non-matching rows; a 100 TB
    fact side joining a 1 % -selective dim shuffles ~1 % instead of
    100 %.

    Hash family: the bitmap is ADVISORY (never replayed by a SQL
    oracle — the equi-join decides every result), so build and probe
    use the native ``xxhash64(key, seed)`` family instead of the
    portable md5 one: the probe predicate evaluates once per FACT row
    — the 100 TB side — and one codegen'd long hash per seed is ~50×
    cheaper per row than the md5-hex-conv chain (measured 1.0 s →
    0.1 s on a 600 k-row probe).  The oracle-replayed audits
    (q_bloom_fp_audit) keep :func:`bloom_positions` /
    :func:`bloom_might_contain`, whose portable positions a SQL
    oracle reproduces bit-for-bit."""
    pos = _fast_bloom_positions(keys, dim_key or fact_key, num_bits, num_hashes)
    w = bloom_words(pos, num_bits)
    return fact.filter(_fast_might_contain(F.col(fact_key), w, num_hashes))


# ---------------------------------------------------------------------------
# Portable count-min sketch — engine-replayable point-frequency sketch
# ---------------------------------------------------------------------------


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Per-group count-min sketch (Cormode & Muthukrishnan 2005)
    from the portable hash family, so estimates replay bit-for-bit
    in a SQL oracle — the point-frequency member of the sketch
    family (HLL: distinct, Misra-Gries: heavy hitters, bloom:
    membership).

    Layout: one row per NON-ZERO cell ``(*group_cols, j, pos, cnt,
    w, d)`` with ``pos = hash_j(value) & (width-1)`` for each of
    ``depth`` seeded hashes; ``w`` and ``d`` carry the build width
    and depth so :func:`cms_lookup` can reject a mismatched sketch
    in EITHER dimension (looking up with a larger depth than built
    would make the extra j rows miss every cell and min to 0 — a
    silent break of the never-below-true-count guarantee).

    Schema note: the ``d`` column was added in round 7 (v2 layout).
    Sketches persisted by earlier builds lack it; :func:`cms_lookup`
    recovers the build depth exactly from the cells (``max(j)+1`` —
    every value writes a row for every hash row, so j=depth-1 always
    exists in a non-empty sketch) and then enforces it like v2, while
    :func:`cms_merge`/:func:`cms_fold` require v2 — re-materialize
    old sketch parquet before merging.  State is at
    most ``depth × width`` rows per group regardless of stream size;
    two sketches merge by summing cells (:func:`cms_merge`); NULL
    values contribute nothing.  Estimates are the classic min over
    rows: never below the true count, above it only by hash-collision
    mass (ε ≈ e/width of the stream per row, δ ≈ e^-depth)."""
    if width & (width - 1) or width < 16:
        raise ValueError(f"width must be a power of two >= 16, got {width}")
    if not 1 <= depth <= 8:
        raise ValueError(f"depth must be in [1, 8], got {depth}")
    from week4_musemotion_spark.functions.hashing import stable_hash64

    v = F.col(value_col).cast("string")
    pos = F.array(
        *[stable_hash64(v, seed=j).bitwiseAND(width - 1) for j in range(depth)]
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.posexplode(pos).alias("j", "pos"))
        .groupBy(*group_cols, "j", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("w", F.lit(width).cast("int"))
        .withColumn("d", F.lit(depth).cast("int"))
    )


def cms_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two count-min sketches (same width/depth): cells sum.
    ``w`` rides the grouping key, so merging mismatched-width
    sketches keeps both and :func:`cms_lookup`'s check rejects the
    result."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "j", "pos", "w", "d")
        .agg(F.sum("cnt").alias("cnt"))
        .select(*group_cols, "j", "pos", "cnt", "w", "d")
    )


def cms_lookup(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str,
    width: int = 1024,
    depth: int = 4,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Point-frequency estimates for every row of ``terms``:
    ``(*group_cols, term_col, cms_est)`` with ``cms_est = min_j
    cnt[j][hash_j(term)]`` (absent cells read 0).  The SKETCH side is
    broadcast: it is compact by construction (at most depth × width
    non-zero cells per group), and broadcasting the build side of a
    left-outer join is the shape BroadcastHashJoin actually supports
    — hinting the preserved (terms) side would be silently ignored
    and fall back to a shuffle."""
    from week4_musemotion_spark.functions.hashing import stable_hash64

    gcols = group_cols or []
    if "d" not in sketch.columns:
        # v1 layout (pre round 7) persisted without the depth column:
        # RECOVER the build depth from the cells themselves — every
        # non-null value contributes one row per hash row j, so any
        # non-empty sketch contains j = depth-1 and max(j)+1 IS the
        # build depth exactly (an empty sketch joins nothing and every
        # estimate legitimately reads 0).  A recovered depth that
        # mismatches the lookup then FAILS the assert below — without
        # this, a lookup at depth > built would have its extra j rows
        # miss every cell and min() true counts silently down to 0.
        # Recovery is PER GROUP (two unioned v1 sketches may have been
        # built at different depths — a global max would stamp the
        # deeper one's depth on both and let the shallow group's
        # overshoot rows slip the assert).  The window is a pass over
        # the SKETCH frame only, which is compact by construction
        # (<= depth * width cells per group) and broadcast below
        # anyway.
        from pyspark.sql.window import Window

        sketch = sketch.withColumn(
            "d",
            (F.max("j").over(Window.partitionBy(*gcols)) + F.lit(1)).cast("int"),
        )
    t = F.col(term_col).cast("string")
    pos = F.array(
        *[stable_hash64(t, seed=j).bitwiseAND(width - 1) for j in range(depth)]
    )
    tpos = terms.select(
        *gcols, term_col, F.posexplode(pos).alias("j", "pos")
    )
    # the assert rides the join output (a used expression, so
    # Catalyst keeps it): any sketch row with a different build width
    # fails the job instead of silently estimating against the wrong
    # geometry.  Absent cells (join miss) carry NULL w and must pass
    # — they legitimately read 0.  (v1 sketches reach here with d
    # recovered above, so the depth check applies uniformly.)
    w_ok = F.assert_true(
        F.col("w").isNull() | ((F.col("w") == width) & (F.col("d") == depth)),
        F.lit(
            f"cms_lookup: sketch was not built with width={width}, depth={depth}"
        ),
    )
    joined = tpos.join(F.broadcast(sketch), gcols + ["j", "pos"], "left").select(
        *gcols,
        term_col,
        "j",
        F.when(w_ok.isNull(), F.coalesce(F.col("cnt"), F.lit(0))).alias("cell"),
    )
    return joined.groupBy(*gcols, term_col).agg(
        F.min("cell").cast("long").alias("cms_est")
    )


def cms_fold(
    sketch: DataFrame, new_width: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold a count-min sketch down to a SMALLER power-of-two width:
    because positions are ``hash & (width-1)``, the cells of the
    narrow sketch are exact sums of the wide sketch's cells sharing
    ``pos & (new_width-1)`` — identical to having built at
    ``new_width`` directly.  A width grid therefore costs ONE pass
    over the data (build at the grid max) plus tiny re-aggregations
    of the ≤ depth × width cell table, the same one-build trick as
    :func:`bloom_words`."""
    if new_width & (new_width - 1) or new_width < 16:
        raise ValueError(f"new_width must be a power of two >= 16, got {new_width}")
    gcols = group_cols or []
    return (
        sketch.groupBy(
            *gcols, "j", "d", F.col("pos").bitwiseAND(new_width - 1).alias("pos")
        )
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("w", F.lit(new_width).cast("int"))
        .select(*gcols, "j", "pos", "cnt", "w", "d")
    )
