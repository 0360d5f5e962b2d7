"""Linear quality probe — exact-integer batch perceptron over an
embedding column.

Classifier-based filtering is the modern curation workhorse (a
learned quality/domain probe scores every document; the corpus is
filtered or reweighted by the score).  The training step usually
gets shipped off-cluster; this operator trains the simplest useful
probe — a batch perceptron (Rosenblatt 1958, batch form) — ON the
cluster, with the repo's exactness discipline so the fitted weights
are bit-identical on any partitioning and replayable by a SQL
oracle or a sequential reference:

- features are e6-quantized with the linalg family's IEEE-pinned
  ``floor(x * 1e6 + 0.5)`` (identical in Spark, DuckDB, numpy);
- the batch update ``w += Σ_{misclassified} y·x`` is a SUM — order-
  independent by construction, so no float-accumulation or
  visit-order nondeterminism exists anywhere;
- dot products and per-dimension update sums accumulate in
  decimal(38,0) (DuckDB: HUGEINT): at corpus scale a long dot
  (|w| ≤ iters·n·5e5 after updates) wraps silently past ~1e11 rows
  while the decimal path stays exact;
- the margin convention is the classic perceptron one: ``y·score
  <= 0`` counts as misclassified (the zero-score seed round updates
  on EVERY row, making iteration 1 exactly ``w = Σ y·x``).

Spark-first shape: like :mod:`operators/coreset.py`, the loop looks
sequential but each iteration is ONE distributed aggregation — score
every row against the broadcast weight literal (JVM-side
``zip_with``/``aggregate``, no Python in the hot path), posexplode
the misclassified rows' features, and map-side-combine to d rows.
The driver holds only the d-long weight vector; iteration count is a
small training budget, bounded the same way the CC pointer-jumping
round count is.

Reference analogue: generalizes the reference's fixed scalar quality
predicates (musemotion ETL keeps rows by hand-tuned thresholds) to a
LEARNED filter, the way q_unigram_surprisal generalizes them to a
corpus-fitted model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import dec
from week4_musemotion_spark.functions.vector import long_array_lit

#: Fixed-point feature scale, shared with the linalg/coreset family.
_Q = 1_000_000

#: The IEEE-pinned quantizer (Spark SQL side) — identical text to the
#: DuckDB oracle's list_transform lambda, so the integers agree
#: bit-for-bit (linalg._quantize is the numpy third form).
_QUANT_SQL = (
    "transform({col}, x -> "
    f"CAST(floor(CAST(x AS DOUBLE) * {_Q} + 0.5) AS BIGINT))"
)


def quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add ``qv`` — the e6-quantized integer feature vector."""
    return df.withColumn("qv", F.expr(_QUANT_SQL.format(col=vec_col)))


def _bad_components(vec_col: str) -> Column:
    """True when any RAW component is null, NaN, or ±Inf — the three
    inputs ansi-off quantization silently mangles (null dot, 0,
    Long.MaxValue respectively).  DuckDB additionally ERRORS casting
    NaN/Inf to BIGINT, so an unguarded oracle would diverge outright."""
    return F.exists(
        F.col(vec_col),
        lambda x: x.isNull()
        | F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == F.lit(float("inf"))),
    )


def _score(w: list[int]):
    """Exact integer dot of the quantized feature column against the
    broadcast weight literal, accumulated in decimal(38,0)."""
    prods = F.zip_with(F.col("qv"), long_array_lit(w), lambda a, b: dec(a) * b)
    return F.aggregate(prods, F.lit(0).cast("decimal(38,0)"), lambda acc, t: acc + t)


def perceptron_fit(
    df: DataFrame,
    positive_label,
    label_col: str = "label",
    vec_col: str = "embedding",
    iters: int = 3,
) -> list[dict]:
    """Train a batch perceptron separating ``label == positive_label``
    from the rest; returns one dict per iteration:
    ``{"iter", "n_err", "w"}`` where ``n_err`` counts misclassified
    rows under the weights ENTERING the iteration and ``w`` is the
    d-long integer weight vector AFTER its update.

    Fails loudly on null or ragged embedding rows (the coreset /
    dispersion posture) instead of silently excluding them from the
    update sum."""
    if iters < 1:
        raise ValueError(f"perceptron_fit: iters must be >= 1, got {iters}")
    base = (
        quantized(df, vec_col)
        .select(
            F.when(F.col(label_col) == positive_label, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("y"),
            "qv",
            # checked on the RAW components: a NaN input casts to 0
            # and ±Inf saturates to Long.MaxValue under ansi-off
            # quantization (silently-poisoned features), and a null
            # element nulls the whole dot (a silently-dropped row) —
            # all refused loudly
            _bad_components(vec_col).alias("bad"),
        )
        .localCheckpoint(eager=False)  # iters aggregates share one scan
    )
    dims = (
        base.agg(
            F.countDistinct(F.size("qv")).alias("n_sizes"),
            F.min(F.size("qv")).alias("d"),
            F.sum(F.when(F.col("qv").isNull(), 1).otherwise(0)).alias("n_null"),
            F.sum(F.when(F.col("bad"), 1).otherwise(0)).alias("n_bad_elem"),
        ).first()
    )
    if dims.n_null or dims.n_bad_elem or dims.n_sizes != 1 or not dims.d:
        raise ValueError(
            f"perceptron_fit: null or ragged {vec_col!r} rows "
            f"({dims.n_null} null, {dims.n_bad_elem} with null/NaN "
            f"components, {dims.n_sizes} distinct lengths, min dim "
            f"{dims.d}) — filter upstream (see q_embedding_hygiene)"
        )
    d = dims.d
    w = [0] * d
    out = []
    for t in range(1, iters + 1):
        mis = base.filter(F.col("y") * _score(w) <= 0)
        rows = (
            mis.select("y", F.posexplode("qv").alias("pos", "q"))
            .groupBy("pos")
            .agg(
                # widen INSIDE the aggregation (y*q is a safe long
                # product — |y| = 1 — but the SUM is corpus-sized)
                F.sum(dec(F.col("y") * F.col("q"))).alias("delta"),
                F.sum(F.lit(1)).alias("n"),
            )
            .collect()
        )
        n_err = int(rows[0].n) if rows else 0
        for r in rows:
            w[r.pos] += int(r.delta)
        out.append({"iter": t, "n_err": n_err, "w": list(w)})
        if n_err == 0:
            break
    return out


def score_probe(df: DataFrame, w: list[int], vec_col: str = "embedding") -> DataFrame:
    """Score every row with a fitted weight vector: adds ``margin``
    (the exact integer score, decimal(38,0) — emit as a digit string
    if it leaves the engine) and ``pred`` (+1/-1, zero scoring
    negative, matching the training convention).

    Fails at execution (not silently) on a weight/embedding dimension
    mismatch or null/NaN/Inf components — without the guard, zip_with
    null-pads the shorter side, margin goes NULL, and every such row
    would come out pred=-1."""
    ok = F.assert_true(
        (F.size("qv") == F.lit(len(w))) & ~_bad_components(vec_col),
        F.lit(
            f"score_probe: {vec_col!r} row with wrong dimension (want "
            f"{len(w)}) or null/NaN/Inf components — filter upstream"
        ),
    )
    # the assert rides the USED margin expression (Catalyst prunes a
    # bare assert_true column); NULL-on-success per F.when pattern
    margin = F.when(ok.isNull(), _score(w))
    return (
        quantized(df, vec_col)
        .select("*", margin.alias("margin"))
        .withColumn(
            "pred",
            F.when(F.col("margin") > 0, F.lit(1)).otherwise(F.lit(-1)).cast("long"),
        )
        .drop("qv")
    )
