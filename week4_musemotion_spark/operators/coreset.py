"""Diversity-based coreset selection — greedy k-center over an
embedding column.

Training-data selection needs more than dedup and quality filters: a
budgeted sample should COVER the embedding space, not just avoid
duplicates.  Greedy farthest-point traversal (Gonzalez 1985; the
coreset construction of Sener & Savarese 2018) is the standard
answer: repeatedly pick the point farthest from everything selected
so far.  Its guarantee — the selected set is a 2-approximation of
the optimal k-center cover — is what makes the selected radius a
meaningful coverage metric, not just a heuristic score.

Spark-first shape: the classic algorithm looks sequential (k
dependent rounds), but each round is ONE distributed pass — update
every point's min-distance-to-selected against the SINGLE new center
(a broadcast one-row literal), then take the argmax.  The per-point
state column makes each round O(n·d) with no rescans of earlier
centers; the round count k is small by construction (a selection
budget), so the driver-side loop is bounded the same way the CC
pointer-jumping loop is.

Determinism contract (oracle-grade): distances are EXACT integer
squared distances over e6-quantized components (decimal(38,0)
accumulation — no float order-of-addition anywhere), the seed is the
minimum id, and argmax ties break to the minimum id — the same ids
come out on any partitioning, any engine, making the operator
value-oracle-able by an unrolled per-round SQL or a reference
implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import dec

#: Fixed-point scale shared with the cosine/linalg family.
_Q = 1_000_000


def _dist2(vec_col, center: list[int]):
    """Exact integer squared distance between the quantized vector
    column and a Python-literal center: Σ_d (q_d − c_d)², accumulated
    in decimal(38,0) so dimension count and magnitude cannot wrap."""
    c = F.array(*[F.lit(int(v)).cast("long") for v in center])
    # widen BEFORE squaring: a long (a-b)^2 wraps silently past
    # component diffs of ~3.0e9 (raw |x| ≳ 3037 at the e6 scale)
    terms = F.zip_with(vec_col, c, lambda a, b: dec(a - b) * (a - b))
    return F.aggregate(terms, F.lit(0).cast("decimal(38,0)"), lambda acc, t: acc + t)


def k_center_select(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[dict]:
    """Greedy k-center selection: ``k`` rows covering the embedding
    space, as a list of ``{"round", "id", "radius_num"}`` dicts in
    selection order.  ``radius_num`` is the selected point's exact
    integer squared distance (e12 units) to the previously selected
    set — non-increasing by construction, and the round-r value is
    the coverage radius² the first r centers achieve on this corpus.
    Round 0 (the min-id seed) has radius None.

    The return is driver-side data ON PURPOSE: k is a selection
    budget (tens, not millions), and the selected centers are what a
    caller broadcasts into the assignment join
    (:func:`assign_to_centers`).  The per-round work — the state
    update and the argmax — is fully distributed; nothing O(n)
    reaches the driver."""
    if k < 1:
        raise ValueError(f"k_center_select: k must be >= 1, got {k}")
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * _Q + F.lit(0.5)).cast("long"),
    )
    state = df.select(F.col(id_col).alias("_id"), q.alias("_q"))
    seed = state.orderBy("_id").limit(1).first()
    if seed is None:
        raise ValueError("k_center_select: empty input")
    if seed._q is None or any(v is None for v in seed._q):
        raise ValueError(
            f"k_center_select: null {vec_col!r} embedding on seed row "
            f"{id_col}={seed._id} — filter null/partial vectors upstream"
        )
    selected = [{"round": 0, "id": seed._id, "radius_num": None}]
    center = list(seed._q)
    state = state.withColumn("_mind", F.lit(None).cast("decimal(38,0)"))
    for rnd in range(1, k):
        nd = _dist2(F.col("_q"), center)
        # fail-loudly posture (matches embedding_dispersion's ragged
        # guard): a null/ragged vector yields null distance, which
        # would otherwise leave the row silently never-selected
        nd = F.when(
            F.assert_true(
                nd.isNotNull(),
                F.lit(
                    f"k_center_select: null or ragged {vec_col!r} embedding "
                    "— every row must carry a complete vector"
                ),
            ).isNull(),
            nd,
        )
        state = state.withColumn(
            "_mind", F.least(F.coalesce(F.col("_mind"), nd), nd)
        ).localCheckpoint(eager=False)  # k rounds: cut the lineage per
        # round; lazy — the pick action below materializes it in the
        # same job (eager paid a second blocking job per round)
        chosen_ids = [s["id"] for s in selected]
        pick = (
            state.filter(~F.col("_id").isin(chosen_ids))
            .orderBy(F.desc("_mind"), "_id")
            .limit(1)
            .first()
        )
        if pick is None:  # fewer than k distinct rows
            break
        selected.append(
            {"round": rnd, "id": pick._id, "radius_num": int(pick._mind)}
        )
        center = list(pick._q)
    return selected


def assign_to_centers(
    df: DataFrame,
    centers: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    center_id_col: str = "center_id",
) -> DataFrame:
    """Every row assigned to its nearest selected center (exact
    integer distances, ties to the smallest center id) — the second
    half of coreset selection: the assignment sizes are the cluster
    budget report, and the max assigned distance is the realized
    coverage radius.  One broadcast join (centers are k rows) + one
    per-row argmin; the corpus never shuffles."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * _Q + F.lit(0.5)).cast("long"),
    )
    cq = F.transform(
        F.col(f"c_{vec_col}"),
        lambda x: F.floor(x.cast("double") * _Q + F.lit(0.5)).cast("long"),
    )
    c = centers.select(
        F.col(center_id_col).alias("_cid"), F.col(vec_col).alias(f"c_{vec_col}")
    )
    # dec BEFORE the square — same wrap guard as _dist2
    terms = F.zip_with(q, cq, lambda a, b: dec(a - b) * (a - b))
    d2 = F.aggregate(terms, F.lit(0).cast("decimal(38,0)"), lambda acc, t: acc + t)
    joined = df.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(c))
    # same fail-loudly guard as k_center_select: a null/ragged vector
    # on either side nulls d2, and Spark's NULLS-FIRST asc sort would
    # then "assign" the row to an arbitrary center silently
    d2 = F.when(
        F.assert_true(
            d2.isNotNull(),
            F.lit(
                f"assign_to_centers: null or ragged {vec_col!r} embedding "
                "(row or center) — every vector must be complete"
            ),
        ).isNull(),
        d2,
    )
    ranked = joined.select(
        id_col,
        F.col("_cid"),
        d2.alias("_d2"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.asc("_d2"), F.asc("_cid"))
    return (
        ranked.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(id_col),
            F.col("_cid").alias(center_id_col),
            F.col("_d2").cast("decimal(38,0)").cast("string").alias("dist2_num"),
        )
    )
