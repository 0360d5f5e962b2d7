"""Behavioral / audit battery: customer-lifecycle analytics on the
order history and statistical drift audits on the corpus — the
"who buys how" and "did my data shift" shapes, all exact-integer
(functions/exact.py) so the DuckDB oracles hash-match.

Reference parity: the reference's dashboard aggregates one frame at
a time (streamlit_app.py:180-190); these add the multi-pass
customer-lifetime and independence-audit shapes a warehouse actually
runs.  Scale notes: every query is keyed-window or keyed-agg shaped;
the contingency audit is two tiny grouped aggs joined back; nothing
is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.exact import (
    dec,
    int_div_round_dec,
    int_div_round_sql,
    sum_money,
    sum_money_sql,
)
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table


@query(
    "q_order_gaps",
    covers=("X-ORDER-GAPS",),
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders
    )
    SELECT o_custkey AS custkey,
           CAST(count(*) + 1 AS BIGINT) AS n_orders,
           CAST(min(gap_days) AS BIGINT) AS min_gap,
           CAST(max(gap_days) AS BIGINT) AS max_gap,
           CAST(median(gap_days) AS DOUBLE) AS median_gap
    FROM seq WHERE gap_days IS NOT NULL
    GROUP BY o_custkey HAVING count(*) >= 2
    """,
)
def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase gap profile per customer: LAG over the per-
    customer order timeline (orderkey tie-break makes same-day
    sequences deterministic), then min/max/median whole-day gaps for
    customers with ≥ 3 orders.  Median of integer gaps interpolates
    to an exact .5 — representable exactly in binary, so both engines
    agree bit-for-bit (the one interpolation case where float median
    IS engine-stable).  Scale: one keyed shuffle + one keyed agg."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return (
        seq.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            (F.count(F.lit(1)) + 1).cast("long").alias("n_orders"),
            F.min("gap_days").cast("long").alias("min_gap"),
            F.max("gap_days").cast("long").alias("max_gap"),
            F.median("gap_days").cast("double").alias("median_gap"),
        )
        .filter(F.col("n_orders") >= 3)
    )


@query(
    "q_basket_affinity",
    covers=("X-BASKET",),
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS cnt
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT part_a, part_b, CAST(cnt AS BIGINT) AS cnt,
           pa.p_name AS name_a, pb.p_name AS name_b
    FROM pairs JOIN part pa ON part_a = pa.p_partkey
               JOIN part pb ON part_b = pb.p_partkey
    ORDER BY cnt DESC, part_a, part_b LIMIT 25
    """,
)
def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 25 part pairs most often bought in
    the same order.  The pair expansion self-joins lineitem on the
    order key, so its cost is Σ C(basket,2) — quadratic only in
    BASKET size (~4 here), linear in order count; the global pair
    count is one keyed agg and the part names broadcast.  The fact-
    fact same-key self-join inherits lineitem's bucketing (zero extra
    shuffle on bucketed tables).  Training-data analog: co-occurrence
    mining over grouped records rather than documents."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        pairs.join(F.broadcast(part).alias("pa"), F.col("part_a") == F.col("pa.p_partkey"))
        .join(F.broadcast(part).alias("pb"), F.col("part_b") == F.col("pb.p_partkey"))
        .select(
            "part_a",
            "part_b",
            "cnt",
            F.col("pa.p_name").alias("name_a"),
            F.col("pb.p_name").alias("name_b"),
        )
        .orderBy(F.col("cnt").desc(), "part_a", "part_b")
        .limit(25)
    )


@query(
    "q_rfm_segments",
    covers=("X-RFM",),
    oracle=f"""
    WITH base AS (
        SELECT o_custkey AS custkey,
               date_diff('day', max(o_orderdate), TIMESTAMP '2002-01-01') AS recency_days,
               count(*) AS frequency,
               {sum_money_sql("o_totalprice")} AS monetary_cents
        FROM orders GROUP BY o_custkey
    )
    SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency, monetary_cents,
           CAST(5 - ntile(4) OVER (ORDER BY recency_days, custkey) AS BIGINT) AS r_score,
           CAST(ntile(4) OVER (ORDER BY frequency, custkey) AS BIGINT) AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary_cents, custkey) AS BIGINT) AS m_score
    FROM base
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation: one grouped
    pass over orders builds the three exact-integer dimensions
    (recency against a pinned reference date, monetary in cents),
    then three NTILE(4) quartile scores over total deterministic
    orders (custkey tie-break; recency quartiles inverted so 4 =
    most recent).  Scale: the base agg is keyed on customer; each
    quartile score is a DISTRIBUTED global NTILE (operators/ranks —
    range repartition + offsets, never the single-task unpartitioned
    window) over the already-aggregated one-row-per-customer table,
    not over the fact."""
    from week4_musemotion_spark.operators.ranks import global_ntile

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("2002-01-01").cast("timestamp"), F.max("o_orderdate")
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        sum_money("o_totalprice").alias("monetary_cents"),
    )
    n = base.count()  # one job; shared by all three quartile passes
    scored = global_ntile(base, ["recency_days", "custkey"], 4, "_r", n=n)
    scored = global_ntile(scored, ["frequency", "custkey"], 4, "_f", n=n)
    scored = global_ntile(scored, ["monetary_cents", "custkey"], 4, "_m", n=n)
    return scored.select(
        "custkey",
        F.col("recency_days").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary_cents",
        (5 - F.col("_r")).cast("long").alias("r_score"),
        F.col("_f").cast("long").alias("f_score"),
        F.col("_m").cast("long").alias("m_score"),
    )


@query(
    "q_vocab_growth",
    covers=("X-VOCAB-GROWTH",),
    oracle="""
    WITH bg AS (
        SELECT doc_id, array_to_string(a[i:i+1], ' ') AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
             unnest(generate_series(1, greatest(len(a) - 1, 0))) t(i)
    ),
    first_seen AS (
        SELECT bigram, min(doc_id) AS first_doc FROM bg GROUP BY bigram
    ),
    buckets AS (
        SELECT first_doc // 50 AS bucket, count(*) AS n_new
        FROM first_seen GROUP BY first_doc // 50
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_new AS BIGINT) AS n_new_bigrams,
           CAST(sum(n_new) OVER (ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bigrams
    FROM buckets
    """,
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth audit: word-bigram first-occurrence
    curve in ingestion (doc_id) order, bucketed per 50 documents with
    a running cumulative total.  A corpus whose curve flattens early
    is recycling phrasing (crawl loops, boilerplate); a healthy crawl
    keeps discovering types.  Scale: first-occurrence is min(doc_id)
    per bigram (one keyed agg over the shingle explosion); the bucket
    rollup and cumulative window act on the bucket table (corpus/50
    rows) — at much larger corpora, widen the bucket so the curve
    stays thousands of points, which is all a growth audit needs."""
    from week4_musemotion_spark.operators.dedup import shingle_strings

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bg = shingle_strings(docs, "text", "doc_id", n=2).select(
        F.col("_id").alias("doc_id"), F.col("s").alias("bigram")
    )
    first_seen = bg.groupBy("bigram").agg(F.min("doc_id").alias("first_doc"))
    buckets = (
        first_seen.groupBy((F.col("first_doc") / 50).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return buckets.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_new").cast("long").alias("n_new_bigrams"),
        F.sum("n_new").over(w).cast("long").alias("cum_bigrams"),
    )


@query(
    "q_lang_source_drift",
    covers=("X-CHI2-DRIFT",),
    oracle=f"""
    WITH obs AS (
        SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
    ),
    m AS (
        SELECT o.lang, o.source, o.n,
               sum(o.n) OVER (PARTITION BY o.lang) AS row_tot,
               sum(o.n) OVER (PARTITION BY o.source) AS col_tot,
               sum(o.n) OVER () AS total
        FROM obs o
    )
    SELECT lang, source, CAST(n AS BIGINT) AS n,
           {int_div_round_sql("row_tot * col_tot * 10000", "total")} AS expected_e4,
           {int_div_round_sql(
               "(n * total - row_tot * col_tot) * (n * total - row_tot * col_tot) * 10000",
               "total * row_tot * col_tot",
           )} AS chi2_e4
    FROM m
    """,
)
def q_lang_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language×source independence audit: per contingency cell the
    observed count, the independence-expected count, and the χ² cell
    contribution (obs·total − row·col)²/(total·row·col) — all exact
    integer arithmetic at e4 scale, so no float division can drift a
    cell.  A source whose cells carry outsized χ² is shifting its
    language mix — the drift alarm a crawl pipeline wants.  Scale:
    one grouped count plus three window totals over a cells table
    whose size is |langs|×|sources|, not corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    # dev = n·total − row·col reaches ~N²/4 and dev² ~N⁴/16: far past
    # 2^63 on real corpora, and ansi=false would WRAP silently while
    # the oracle's window sums promote to HUGEINT — widen everything
    # to decimal(38,0) (functions/exact.dec) before multiplying
    m = obs.select(
        "lang",
        "source",
        "n",
        F.sum(dec(F.col("n"))).over(Window.partitionBy("lang")).alias("row_tot"),
        F.sum(dec(F.col("n"))).over(Window.partitionBy("source")).alias("col_tot"),
        F.sum(dec(F.col("n"))).over(Window.partitionBy()).alias("total"),
    )
    dev = dec(F.col("n")) * F.col("total") - F.col("row_tot") * F.col("col_tot")
    return m.select(
        "lang",
        "source",
        F.col("n").cast("long").alias("n"),
        int_div_round_dec(
            F.col("row_tot") * F.col("col_tot") * 10000, F.col("total")
        ).alias("expected_e4"),
        int_div_round_dec(
            dev * dev * 10000, F.col("total") * F.col("row_tot") * F.col("col_tot")
        ).alias("chi2_e4"),
    )


@query(
    "q_halflife_decay_score",
    covers=("X-DECAY-SCORE",),
    oracle="""
    WITH ranked AS (
        SELECT user_id,
               CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS c,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS j
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_recent,
           CAST(sum(c * (CAST(1 AS BIGINT) << (16 - j))) AS BIGINT)
               AS decay_cents_x32768
    FROM ranked WHERE j <= 16
    GROUP BY user_id
    """,
)
def q_halflife_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed user engagement score — the half-life weighting
    every freshness-sensitive ranking/curation pipeline wants, made
    EXACT: each of a user's 16 most recent events contributes
    ``cents(value) · 2^(16-j)`` (j = recency rank), i.e. the classic
    α=½ exponential decay in fixed-point — halving is a binary shift,
    so the score is a pure integer with zero float accumulation and
    hash-matches any engine (the float formulation Σ v·0.5^j diverges
    by summation order).  Most-recent weight is 2¹⁵ = 32768 (the
    ``_x32768`` unit); the 16-step window is where 2⁻¹⁶ ≈ leverage
    zero anyway.

    Scale shape: one keyed window (row_number per user, ts+event_id
    total order) + one keyed agg — a single shuffle on user_id; the
    shift weighting is per-row codegen."""
    from week4_musemotion_spark.functions.exact import cents

    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    c = cents(F.coalesce(F.col("value"), F.lit(0.0)))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = e.select(
        "user_id", c.alias("c"), F.row_number().over(w).alias("j")
    ).filter(F.col("j") <= 16)
    return ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_recent"),
        F.sum(F.expr("c * shiftleft(CAST(1 AS BIGINT), 16 - j)"))
        .cast("long")
        .alias("decay_cents_x32768"),
    )
