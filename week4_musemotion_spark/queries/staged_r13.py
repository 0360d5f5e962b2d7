"""Round-13 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: see the verify-skill
rotation note).

Wave theme: streaming quantiles + exact selection + packing audit.

- q_stream_len_quantiles — per-source document-length quantiles read
  from the STREAMING log-bucket sketch store
  (``streaming/quantiles.py``): the corpus is replayed as micro-
  batches through the txn-marker ``foreachBatch`` sink (one batch
  deliberately REPLAYED to pin exactly-once, the log compacted
  mid-stream to pin the manifest flip), then the readout folds the
  committed partials.  Because the sketch's merge IS addition, the
  streamed result equals the batch q_len_quantiles to the digit —
  one DuckDB oracle pins both the sketch math AND the store's
  exactly-once protocol end to end.

- q_len_quantiles_exact — the EXACT-selection twin of the sketch:
  per-source p50/p90/p99 by grouped value counts + cumulative pick.
  State is |distinct values| per group — right when the value domain
  is bounded (lengths, ratings), wrong for unbounded domains, which
  is exactly the trade the sketch exists for; shipping both makes
  the choice explicit and their agreement (exact >= sketch lb,
  within a quarter-octave) is pinned in pytest.
- q_price_quantiles_nation — the sketch on the BUSINESS side: order
  value quantiles (exact cents) per customer nation, composing a
  broadcast dim join under the sketch build — shows the operator is
  not text-only and that the join happens BELOW the collapse to
  bucket rows.
- q_packing_boundaries — concat-and-chunk packing audit: lay the
  corpus out in deterministic doc_id order, split into fixed
  context windows (the GPT-style pretraining layout), and count per
  source how many documents straddle a window boundary (their loss
  context gets truncated).  The global token offsets come from the
  distributed two-pass cumsum (operators/ranks.py) — no
  single-partition window at any scale.

Differential evidence: tests/test_staged_r13.py (conftest.staged_diff
at sf0.001; sf0.01/sf0.1 via ``tools/check_correctness.py --staged``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.operators.qsketch import quantiles_sql
from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

# chains staged_r12 -> r11 -> r10 -> r9 registration
import week4_musemotion_spark.queries.staged_r12  # noqa: F401

#: Micro-batch count for the replayed corpus stream.
_QS_BATCHES = 6


def _build_qsketch_store(spark: SparkSession, sf_dir: str, tmp: str) -> None:
    """Drive the sink exactly as a foreachBatch stream would, plus the
    two fault-injection moves a test must pin: one batch REPLAYED
    (marker short-circuit) and one mid-stream compaction (manifest
    flip) — if either broke exactly-once, the oracle diff would
    catch it as a wrong bucket count."""
    from week4_musemotion_spark.streaming.counts import compact_counts
    from week4_musemotion_spark.streaming.quantiles import make_qsketch_sink

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("doc_len")
    )
    store = os.path.join(tmp, "store")
    sink = make_qsketch_sink(["source"], "doc_len", store)
    for b in range(_QS_BATCHES):
        batch = d.filter(F.col("doc_id") % _QS_BATCHES == b)
        sink(batch, b)
        if b == 1:
            sink(batch, b)  # replay: the commit marker must no-op it
        if b == 3:
            compact_counts(spark, store)  # fold the first four batches
    open(os.path.join(tmp, "_SUCCESS"), "w").close()


def _qsketch_store_fixture(spark: SparkSession, sf_dir: str) -> str:
    from week4_musemotion_spark.queries.pipeline_ops import cached_fixture

    return cached_fixture(
        "musemotion_qsketch_store",
        sf_dir,
        f"qsketch_store:{_QS_BATCHES}".encode(),
        lambda tmp: _build_qsketch_store(spark, sf_dir, tmp),
        table="documents",  # fingerprint the table the store is BUILT from
    )


@query(
    "q_stream_len_quantiles",
    covers=("X-STREAM-QSKETCH",),
    oracle="WITH src AS (SELECT source, length(text) AS v FROM documents)"
    + quantiles_sql("src", ["source"], "v"),
)
def q_stream_len_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length quantiles from the STREAMING sketch store —
    the unbounded-corpus form of q_len_quantiles.  The fixture
    replays the corpus as micro-batches through the txn-marker sink
    (one batch duplicated, the log compacted mid-stream), and the
    readout folds only committed, not-yet-folded partials; the
    oracle is the BATCH quantile SQL over the whole table, which the
    streamed result must match to the digit because bucket-count
    merge is exact addition.  One oracle therefore pins the sketch
    arithmetic, the marker protocol, and the compaction manifest
    flip in a single hash.

    Scale shape: each micro-batch writes O(|batch| → buckets) rows;
    read-side state is O(sources × ~260) regardless of stream
    length; compaction keeps the log's file count bounded."""
    from week4_musemotion_spark.streaming.quantiles import read_quantiles

    tmp = _qsketch_store_fixture(spark, sf_dir)
    return read_quantiles(
        spark,
        os.path.join(tmp, "store"),
        ["source"],
        empty_schema="source string, bucket int, cnt long",
    )


# ---------------------------------------------------------------------------
# Exact-selection quantiles (the sketch's exact twin)
# ---------------------------------------------------------------------------

_EXACT_PS = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


@query(
    "q_len_quantiles_exact",
    covers=("X-QUANTILE-EXACT",),
    oracle="""
    WITH c AS (
        SELECT source, length(text) AS v, count(*) AS cnt
        FROM documents GROUP BY 1, 2
    ),
    w AS (
        SELECT source, v, cnt,
               sum(cnt) OVER (PARTITION BY source ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(cnt) OVER (PARTITION BY source) AS n
        FROM c
    )
    SELECT source, CAST(max(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN v END) AS BIGINT) AS p50,
           CAST(min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN v END) AS BIGINT) AS p90,
           CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS BIGINT) AS p99
    FROM w GROUP BY source
    """,
)
def q_len_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-source length quantiles by distributed selection:
    group by (source, value), cumulative-count window ordered by
    value, take the smallest value whose cumulative count reaches
    ceil(p·n) — the same readout arithmetic as the log-bucket sketch
    but over exact values, so the answer is the true order statistic.

    When to use which (the pair is deliberate): this path's state is
    |distinct values| per group — perfect for bounded domains like
    byte lengths or ratings, unbounded for arbitrary longs, which is
    exactly the case the O(260)-bucket sketch covers.  The sketch's
    lower-bound contract (sketch_p <= exact_p, within a quarter
    octave) is pinned against this query in pytest."""
    from pyspark.sql import Window
    from week4_musemotion_spark.functions.exact import int_div_trunc

    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", F.length("text").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wc = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("source")
    w = c.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "n", F.sum("cnt").over(wn)
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for name, pn, pd_ in _EXACT_PS:
        k = int_div_trunc(F.col("n") * pn + (pd_ - 1), F.lit(pd_))
        aggs.append(
            F.min(F.when(F.col("cum") >= k, F.col("v"))).cast("long").alias(name)
        )
    return w.groupBy("source").agg(*aggs)


# ---------------------------------------------------------------------------
# Concat-and-chunk packing audit
# ---------------------------------------------------------------------------

#: Context-window size (tokens) for the packing layout.
_PACK_WINDOW = 512


@query(
    "q_packing_boundaries",
    covers=("X-PACKING-AUDIT",),
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(text, '\s+'), w -> w != '')) AS nt
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, nt,
               sum(nt) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t WHERE nt >= 1
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER ((cum - nt) // {_PACK_WINDOW} != (cum - 1) // {_PACK_WINDOW}) AS BIGINT)
               AS n_straddlers,
           CAST(CAST(count(*) FILTER ((cum - nt) // {_PACK_WINDOW} != (cum - 1) // {_PACK_WINDOW}) AS HUGEINT)
                * 1000000 // count(*) AS BIGINT) AS straddle_ppm
    FROM c GROUP BY source
    """,
)
def q_packing_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing audit: lay every document's tokens
    out in deterministic doc_id order, cut the stream into fixed
    512-token (``_PACK_WINDOW``) context windows (the GPT-style pretraining
    layout), and report per source how many documents STRADDLE a
    window boundary — the docs whose loss context gets truncated
    mid-document.  A source with a high straddle share is dominated
    by documents longer than the window (or unluckily interleaved);
    the number feeds the choice between plain chunking, doc-boundary
    packing, and best-fit bin packing.

    Scale shape: the only global structure is the running token
    offset, computed with the two-pass range-partition cumsum
    (``operators/ranks.with_global_cumsum`` — the P-row offset table
    is the single-partition work, never the corpus), then one
    per-source aggregate.  Straddle test is pure integer arithmetic
    on (start, end) offsets."""
    from week4_musemotion_spark.functions.exact import dec, int_div_trunc
    from week4_musemotion_spark.functions.text import tokens
    from week4_musemotion_spark.operators.ranks import with_global_cumsum

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(tokens(F.col("text"))).cast("long").alias("nt")
    ).filter(F.col("nt") >= 1)
    c = with_global_cumsum(t, ["doc_id"], "nt", out_col="cum")
    straddle = int_div_trunc(F.col("cum") - F.col("nt"), F.lit(_PACK_WINDOW)) != int_div_trunc(
        F.col("cum") - 1, F.lit(_PACK_WINDOW)
    )
    return c.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.count(F.when(straddle, 1)).cast("long").alias("n_straddlers"),
        int_div_trunc(
            dec(F.count(F.when(straddle, 1))) * 1_000_000, F.count(F.lit(1))
        ).alias("straddle_ppm"),
    )


# ---------------------------------------------------------------------------
# Money quantiles per nation (sketch x dimension join)
# ---------------------------------------------------------------------------


@query(
    "q_price_quantiles_nation",
    covers=("X-QSKETCH-MONEY",),
    oracle="""WITH src AS (
        SELECT n.n_name AS nation, CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    )"""
    + quantiles_sql("src", ["nation"], "v"),
)
def q_price_quantiles_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value quantiles (p50/p90/p99 of exact integer cents) per
    customer nation off the log-bucket sketch — the business-side
    exercise of ``operators/qsketch``: what a revenue dashboard's
    "typical vs whale order by market" tile reads, at O(nations ×
    ~260) state instead of a per-nation sort.

    Scale shape: the nation attribution joins BELOW the sketch build
    — orders ⋈ customer shuffles on the customer key once (or rides
    bucketed layouts at scale), nation broadcasts, and only then
    does the grouped bucket count collapse everything; the quantile
    readout never sees a row of fact data.  Money enters as exact
    cents (``functions/exact.cents``) so the bucket boundaries are
    engine-identical."""
    from week4_musemotion_spark.functions.exact import cents
    from week4_musemotion_spark.operators.qsketch import (
        bucket_counts,
        quantiles_from_counts,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    src = (
        o.select("o_custkey", cents(F.col("o_totalprice")).alias("v"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("nation", "v")
    )
    return quantiles_from_counts(bucket_counts(src, ["nation"], "v"), ["nation"])
