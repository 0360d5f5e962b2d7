"""Semantic invariants for the lifecycle/layout/graph battery
(queries/lifecycle.py).  The DuckDB hash-parity of each query is
covered by the driver gate / tools.check_correctness; these pin the
*meaning* so a refactor that stays self-consistent but changes
semantics still fails."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _run(spark, name):
    from week4_musemotion_spark.queries import REGISTRY

    return REGISTRY[name].builder(spark, SF_SMOKE)


def test_funnel_monotone_and_ordered(spark):
    rows = {r["stage"]: r for r in _run(spark, "q_funnel_conversion").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["stage_name"] == "view"
    # strictly-ordered funnel: stage counts can never grow
    assert rows[1]["users"] >= rows[2]["users"] >= rows[3]["users"]
    assert rows[1]["conv_from_entry_e4"] == 10_000
    for s in (2, 3):
        assert 0 <= rows[s]["conv_from_entry_e4"] <= 10_000


def test_funnel_requires_strict_event_order(spark):
    """A user whose purchase precedes their first view must not count
    at stage 3 — build a 2-user micro-stream and run the same stage
    logic shape through the registry query by pointing it at a temp
    parquet dir."""
    import datetime as dt

    rows = [
        # u1: view < click < purchase  -> reaches stage 3
        (1, dt.datetime(2024, 1, 1, 0), 10, "view", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 1), 10, "click", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 2), 10, "purchase", 0.0, "{}"),
        # u2: purchase BEFORE view -> stops at stage 1 (no later click)
        (4, dt.datetime(2024, 1, 1, 0), 20, "purchase", 0.0, "{}"),
        (5, dt.datetime(2024, 1, 1, 1), 20, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        from week4_musemotion_spark.queries import REGISTRY

        got = {
            r["stage"]: r["users"]
            for r in REGISTRY["q_funnel_conversion"].builder(spark, d).collect()
        }
    assert got == {1: 2, 2: 1, 3: 1}


def test_cohort_retention_baseline_is_full(spark):
    df = _run(spark, "q_cohort_retention")
    rows = df.collect()
    assert all(r["month_offset"] >= 0 for r in rows)
    # offset-0 cell of every cohort retains 100% by construction
    for r in rows:
        if r["month_offset"] == 0:
            assert r["retention_e4"] == 10_000
        assert 0 < r["retention_e4"] <= 10_000


def test_mad_outliers_bounds(spark):
    rows = _run(spark, "q_mad_outliers").collect()
    assert rows, "expected one row per return flag"
    for r in rows:
        assert r["mad_cents"] >= 0
        assert r["n_outliers"] <= r["n"]
        # by definition at most half the mass sits beyond 1 MAD, and
        # 3*MAD is stricter still
        assert r["n_outliers"] <= r["n"] / 2 + 1
        assert r["max_dev_cents"] >= r["mad_cents"]


def test_rank_freq_buckets_partition_vocab(spark):
    rows = _run(spark, "q_rank_freq_buckets").collect()
    # bucket b holds ranks [2^(b-1), 2^b): sizes must fit, and the
    # buckets together must cover the whole vocabulary exactly once
    for r in rows:
        assert r["n_tokens"] <= 1 << (r["rank_bucket"] - 1)
        assert r["min_freq"] <= r["max_freq"]
    # Zipf: earlier buckets have strictly higher max frequency
    by_bucket = sorted(rows, key=lambda r: r["rank_bucket"])
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a["min_freq"] >= b["max_freq"]


def test_morton_tiles_match_python_interleave(spark):
    """interleave_bits must equal a reference Python morton encode."""
    from week4_musemotion_spark.operators.layout import interleave_bits

    def py_morton(a: int, b: int, bits: int = 8) -> int:
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 170, 255) for b in (0, 3, 64, 255)], "a long, b long"
    )
    got = df.select("a", "b", interleave_bits(F.col("a"), F.col("b"), 8).alias("z")).collect()
    for r in got:
        assert r["z"] == py_morton(r["a"], r["b"]), (r["a"], r["b"])


def test_morton_tiles_shape(spark):
    rows = _run(spark, "q_morton_tiles").collect()
    assert 1 <= len(rows) <= 64
    for r in rows:
        # each tile's z-range lies inside the tile's own 10-bit span
        assert r["min_z"] >> 10 == r["tile"]
        assert r["max_z"] >> 10 == r["tile"]


def test_pagerank_fixed_point_on_path_graph(spark):
    """Hand-check the fixed-point arithmetic on a 3-node path graph
    1-2-3 (so deg = 1,2,1) built from a synthetic lineitem table:
    orders {10:(1,2), 11:(2,3)} each appearing twice to clear the
    cnt>=2 edge threshold."""
    import tempfile

    rows = []
    lid = 0
    for ok_, (pa, pb) in ((10, (1, 2)), (11, (2, 3)), (12, (1, 2)), (13, (2, 3))):
        for pk in (pa, pb):
            lid += 1
            rows.append((ok_, pk, 1, lid, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        from week4_musemotion_spark.queries import REGISTRY

        got = {
            r["node"]: (r["degree"], r["rank_e6"])
            for r in REGISTRY["q_pagerank_parts"].builder(spark, d).collect()
        }
    # iteration 1: ends: 150000 + 85*(1e6//2)//100 = 150000+425000 = 575000
    #              mid:  150000 + 2*(85*(1e6//1)//100) = 150000+1700000 = 1850000
    # iteration 2: ends: 150000 + 85*(1850000//2)//100 = 150000+786250 = 936250
    #              mid:  150000 + 2*(85*(575000//1)//100) = 150000+977500 = 1127500
    assert got == {1: (1, 936250), 3: (1, 936250), 2: (2, 1127500)}


def _graph_fixture(spark, tmpdir, orders):
    """lineitem parquet where each (pa, pb) order pair appears twice
    (clearing the cnt>=2 edge threshold)."""
    rows, lid = [], 0
    ok_ = 9
    for pa, pb in orders:
        for _ in range(2):
            ok_ += 1
            for pk in (pa, pb):
                lid += 1
                rows.append((ok_, pk, 1, lid, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.parquet(f"{tmpdir}/lineitem.parquet")


def test_kcore_peels_tail_keeps_clique(spark, tmp_path):
    """K4 clique (all degree 3) survives 3-core peeling; a pendant
    chain hanging off it peels away round by round."""
    from week4_musemotion_spark.queries import REGISTRY

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6)]
    _graph_fixture(spark, str(tmp_path), k4 + chain)
    got = {
        r["node"]: r["degree"]
        for r in REGISTRY["q_kcore_parts"].builder(spark, str(tmp_path)).collect()
    }
    # nodes 5,6 peel (degree < 3); node 4 keeps its clique edges only
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_degree_histogram_buckets(spark, tmp_path):
    """Star graph: hub degree 5 (bucket 3 = lengths of bin(4..7)),
    leaves degree 1 (bucket 1)."""
    from week4_musemotion_spark.queries import REGISTRY

    star = [(10, leaf) for leaf in (11, 12, 13, 14, 15)]
    _graph_fixture(spark, str(tmp_path), star)
    got = {
        r["degree_bucket"]: (r["n_nodes"], r["min_degree"], r["max_degree"])
        for r in REGISTRY["q_degree_histogram"].builder(spark, str(tmp_path)).collect()
    }
    assert got == {1: (5, 1, 1), 3: (1, 5, 5)}


def test_funnel_empty_stage_yields_null_conversion(spark, tmp_path):
    """Testdata regeneration guard: if a stage's event type vanishes
    from the stream, stage counts go to 0 and the conversion ratio
    degrades to NULL identically in Spark (pmod by zero -> NULL) and
    DuckDB (`// 0` -> NULL) — never an error."""
    import datetime as dt

    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 10, "error", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    from week4_musemotion_spark.queries import REGISTRY

    rows = {
        r["stage"]: r
        for r in REGISTRY["q_funnel_conversion"].builder(spark, str(tmp_path)).collect()
    }
    assert {r["users"] for r in rows.values()} == {0}
    assert all(r["conv_from_entry_e4"] is None for r in rows.values())
