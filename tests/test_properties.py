"""Property-based tests (hypothesis) for the cleaning and catalog
layers — SURVEY.md §5 item 3: dirty data must never error, only
degrade to NULL."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# driver-side pure functions: full hypothesis speed
from week4_musemotion_spark.catalog import fuzzy_map_columns, normalize_name

text = st.text(max_size=30)


@given(text)
def test_normalize_name_idempotent(s):
    assert normalize_name(normalize_name(s)) == normalize_name(s)


@given(text)
def test_normalize_name_shape(s):
    out = normalize_name(s)
    assert out == out.lower().strip("_")
    assert " " not in out


@given(st.lists(st.text(min_size=1, max_size=15), max_size=8, unique=True))
def test_fuzzy_map_is_injective(actual):
    expected = ["vin", "city", "year", "make"]
    mapping = fuzzy_map_columns(actual, expected)
    assert set(mapping) <= set(expected)
    vals = list(mapping.values())
    assert len(vals) == len(set(vals)), "two expected columns claimed the same source"


# Spark-side: one job over a hypothesis-generated batch (per-example
# Spark jobs would be prohibitively slow)
DIRTY = [
    "nan", "None", "", "  ", " 42 ", "9" * 30, "-", "+", "1e3", "0x10",
    "POINT (1 2)", "POINT(-122.3 47.6)", "POINT ( )", ")", "null", "NaN",
    "\t", " a b ", "-7", "2.5",
]


def test_cleaning_battery_never_errors(spark):
    from week4_musemotion_spark.functions.cleaning import (
        extract_point_latlon,
        safe_cast,
        trim_nullify,
    )

    df = spark.createDataFrame([(s,) for s in DIRTY], ["raw"])
    lat, lon = extract_point_latlon("raw")
    rows = df.select(
        trim_nullify("raw").alias("t"),
        safe_cast("raw", "long").alias("i"),
        safe_cast("raw", "double").alias("d"),
        lat.alias("lat"),
        lon.alias("lon"),
    ).collect()
    assert len(rows) == len(DIRTY)
    got = {s: r for s, r in zip(DIRTY, rows)}
    assert got[" 42 "].i == 42
    assert got["-7"].i == -7
    assert got["2.5"].d == 2.5
    assert got["9" * 30].i is None  # overflow → NULL
    assert got["POINT (1 2)"].lat == 2.0 and got["POINT (1 2)"].lon == 1.0
    assert got["POINT ( )"].lat is None
    for s in ("nan", "None", "", "  ", "\t"):
        assert got[s].t is None, s


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="ab |", min_size=0, max_size=12), min_size=1, max_size=6))
def test_explode_utilities_never_emits_separators(spark, utilities):
    from week4_musemotion_spark.operators.etl import explode_utilities

    df = spark.createDataFrame([(u,) for u in utilities], ["utility"])
    out = [r.utility for r in explode_utilities(df).collect()]
    for u in out:
        assert u is None or ("|" not in u and u == u.strip())
