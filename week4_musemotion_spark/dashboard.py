"""Dashboard service layer — the reference Streamlit app's
interaction loop (streamlit_app.py:140-223), Spark-shaped.

The loop the reference runs per widget refresh, and the scale contract
this layer keeps:

1. ONE cleaned DataFrame, cached once (`.cache()`), shared by every
   widget — the fact table is never re-read or re-cleaned per
   interaction.
2. Filters compose lazily (`isin` predicates on the cached frame) —
   nothing executes until a widget needs numbers.
3. Only AGGREGATES ever leave the cluster: filter options are
   distinct-sorted collects, KPIs are a 1-row agg, charts are
   group-size frames — `.toPandas()` lands k rows, never the fact
   table.  (The reference holds the whole CSV in driver pandas; at
   100 TB only this aggregate-collect shape survives.)

The rendering shell is deliberately thin: `render_text` prints the
same KPI row / charts the reference lays out (streamlit_app.py:
180-223) and demonstrates the empty-selection guard
(streamlit_app.py:172-174).  A Streamlit front end would call the
same Dashboard methods; streamlit itself is not a dependency here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from week4_musemotion_spark.operators.etl import group_size, is_empty, kpi_summary
from week4_musemotion_spark.sources.csv import read_headerless_csv

#: Sidebar filter columns (streamlit_app.py:161-163).
FILTER_COLUMNS = ("city", "model", "make")


class Dashboard:
    """Cached-frame dashboard backend over the MuseMotion dataset."""

    def __init__(self, spark: SparkSession, csv_path: str):
        from week4_musemotion_spark.operators.etl import clean_musemotion

        self.spark = spark
        self.df = clean_musemotion(read_headerless_csv(spark, csv_path)).cache()

    #: Max options surfaced per sidebar filter — a high-cardinality
    #: column must not flood the driver (or the UI) with millions of
    #: distincts; the cap keeps the most frequent values.
    MAX_FILTER_OPTIONS = 1000

    def filter_options(self) -> dict[str, list[str]]:
        """Sorted distinct values per sidebar filter (A6, ref
        streamlit_app.py:144-151) — ONE Spark job for all columns
        (explode to (col, value) pairs → one grouped count), capped at
        :attr:`MAX_FILTER_OPTIONS` per column by frequency so only
        ≤ k·|columns| tiny rows ever reach the driver."""
        pairs = self.df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(c).alias("col"), F.col(c).cast("string").alias("val"))
                        for c in FILTER_COLUMNS
                    ]
                )
            ).alias("p")
        ).select("p.col", "p.val")
        ranked = (
            pairs.filter(F.col("val").isNotNull())
            .groupBy("col", "val")
            .agg(F.count("*").alias("freq"))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("col").orderBy(F.col("freq").desc(), F.col("val").asc())
                ),
            )
            .filter(F.col("rk") <= self.MAX_FILTER_OPTIONS)
            .select("col", "val")
        )
        out: dict[str, list[str]] = {c: [] for c in FILTER_COLUMNS}
        for r in ranked.collect():
            out[r["col"]].append(r["val"])
        return {c: sorted(vs) for c, vs in out.items()}

    def select(self, **choices: list[str] | None) -> DataFrame:
        """Lazy composed `isin` selection (ref streamlit_app.py:
        166-170); None/absent = filter not narrowed."""
        out = self.df
        for col, values in choices.items():
            if values is not None:
                out = out.filter(F.col(col).isin(list(values)))
        return out

    # --- widget feeds: every one collects aggregates only ---

    def kpis(self, selection: DataFrame):
        """KPI row (A4) with the empty-selection guard (A8)."""
        return kpi_summary(selection, skip_if_empty=True).toPandas()

    def vehicles_by_make(self, selection: DataFrame):
        return group_size(selection, "make", ascending=True).toPandas()

    def counts_by_city(self, selection: DataFrame):
        return group_size(selection, "city").toPandas()


def render_text(dash: Dashboard, **choices: list[str] | None) -> str:
    """Plain-text rendering of the reference's main page layout."""
    sel = dash.select(**choices)
    if is_empty(sel):
        return "No data available based on the current filter settings!"
    kpi = dash.kpis(sel).iloc[0]
    lines = [
        "=== Muse Motion Electric Vehicles ===",
        f"Total Vehicles: {int(kpi.total_vehicles):,}"
        f" | Average Year: {kpi.avg_year}"
        f" | Average Electric Range: {kpi.avg_electric_range}",
        "--- Vehicles by Make ---",
    ]
    lines += [
        f"{r['make'] or '<null>'}: {r['count']}"
        for _, r in dash.vehicles_by_make(sel).iterrows()
    ]
    lines.append("--- Vehicle counts by City ---")
    lines += [f"{r['city']}: {r['count']}" for _, r in dash.counts_by_city(sel).iterrows()]
    return "\n".join(lines)
