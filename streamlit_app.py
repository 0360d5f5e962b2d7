"""Streamlit front end over the Spark dashboard service layer.

Mirrors the reference UI (reference streamlit_app.py:126-223: sidebar
multiselects, KPI columns, two horizontal plotly bars) but every
number comes from ``week4_musemotion_spark.dashboard.Dashboard`` —
the cached-Spark-frame, aggregate-collect-only backend that is
golden-KPI-tested without streamlit (tests/test_dashboard.py).  This
module is ONLY the rendering shell: no query logic lives here, and
nothing in the engine imports it, so streamlit/plotly stay optional.

Run:  streamlit run streamlit_app.py [-- --csv PATH]
"""

from __future__ import annotations

import os
import sys

try:
    import plotly.express as px
    import streamlit as st
except ImportError as exc:  # engine never needs the UI deps
    raise SystemExit(
        "streamlit/plotly are not installed - this shell is optional; "
        "the dashboard logic itself is importable and tested without it "
        f"(missing: {exc.name})"
    )

DEFAULT_CSV = "/root/reference/musemotion_databse.csv"


@st.cache_resource
def get_dashboard(csv_path: str):
    from week4_musemotion_spark.dashboard import Dashboard
    from week4_musemotion_spark.session import get_spark

    return Dashboard(get_spark("musemotion-dashboard"), csv_path)


def _hbar(series, title: str):
    fig = px.bar(
        x=series["count"],
        y=series.iloc[:, 0],
        orientation="h",
        title=f"<b>{title}</b>",
        template="plotly_white",
    )
    fig.update_layout(plot_bgcolor="rgba(0,0,0,0)", xaxis=dict(showgrid=False))
    return fig


def main() -> None:
    st.set_page_config(page_title="Muse Motion EV Dashboard", page_icon=":bar_chart:", layout="wide")
    csv = DEFAULT_CSV
    if "--csv" in sys.argv:
        csv = sys.argv[sys.argv.index("--csv") + 1]
    csv = os.environ.get("MUSEMOTION_CSV", csv)
    dash = get_dashboard(csv)

    st.sidebar.header("Please Filter Here:")
    opts = dash.filter_options()
    city = st.sidebar.multiselect("Select the City:", options=opts["city"], default=opts["city"])
    model = st.sidebar.multiselect("Select the Model Type:", options=opts["model"], default=opts["model"])
    make = st.sidebar.multiselect("Select the Make:", options=opts["make"], default=opts["make"])

    selection = dash.select(city=city, model=model, make=make)
    kpis = dash.kpis(selection)
    if kpis.empty:
        st.warning("No data available based on the current filter settings!")
        st.stop()

    st.title(":bar_chart: Muse Motion Electric Vehicles")
    st.markdown("##")
    kpi = kpis.iloc[0]
    left, middle, right = st.columns(3)
    left.subheader("Total Vehicles:")
    left.subheader(f"{int(kpi.total_vehicles):,}")
    middle.subheader("Average Year:")
    middle.subheader(f"{kpi.avg_year}")
    right.subheader("Average Electric Range:")
    right.subheader(f"{kpi.avg_electric_range}")
    st.markdown("---")

    left, right = st.columns(2)
    left.plotly_chart(_hbar(dash.counts_by_city(selection), "Vehicle counts by City"), use_container_width=True)
    right.plotly_chart(_hbar(dash.vehicles_by_make(selection), "Vehicles by Make"), use_container_width=True)


main()
