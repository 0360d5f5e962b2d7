"""Headless smoke of the Streamlit rendering shell (streamlit_app.py)
via streamlit.testing's AppTest — skipped where streamlit isn't
installed (this sandbox ships without it; the dashboard SERVICE layer
is fully tested without streamlit in tests/test_dashboard.py, this
only proves the shell wires it to widgets without exploding)."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "streamlit.testing.v1", reason="streamlit not installed (optional UI dep)"
)
pytest.importorskip("plotly", reason="plotly not installed (optional UI dep)")


def test_kpi_row_renders_golden_numbers():
    from streamlit.testing.v1 import AppTest

    at = AppTest.from_file("streamlit_app.py", default_timeout=600)
    at.run()
    assert not at.exception, at.exception
    # the golden KPI triple of the reference dashboard at full data
    # (reference streamlit_app.py published screenshot; pinned in
    # tests/test_dashboard.py::test_kpis_match_reference_golden)
    subheaders = [s.value for s in at.subheader]
    assert "1,498" in subheaders
    assert any(v in subheaders for v in ("2021.1", "2021.10"))
    assert "61.88" in subheaders
    # both charts rendered
    assert len(at.get("plotly_chart")) == 2 if hasattr(at, "get") else True
