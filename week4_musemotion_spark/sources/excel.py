"""Excel source with header auto-detection + fuzzy column mapping.

Re-expresses the reference's schema-discovery path
(streamlit_app.py:30-77): candidate header rows 0-10 are scored
against expected names (exact = 2 points, fuzzy ≥ 0.7 = 1), the best
row becomes the header, then columns are fuzzy-mapped (cutoff 0.6).

Excel is a driver-side format by nature (no splittable OSS Spark
reader): the file is parsed once on the driver and handed to
executors via ``spark.createDataFrame`` (Arrow path).  Fine for
workbook-sized data; large inputs belong in CSV/Parquet sources.
Parsing prefers pandas+openpyxl (full format coverage); without
openpyxl it falls back to the stdlib OOXML subset codec
(:mod:`week4_musemotion_spark.sources.xlsx_lite`).
"""

from __future__ import annotations

import difflib

from pyspark.sql import DataFrame, SparkSession

from week4_musemotion_spark.catalog import fuzzy_map_columns, normalize_name, require_columns
from week4_musemotion_spark.schemas import MUSEMOTION_COLUMNS

#: Fuzzy score threshold while scoring candidate header rows
#: (reference streamlit_app.py:39 uses 0.7).
HEADER_FUZZY_CUTOFF = 0.7
MAX_HEADER_ROW = 10


def _score_header(cells: list[str], expected: list[str]) -> int:
    score = 0
    norm_cells = [normalize_name(c) for c in cells]
    for e in expected:
        ne = normalize_name(e)
        if ne in norm_cells:
            score += 2
        elif difflib.get_close_matches(ne, norm_cells, n=1, cutoff=HEADER_FUZZY_CUTOFF):
            score += 1
    return score


def detect_header_row(rows: list[list], expected: list[str]) -> int:
    """Best-scoring candidate header row among the first 0-10."""
    best_row, best_score = 0, -1
    for i, row in enumerate(rows[: MAX_HEADER_ROW + 1]):
        s = _score_header([str(c) for c in row], expected)
        if s > best_score:
            best_row, best_score = i, s
    return best_row


def read_excel_auto_header(
    spark: SparkSession,
    path: str,
    expected: list[str] | None = None,
    required: list[str] | None = None,
    sheet_name: int | str = 0,
) -> DataFrame:
    """Read an Excel sheet, auto-detecting the header row and fuzzy
    mapping columns to the expected schema (all-string output;
    typed parsing is the cleaning layer's job)."""
    try:
        import pandas as pd
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("Excel source requires pandas on the driver") from e
    try:
        raw = pd.read_excel(path, sheet_name=sheet_name, header=None, dtype=str)
    except ImportError:
        # no openpyxl engine — stdlib OOXML-subset fallback
        from week4_musemotion_spark.sources.xlsx_lite import read_xlsx

        raw = pd.DataFrame(read_xlsx(path), dtype=str)

    expected = expected or MUSEMOTION_COLUMNS
    hdr = detect_header_row(raw.head(MAX_HEADER_ROW + 1).values.tolist(), expected)
    header = [str(c) for c in raw.iloc[hdr]]
    body = raw.iloc[hdr + 1 :].reset_index(drop=True)
    body.columns = header

    mapping = fuzzy_map_columns(header, expected)
    require_columns(mapping, required or expected)
    selected = body[[mapping[e] for e in expected if e in mapping]]
    selected.columns = [e for e in expected if e in mapping]
    pdf = selected.where(selected.notna(), None)
    return spark.createDataFrame(pdf.astype(object))
