"""Minimal stdlib xlsx codec (zipfile + ElementTree, no deps).

An ``.xlsx`` workbook is a ZIP of ECMA-376 OOXML parts; the subset a
tabular source needs is tiny: one worksheet of rows whose cells are
inline strings, shared strings, or numbers.  This module writes that
subset (inline strings only — valid for any conforming reader,
openpyxl/Excel included) and reads it back, so the Excel source works
— and is testable — without openpyxl in the environment.  When
pandas+openpyxl are available they take precedence (richer format
coverage); this is the fallback engine.

Reference behavior covered: streamlit_app.py:30-77 (workbook upload →
header auto-detect), which this codec feeds.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _col_index(ref: str) -> int:
    """'A1' → 0, 'AB12' → 27."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def write_xlsx(path: str, rows: list[list]) -> None:
    """Write rows (any scalars; stringified) as a one-sheet workbook
    of inline-string cells."""
    body = []
    for r, row in enumerate(rows, start=1):
        cells = "".join(
            f'<c r="{_col_letter(c)}{r}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(str(v))}</t></is></c>"
            for c, v in enumerate(row)
            if v is not None
        )
        body.append(f'<row r="{r}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _cell_value(cell: ET.Element, shared: list[str]) -> str | None:
    t = cell.get("t")
    if t == "inlineStr":
        el = cell.find(f"{_NS}is/{_NS}t")
        return el.text or "" if el is not None else None
    v = cell.find(f"{_NS}v")
    if v is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    return v.text  # "str", numbers, booleans — surfaced as text


def read_xlsx(path: str) -> list[list[str | None]]:
    """First worksheet as a dense row-major grid of strings/None."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(f"{_NS}t")) for si in root]
        sheet = min(
            n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        root = ET.fromstring(z.read(sheet))
    grid: list[list[str | None]] = []
    width = 0
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, str | None] = {}
        for pos, cell in enumerate(row.iter(f"{_NS}c")):
            ref = cell.get("r")
            ci = _col_index(ref) if ref else pos
            cells[ci] = _cell_value(cell, shared)
        n = max(cells) + 1 if cells else 0
        width = max(width, n)
        grid.append([cells.get(i) for i in range(n)])
    return [r + [None] * (width - len(r)) for r in grid]
