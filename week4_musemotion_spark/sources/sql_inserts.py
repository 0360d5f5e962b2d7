"""SQL batch-INSERT source (SURVEY.md §2.1 S5).

The reference ships its dataset a third way: a MySQL dump with
batched ``INSERT INTO ... VALUES (...), (...)`` tuples (reference
musemotion-populate-table.sql:19-1531, 1,499 rows under the alternate
column-naming generation).  This source parses that dump driver-side
(it is a single bounded file — megabytes, not a distributed input)
and hands the rows to executors via ``spark.createDataFrame``.

Parsing is a small state machine over quoted-string / parenthesis
state — SQL string literals contain commas, parentheses, and doubled
quotes (``''``), so naive splitting corrupts rows exactly the way the
reference's CSV mis-alignment did.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: The dump's column-naming generation → the engine's canonical names
#: (SURVEY.md §1.1: same 11 logical attributes, two naming
#: generations; we standardize on the Python-pipeline names).
DUMP_TO_CANONICAL = {
    "vin": "vin",
    "city": "city",
    "year": "year",
    "make": "make",
    "model": "model",
    "vehicle_type": "vehicle_type",
    "eligibility_reason": "eligibility",
    "odometer": "electric_range",
    "some_id": "vehicle_id",
    "geom_wkt": "location",
    "utility": "utility",
}


def _split_tuples(values_blob: str) -> list[list[str | None]]:
    """Split a ``(...), (...)`` VALUES blob into rows of raw strings.

    Tracks quote state ('' escapes a quote inside a literal) and
    paren depth; NULL (unquoted) becomes None, numbers stay strings
    (typing is the cleaning layer's job).
    """
    rows: list[list[str | None]] = []
    field: list[str] = []
    row: list[str | None] = []
    in_str = False
    was_quoted = False
    depth = 0
    i, n = 0, len(values_blob)
    while i < n:
        ch = values_blob[i]
        if ch == ";" and not in_str and depth == 0:
            break  # end of this INSERT statement (in-string ';' is data)
        if in_str:
            if ch == "\\" and i + 1 < n and values_blob[i + 1] in ("'", "\\"):
                # MySQL-style backslash escapes (mysqldump default);
                # SQL-standard '' doubling is handled below
                field.append(values_blob[i + 1])
                i += 1
            elif ch == "'":
                if i + 1 < n and values_blob[i + 1] == "'":
                    field.append("'")
                    i += 1
                else:
                    in_str = False
            else:
                field.append(ch)
        elif ch == "'":
            in_str = True
            was_quoted = True
            if not "".join(field).strip():
                field = []  # drop pre-quote whitespace
        elif ch == "(":
            depth += 1
        elif ch in ",)":
            if depth == 1 or (depth == 0 and ch == ","):
                if depth == 1:  # field terminator inside a tuple
                    raw = "".join(field).strip()
                    if not was_quoted and (raw == "" or raw.upper() == "NULL"):
                        row.append(None)
                    else:
                        row.append("".join(field) if was_quoted else raw)
                    field, was_quoted = [], False
            if ch == ")":
                depth -= 1
                if depth == 0 and row:
                    rows.append(row)
                    row = []
        else:
            if depth == 1:
                field.append(ch)
        i += 1
    return rows


def read_sql_inserts(
    spark: SparkSession, path: str, table: str | None = None, canonicalize: bool = True
) -> DataFrame:
    """Parse a batched-INSERT SQL dump into an all-string DataFrame."""
    text = open(path, encoding="utf-8", errors="replace").read()
    # the header is regex-friendly; the VALUES body is NOT (string
    # literals may contain ';', '(' etc.) — the state machine owns it,
    # stopping at the first top-level ';'
    header = re.compile(r"INSERT INTO\s+`?(\w+)`?\s*\(([^)]*)\)\s*VALUES", re.IGNORECASE)
    all_rows: list[list[str | None]] = []
    columns: list[str] | None = None
    for m in header.finditer(text):
        if table and m.group(1) != table:
            continue
        cols = [c.strip().strip("`") for c in m.group(2).split(",")]
        if columns is None:
            columns = cols
        elif cols != columns:
            raise ValueError(f"inconsistent INSERT column lists: {columns} vs {cols}")
        all_rows.extend(_split_tuples(text[m.end() :]))
    if columns is None:
        raise ValueError(f"no INSERT statements found in {path}")
    bad = [r for r in all_rows if len(r) != len(columns)]
    if bad:
        raise ValueError(f"{len(bad)} tuples with wrong arity (expected {len(columns)})")
    df = spark.createDataFrame(all_rows, schema=columns)
    if canonicalize:
        renames = {c: DUMP_TO_CANONICAL[c] for c in columns if c in DUMP_TO_CANONICAL}
        df = df.withColumnsRenamed(renames)
    return df
