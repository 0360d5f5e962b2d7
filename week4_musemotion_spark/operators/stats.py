"""Catalog statistics for cost-based optimization (CBO).

The reference delegates all planning to MySQL (SURVEY.md §4); Spark's
equivalent of MySQL's table statistics is `ANALYZE TABLE` — without
stats, the optimizer estimates relation sizes from file bytes, which
is blind to selective filters and wildly wrong after compression.  At
100 TB the difference is concrete: a dimension that compresses 10×
can miss the broadcast threshold on file size alone, turning a
map-side join into a full shuffle; CBO row counts fix the estimate,
and column-level stats (NDV, min/max, null count) feed join
reordering (`spark.sql.cbo.joinReorder.enabled`).

These helpers wrap the two catalog operations a pipeline actually
schedules — analyze after large writes, inspect before debugging a
bad plan — and are exercised by tests/test_table_stats.py, which
pins that analyzed row counts reach the optimizer's estimates.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession


def analyze_table(
    spark: SparkSession, name: str, columns: list[str] | None = None
) -> None:
    """Compute table-level stats (sizeInBytes + rowCount); with
    ``columns``, also per-column NDV/min/max/null-count histograms.
    Runs one scan per call — schedule it right after the write that
    produced the table (the data is hot in the page cache) rather
    than lazily at read time."""
    cols = f" FOR COLUMNS {', '.join(columns)}" if columns else ""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS{cols}")


def table_stats(spark: SparkSession, name: str) -> dict[str, int]:
    """{'size_bytes': ..., 'row_count': ...} from the catalog (empty
    dict if the table was never analyzed)."""
    out: dict[str, int] = {}
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
        if row["col_name"] == "Statistics":
            m = re.search(r"(\d+)\s+bytes(?:,\s*(\d+)\s+rows)?", row["data_type"])
            if m:
                out["size_bytes"] = int(m.group(1))
                if m.group(2) is not None:
                    out["row_count"] = int(m.group(2))
    return out


def optimizer_row_estimate(df) -> int | None:
    """The optimizer's own row-count estimate for a DataFrame's plan
    (None when unknown) — the number CBO decisions are made from."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    opt = stats.rowCount()
    if not opt.isDefined():
        return None
    v = opt.get()
    # py4j auto-converts small BigInts to Python ints; larger ones
    # arrive as JavaObjects with toString
    return v if isinstance(v, int) else int(v.toString())
