"""Headerless-CSV sources with positional schema imposition.

The reference reads headerless CSVs and assigns names by position
(pipeline.py:139 + :87-96).  Real files carry up to 4 trailing junk
fields; the intended semantics (and the only correctly-aligned
reference path, pipeline.py:92-94) is: first N fields are the logical
columns, extras are dropped.  Imposing N names on a wider file the
naive way mis-aligns every column (SURVEY.md §2.10 defect 1) — this
module implements the guard, not the bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from week4_musemotion_spark.schemas import MUSEMOTION_COLUMNS


def impose_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Assign ``columns`` positionally; truncate trailing extras.

    Mirrors the reference's width guard (pipeline.py:87-96): wider
    input keeps the first ``len(columns)`` fields; narrower input is
    a hard error (silently shifting columns is how the reference's
    other three loaders corrupted every row).
    """
    width = len(df.columns)
    if width < len(columns):
        raise ValueError(
            f"CSV has {width} fields, schema needs {len(columns)}: refusing to mis-align"
        )
    names = list(columns) + [f"_junk{i}" for i in range(1, width - len(columns) + 1)]
    return df.toDF(*names).select(*columns)


def read_headerless_csv(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Distributed scan of headerless CSV(s) with positional names.

    ``path`` may be a file, directory, or glob — multi-file merge is
    the reference's blob-discovery + concat loop (pipeline.py:126-150)
    collapsed into one declarative scan (union is implicit, reads are
    parallel per file split).

    Everything lands as string; typed parsing happens in the cleaning
    layer with null-on-failure semantics, so a dirty row can never
    fail the scan (PERMISSIVE mode is Spark's default).
    """
    df = spark.read.options(header="false", inferSchema="false").csv(path)
    return impose_columns(df, columns or MUSEMOTION_COLUMNS)
