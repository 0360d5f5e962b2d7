"""Sinks: the reference's four load paths, Spark-native.

Reference → engine mapping (SURVEY.md §2.1):
- K1 full-replace JDBC  → :func:`write_jdbc` mode="overwrite"
- K2 explicit-DDL append→ :func:`write_jdbc` mode="append" (DDL via
  ``spark.sql`` where a metastore exists)
- K3 create-if-absent   → :func:`write_parquet` (CREATE IF NOT
  EXISTS semantics are native to ``saveAsTable``)
- K4 upsert             → operators.upsert (last-write-wins merge;
  Spark does not enforce uniqueness, the merge does)

Parquet is the engine-native format: columnar, splittable,
stats-backed (min/max pruning), and the basis for everything the
optimizer pushes down.  ``partition_by`` should be a low-cardinality
column used in filters (at 100 TB, partition pruning is the first
and cheapest IO saver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: The reference batches JDBC writes at 500 rows (pipeline.py:168-169)
#: — a pandas-era knob; Spark's JDBC writer batches per partition, and
#: 10k is a sane modern default for wide rows.
JDBC_BATCH_SIZE = 10_000


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (hash-clustered) managed table.

    Bucketing pre-shuffles data at write time: two tables bucketed the
    same way join with ZERO exchange at read time — at 100 TB this is
    the difference between re-shuffling the fact table on every join
    and never shuffling it at all.  Requires a metastore-backed
    ``saveAsTable`` (bucket metadata lives in the catalog, not the
    files).
    """
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def append_rows(spark, path: str, rows: list, schema=None) -> None:
    """Explicit single/few-row INSERT (SURVEY §2 C2, ref
    musemotion-queries.sql:56-57): literal rows → one-partition
    DataFrame → parquet append.  For row-at-a-time arrival at real
    scale, batch upstream or use the streaming sink — a 100-TB table
    should not accrete one footer per row."""
    df = spark.createDataFrame(rows, schema=schema)
    write_parquet(df.coalesce(1), path, mode="append")


def drop_table(spark, table: str) -> None:
    """DROP TABLE IF EXISTS (SURVEY §2 C5, ref
    musemotion-queries.sql:52) — catalog-side, no error when absent."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
    batch_size: int = JDBC_BATCH_SIZE,
    num_partitions: int | None = None,
) -> None:
    """JDBC sink (overwrite = the reference's drop-and-replace K1;
    append = K2/K3).  ``num_partitions`` caps concurrent connections
    — at cluster scale an unbounded writer DDoSes the database.

    Live-tested against embedded Derby (the in-memory database in
    Spark's own jars): replace/append/read-back round-trips in
    ``tests/test_jdbc_sink.py``.
    """
    w = df.coalesce(num_partitions) if num_partitions else df
    opts = dict(properties or {})
    opts["batchsize"] = str(batch_size)
    w.write.mode(mode).options(**opts).jdbc(url, table, properties=opts)
