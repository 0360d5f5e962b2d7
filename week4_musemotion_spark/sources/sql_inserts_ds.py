"""Distributed SQL batch-INSERT source via the Spark 4 Python
DataSource API (SURVEY.md §2.1 S5, the scale path).

``sources/sql_inserts.read_sql_inserts`` parses the dump entirely on
the driver — right for the reference's megabyte file, wrong for a
multi-GB dump where the per-character state machine becomes the
bottleneck.  This source splits the work: the driver does ONE cheap
regex pass to find statement boundaries (byte offsets), and each
executor parses its own slice of VALUES tuples — the parse cost
scales out with the cluster.

Usage::

    spark.dataSource.register(SqlInsertsDataSource)
    df = (spark.read.format("sql_inserts")
          .option("canonicalize", "true")
          .load("/path/dump.sql"))

The file must be visible from executors (shared fs / object store —
true for any real deployment).  Statement boundaries, not byte
ranges, are the split unit, so no tuple ever straddles partitions.
"""

from __future__ import annotations

import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from week4_musemotion_spark.sources.sql_inserts import (
    DUMP_TO_CANONICAL,
    _split_tuples,
)

_HEADER = re.compile(
    rb"INSERT INTO\s+`?(\w+)`?\s*\(([^)]*)\)\s*VALUES", re.IGNORECASE
)


def _scan_statements(path: str) -> tuple[list[str], list[tuple[int, int]]]:
    """One driver pass: the dump's column list + (start, end) BYTE
    offsets of each statement's VALUES blob.  Byte offsets (the regex
    runs on the raw bytes) let executors ``seek`` straight to their
    slice instead of decoding the whole file."""
    data = open(path, "rb").read()
    columns: list[str] | None = None
    matches = list(_HEADER.finditer(data))
    if not matches:
        raise ValueError(f"no INSERT statements found in {path}")
    spans: list[tuple[int, int]] = []
    for i, m in enumerate(matches):
        cols = [
            c.strip().strip("`")
            for c in m.group(2).decode("utf-8", errors="replace").split(",")
        ]
        if columns is None:
            columns = cols
        elif cols != columns:
            raise ValueError(f"inconsistent INSERT column lists: {columns} vs {cols}")
        end = matches[i + 1].start() if i + 1 < len(matches) else len(data)
        spans.append((m.end(), end))
    assert columns is not None
    return columns, spans


class _StatementsPartition(InputPartition):
    def __init__(self, path: str, spans: list[tuple[int, int]]):
        self.path = path
        self.spans = spans


class SqlInsertsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sql_inserts: .load(path) is required")
        self.canonicalize = str(options.get("canonicalize", "true")).lower() == "true"
        self.columns, self.spans = _scan_statements(self.path)
        self.n_partitions = int(options.get("numPartitions", "8"))

    def partitions(self):
        n = max(1, min(self.n_partitions, len(self.spans)))
        chunks: list[list[tuple[int, int]]] = [[] for _ in range(n)]
        for i, span in enumerate(self.spans):
            chunks[i % n].append(span)
        return [_StatementsPartition(self.path, c) for c in chunks if c]

    def read(self, partition: _StatementsPartition):
        # executor-side: seek + read ONLY this partition's byte spans
        # (statement boundaries are never inside a multi-byte char, so
        # each slice decodes independently) — IO scales with the
        # partition, not the file
        n_cols = len(self.columns)
        with open(partition.path, "rb") as f:
            for start, end in partition.spans:
                f.seek(start)
                blob = f.read(end - start).decode("utf-8", errors="replace")
                for row in _split_tuples(blob):
                    if len(row) != n_cols:
                        raise ValueError(
                            f"tuple arity {len(row)} != {n_cols} in {partition.path}"
                        )
                    yield tuple(row)


class SqlInsertsDataSource(DataSource):
    """``spark.read.format("sql_inserts")`` — batched-INSERT dumps as
    a first-class, partition-parallel source."""

    @classmethod
    def name(cls) -> str:
        return "sql_inserts"

    def schema(self) -> str:
        columns, _ = _scan_statements(self.options["path"])
        if str(self.options.get("canonicalize", "true")).lower() == "true":
            columns = [DUMP_TO_CANONICAL.get(c, c) for c in columns]
        return ", ".join(f"`{c}` string" for c in columns)

    def reader(self, schema) -> SqlInsertsReader:
        return SqlInsertsReader(dict(self.options))
