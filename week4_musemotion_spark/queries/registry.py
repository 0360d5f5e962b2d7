"""Query registry: one named entry per operator from SURVEY.md §2.

Each :class:`QuerySpec` pairs

- ``builder(spark, sf_dir) -> DataFrame`` — the idiomatic-Spark
  implementation, and
- ``oracle`` — equivalent ANSI SQL runnable by DuckDB over the same
  parquet tables (``None`` for genuinely non-SQL-expressible ops,
  which the driver checks rows-only).

Determinism contract (SURVEY.md §7.4): the driver compares
row-count + schema + order-insensitive value hash, so any query with
a LIMIT carries a *total* deterministic order (unique tie-break
columns), and no query emits raw timestamps or unrounded float
arithmetic (aggregates are rounded identically on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    #: operator ids from SURVEY.md §2 this query exercises
    covers: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, covers: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a (builder, oracle) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), covers)
        return fn

    return deco
