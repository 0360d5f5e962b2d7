"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``week4_musemotion_spark`` package; this
module only adapts its query registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module by file path from any CWD — make
# sure the package that lives next to it is importable
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from week4_musemotion_spark.queries import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _evidence_round() -> dict[str, int]:
    """Latest round in which each query earned driver evidence.

    The driver's per-round correctness window covers a prefix of
    ``queries()``.  Round 1–4 achieved first-time coverage for every
    registered query; from round 5 on the window's job is to RE-validate
    the stalest evidence, so queries are ordered by the age of their most
    recent green driver row (never-evidenced first, then oldest round
    first).  A query counts as evidenced in round N if CORRECTNESS_r0N
    recorded either a full green row (rows+schema+hash) or the declared
    rows-only outcome for oracle-less approximate ops.
    """
    import glob
    import json
    import re

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
            rows_only = row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) >= 0
            if green or (rows_only and REGISTRY.get(name) is not None and REGISTRY[name].oracle is None):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _ordered_names() -> list[str]:
    latest = _evidence_round()
    names = list(REGISTRY)
    # stable: evidence age ascending (0 = never), registry order tie-break
    return sorted(names, key=lambda n: latest.get(n, 0))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (CTE top-k enrichment join, SURVEY.md §2.5 J4)
    on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q_cte_topk_join"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    not-yet-driver-verified queries first (see :func:`_evidenced_names`)."""
    return {name: REGISTRY[name].builder for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted
    for non-SQL-expressible ops → driver does a rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
