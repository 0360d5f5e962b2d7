"""Round-22 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: verify-skill rotation
note).

Wave theme: snapshot RETENTION under the value oracle — the third
lifecycle certificate, completing the maintenance triptych the
round-11 verdict sketched (schema evolution r18, OPTIMIZE compaction
r20, now VACUUM):

- q_vacuum_retention — a versioned dataset accretes 5 committed
  snapshots (each a strictly-wider deterministic slice of the
  documents table), ``operators/versioned.vacuum(keep_last=2)``
  removes the 3 oldest, and the query reads BOTH surviving
  snapshots back through time-travel (``read_version``) with the
  retention counts riding every row.  The oracle recomputes each
  kept snapshot's content from the RAW table via the same
  deterministic predicate, so a hash match certifies: vacuum
  deleted exactly the doomed set, preserved both kept snapshots
  bit-for-bit, and version-addressed reads still resolve after the
  deletion.  Reference contrast: the reference keeps exactly one
  mutable copy of everything (drop-and-recreate,
  load_local_to_db.py:122-150) — no history to retain OR reclaim.

Differential evidence: tests/test_staged_r22.py (conftest.staged_diff
at sf0.001; sf0.01/sf0.1 via ``tools/check_correctness.py --staged``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

# chains staged_r21 -> ... -> r9 registration
import week4_musemotion_spark.queries.staged_r21  # noqa: F401

#: Snapshot count written before the vacuum, and how many survive.
#: Versions are 1-based (write_version numbering); version k holds
#: docs with doc_id % 10 <= 4 + k, so each snapshot is a strictly
#: wider slice and version _N_VERSIONS is the full table — growth a
#: real corpus shows, and a predicate both engines replay exactly.
_N_VERSIONS = 5
_KEEP_LAST = 2


def _vacuum_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Cached versioned dataset + its vacuum: {n} committed
    snapshots, the oldest {n}-{k} removed by ``vacuum(keep_last={k})``.
    The build asserts the removed/kept version lists AND each kept
    snapshot's row count against its predicate, so retention drift
    (a mis-claimed version number, an over-eager delete) kills the
    fixture loudly instead of hash-failing downstream."""
    import json
    import os

    from week4_musemotion_spark.operators.versioned import (
        list_versions,
        read_version,
        vacuum,
        write_version,
    )
    from week4_musemotion_spark.queries.pipeline_ops import cached_fixture

    def _build(tmp: str) -> None:
        base = os.path.join(tmp, "versions")
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        expected = {}
        for k in range(1, _N_VERSIONS + 1):
            snap = docs.filter(F.col("doc_id") % 10 <= 4 + k)
            expected[k] = snap.count()
            got = write_version(snap, base)
            if got != k:
                raise AssertionError(f"vacuum fixture drift: wrote v{got}, wanted v{k}")
        removed = vacuum(base, keep_last=_KEEP_LAST)
        doomed = list(range(1, _N_VERSIONS - _KEEP_LAST + 1))
        if removed != doomed:
            raise AssertionError(f"vacuum fixture drift: removed {removed}, wanted {doomed}")
        kept = list_versions(base)
        if kept != list(range(_N_VERSIONS - _KEEP_LAST + 1, _N_VERSIONS + 1)):
            raise AssertionError(f"vacuum fixture drift: kept {kept}")
        for k in kept:
            n = read_version(spark, base, k).count()
            if n != expected[k]:
                raise AssertionError(
                    f"vacuum fixture drift: v{k} rereads {n} rows, wrote {expected[k]}"
                )
        with open(os.path.join(tmp, "retention.json"), "w") as fh:
            json.dump(
                {"versions_before": _N_VERSIONS, "removed": len(doomed), "kept": kept},
                fh,
            )
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    return cached_fixture(
        "musemotion_vacuum",
        sf_dir,
        f"vacuum:{_N_VERSIONS}:{_KEEP_LAST}".encode(),
        _build,
        table="documents",
    )


if _vacuum_fixture.__doc__:  # None under python -OO
    _vacuum_fixture.__doc__ = _vacuum_fixture.__doc__.format(
        n=_N_VERSIONS, k=_KEEP_LAST
    )


_VACUUM_ORACLE = f"""
    SELECT CAST(v.version AS BIGINT) AS version, d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           CAST({_N_VERSIONS} AS BIGINT) AS versions_before,
           CAST({_N_VERSIONS - _KEEP_LAST} AS BIGINT) AS versions_removed,
           CAST({_KEEP_LAST} AS BIGINT) AS versions_kept
    FROM documents d
    CROSS JOIN (SELECT unnest(range({_N_VERSIONS - _KEEP_LAST + 1}, {_N_VERSIONS + 1})) AS version) v
    WHERE d.doc_id % 10 <= 4 + v.version
    GROUP BY v.version, d.lang
"""


@query("q_vacuum_retention", covers=("X-VACUUM-RETENTION",), oracle=_VACUUM_ORACLE)
def q_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM-style snapshot retention under the value oracle: after
    5 committed snapshots and a ``vacuum(keep_last=2)``, both
    surviving versions are read back THROUGH the time-travel path
    and aggregated per lang, with the retention counts riding every
    row.  The oracle re-derives each kept snapshot from the raw
    table by its writing predicate, so a hash match certifies zero
    loss/duplication across write → vacuum → version-addressed read,
    and the fixture asserts the removed list is exactly the doomed
    prefix (never the latest — ``vacuum`` pins it regardless of
    keep_last).

    100 TB story: vacuum is pure manifest-and-rmtree metadata work —
    cost scales with file count of the doomed versions, zero data
    read or shuffled; the certificate query reads only the kept
    snapshots.  Retention is what makes the versioned-write pattern
    (atomic rename commits, ``operators/versioned.py``) viable
    long-term: without it a daily-written 100 TB table holds every
    version forever.

    Reference analogue: the reference's only "retention" is
    drop-and-recreate (load_local_to_db.py:122-150) — one mutable
    copy, no history, nothing to reclaim."""
    import json
    import os

    from week4_musemotion_spark.operators.versioned import read_version

    fixture = _vacuum_fixture(spark, sf_dir)
    with open(os.path.join(fixture, "retention.json")) as fh:
        ret = json.load(fh)
    base = os.path.join(fixture, "versions")
    from week4_musemotion_spark.functions.exact import dec

    parts = [
        read_version(spark, base, k)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            # widen INSIDE the aggregation: a raw long sum wraps
            # silently past 2^63 while the oracle's DuckDB sum
            # promotes to HUGEINT (then errors loudly on the BIGINT
            # cast) — decimal keeps the two engines failure-parallel
            F.sum(dec(F.col("n_chars"))).cast("long").alias("chars_sum"),
        )
        .select(F.lit(k).cast("long").alias("version"), "lang", "n_docs", "chars_sum")
        for k in ret["kept"]
    ]
    return (
        reduce(DataFrame.unionByName, parts)
        .withColumn("versions_before", F.lit(ret["versions_before"]).cast("long"))
        .withColumn("versions_removed", F.lit(ret["removed"]).cast("long"))
        .withColumn("versions_kept", F.lit(len(ret["kept"])).cast("long"))
    )
