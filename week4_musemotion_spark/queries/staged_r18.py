"""Round-18 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: verify-skill rotation
note).

Wave theme: corpus lifecycle under the value oracle.  Both modules
shipped pytest-green in round 10; these queries put them under the
driver's rows+schema+hash gate, closing the verdict's "a pytest-only
query is still a claim" item for the lifecycle layer.

- q_schema_evolution_read — three schema GENERATIONS of the documents
  table (gen0 narrow int, gen1 widens int→long and ADDS a column,
  gen2 DROPS a column) appended via ``sources.evolution.
  evolve_append``, then read back whole under the lattice-merged
  union schema with ``read_evolved``.  The oracle recomputes the same
  aggregate from the raw table with the generation split emulated in
  SQL, so a hash match certifies: narrow int files up-cast at scan
  (no rewrite), the added column is NULL for the generation that
  predates it, the dropped column is NULL for the generation that
  stopped carrying it, and the sidecar generation counter landed at
  2.  Reference contrast: the reference can only evolve a schema by
  drop-and-recreate (``load_local_to_db.py:122-150``) — a full
  rewrite at every drift, impossible on a years-lived 100 TB corpus.

- q_quarantine_split — a JSONL ingest with deterministically PLANTED
  malformed lines (every ``doc_id % 50 == 7`` document's line is
  truncated mid-object) pushed through ``sources.quarantine.
  read_jsonl_quarantined`` + ``quarantine_to``; the clean lane is
  aggregated per lang and the dead-letter count is read back FROM THE
  QUARANTINE PARQUET the single-pass sink landed.  The oracle
  recomputes both from the raw table with the same modular rule, so a
  hash match certifies the split boundary (malformed LINE vs
  coercible FIELD), zero loss (clean + quarantined = every line), and
  the observe-riding sink count.  Reference contrast: the reference's
  pandas load DIES on a malformed line (``pipeline.py:139``) — one
  bad byte kills the batch instead of landing in a replayable lane.

Differential evidence: tests/test_staged_r18.py (conftest.staged_diff
at sf0.001; sf0.01/sf0.1 via ``tools/check_correctness.py --staged``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

# chains staged_r17 -> ... -> r9 registration
import week4_musemotion_spark.queries.staged_r17  # noqa: F401

#: Modulus/residue picking which documents carry a planted-broken
#: JSONL line in the quarantine fixture (deterministic at every SF).
_Q_MOD, _Q_RESIDUE = 50, 7

#: Generation split for the evolution fixture: doc_id % 3.
_EVO_MOD = 3


def _evolution_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Cached three-generation evolved dataset built from documents:

    - gen0 (doc_id % 3 == 0): (doc_id, lang, n_chars INT) — narrow.
    - gen1 (== 1): n_chars widens to LONG, ``source`` is ADDED.
    - gen2 (== 2): ``lang`` is DROPPED (the batch stops carrying it).

    The evolution REPORTS are asserted in the build (wrong metadata
    kills the fixture loudly instead of publishing a wrong dataset).
    """
    import os

    from week4_musemotion_spark.queries.pipeline_ops import cached_fixture
    from week4_musemotion_spark.sources.evolution import evolve_append

    def _build(tmp: str) -> None:
        ds = os.path.join(tmp, "dataset")
        docs = load_table(spark, sf_dir, "documents")
        gen = lambda r: docs.filter(F.pmod(F.col("doc_id"), F.lit(_EVO_MOD)) == r)  # noqa: E731
        r0 = evolve_append(
            gen(0).select("doc_id", "lang", F.col("n_chars").cast("int").alias("n_chars")),
            ds,
        )
        r1 = evolve_append(
            gen(1).select("doc_id", "lang", F.col("n_chars").alias("n_chars"), "source"),
            ds,
        )
        r2 = evolve_append(gen(2).select("doc_id", "n_chars", "source"), ds)
        want = [
            ({"added": [], "filled": [], "widened": [], "generation": 0}, r0),
            (
                {
                    "added": ["source"],
                    "filled": [],
                    "widened": [("n_chars", "int", "bigint")],
                    "generation": 1,
                },
                r1,
            ),
            (
                {"added": [], "filled": ["lang"], "widened": [], "generation": 2},
                r2,
            ),
        ]
        for expect, got in want:
            if got != expect:
                raise AssertionError(f"evolution fixture report drift: {got} != {expect}")
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    return cached_fixture(
        "musemotion_evolution",
        sf_dir,
        f"evolution:{_EVO_MOD}".encode(),
        _build,
        table="documents",
    )


@query(
    "q_schema_evolution_read",
    covers=("X-SCHEMA-EVOLUTION",),
    oracle=f"""
    SELECT CASE WHEN doc_id % {_EVO_MOD} = 2 THEN NULL ELSE lang END AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           CAST(count(CASE WHEN doc_id % {_EVO_MOD} <> 0 THEN 1 END) AS BIGINT)
               AS with_source,
           CAST(2 AS BIGINT) AS generations
    FROM documents GROUP BY 1
    """,
)
def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-generation evolved dataset read back whole under the
    lattice-merged union schema and aggregated per lang — the oracle
    recomputes the identical numbers from the raw table, so the hash
    certifies the whole evolution contract at once: chars_sum is only
    right if the gen0 INT files up-cast to long at scan time (plain
    ``mergeSchema`` refuses that merge — measured, round-10 note);
    with_source is only right if gen0 rows NULL-fill the
    later-added column; the NULL-lang group is exactly gen2 (the
    generation that stopped carrying lang); and ``generations`` is
    the sidecar counter (2 after three appends).

    100 TB story: evolution is METADATA work — reconcile touches no
    existing file, the read is one sidecar fetch + one scan under a
    declared schema, and the sidecar publishes before the data under
    a lock (crash- and concurrency-safe; ``sources/evolution.py``).
    The reference's only schema-change path is drop-and-recreate
    (``load_local_to_db.py:122-150``), a full rewrite."""
    import os

    from week4_musemotion_spark.sources.evolution import _read_sidecar, read_evolved

    ds = os.path.join(_evolution_fixture(spark, sf_dir), "dataset")
    gen = _read_sidecar(ds)[1]
    return (
        read_evolved(spark, ds)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
            F.count("source").cast("long").alias("with_source"),
        )
        .withColumn("generations", F.lit(gen).cast("long"))
    )


def _quarantine_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Cached JSONL ingest fixture with planted-broken lines, plus the
    dead-letter parquet the single-pass ``quarantine_to`` landed.

    Every document becomes one JSON line ``{{doc_id, lang, n_chars}}``;
    documents with ``doc_id % {mod} == {res}`` get their line truncated
    two characters short (always unbalanced — malformed, never merely
    wrong-typed).  The sink count is asserted against the planted
    count in the build, so a lost or double-counted dead letter kills
    the fixture loudly."""
    import os

    from week4_musemotion_spark.queries.pipeline_ops import cached_fixture
    from week4_musemotion_spark.sources.quarantine import (
        quarantine_to,
        read_jsonl_quarantined,
    )

    def _build(tmp: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        bad = F.pmod(F.col("doc_id"), F.lit(_Q_MOD)) == _Q_RESIDUE
        j = F.to_json(F.struct(F.col("doc_id"), F.col("lang"), F.col("n_chars")))
        lines = docs.select(j.alias("j"), bad.alias("bad")).select(
            F.when(
                F.col("bad"), F.expr("substring(j, 1, length(j) - 2)")
            ).otherwise(F.col("j")).alias("value")
        )
        lines.repartition(4).write.text(os.path.join(tmp, "lines"))
        _, q = read_jsonl_quarantined(
            spark, os.path.join(tmp, "lines"), "doc_id bigint, lang string, n_chars bigint"
        )
        landed = quarantine_to(q, os.path.join(tmp, "dead_letter"))
        planted = docs.filter(bad).count()
        if landed != planted:
            raise AssertionError(
                f"quarantine fixture drift: sink landed {landed}, planted {planted}"
            )
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    return cached_fixture(
        "musemotion_quarantine",
        sf_dir,
        f"quarantine:{_Q_MOD}:{_Q_RESIDUE}".encode(),
        _build,
        table="documents",
    )


_quarantine_fixture.__doc__ = _quarantine_fixture.__doc__.format(
    mod=_Q_MOD, res=_Q_RESIDUE
)


@query(
    "q_quarantine_split",
    covers=("X-QUARANTINE",),
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_clean,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           (SELECT CAST(count(*) AS BIGINT) FROM documents
             WHERE doc_id % {_Q_MOD} = {_Q_RESIDUE}) AS n_bad
    FROM documents WHERE doc_id % {_Q_MOD} <> {_Q_RESIDUE}
    GROUP BY lang
    """,
)
def q_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter ingestion end to end under the value oracle: the
    planted-broken JSONL fixture is re-split by
    ``read_jsonl_quarantined`` (one text scan; the parse runs in the
    projection), the CLEAN lane aggregates per lang, and ``n_bad`` is
    read back from the dead-letter PARQUET that the single-pass
    ``quarantine_to`` sink landed (its count rode the write as an
    Observation — no second scan).  The oracle recomputes both from
    the raw table with the same modular rule, so the hash certifies
    the malformed-LINE vs coercible-FIELD boundary, zero row loss
    across the split, and the sink's landed count.

    100 TB story: one text scan feeds both lanes (the split is a
    projection-level predicate, never a cache of the corpus); the
    dead-letter lane carries the raw line + source file — everything
    a replay needs after the producer is fixed.  The reference's
    pandas ingest dies on the first malformed line instead
    (``pipeline.py:139``)."""
    import os

    from week4_musemotion_spark.sources.quarantine import read_jsonl_quarantined

    fixture = _quarantine_fixture(spark, sf_dir)
    clean, _ = read_jsonl_quarantined(
        spark, os.path.join(fixture, "lines"), "doc_id bigint, lang string, n_chars bigint"
    )
    n_bad = (
        spark.read.parquet(os.path.join(fixture, "dead_letter"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_bad"))
    )
    return (
        clean.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clean"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
        .crossJoin(F.broadcast(n_bad))
    )
