"""Round-20 staged queries — registered on import, NOT imported by
``queries/__init__`` yet (activation budget: verify-skill rotation
note).

Wave theme: the OPTIMIZE-style small-files compaction certificate —
the round-11 verdict named it the natural next registry-visible
lifecycle op after the r18 evolution/quarantine pair activated.

- q_compact_optimize — a documents dataset deliberately accreted as
  64 tiny files (the micro-batch/row-append degradation every
  long-lived table suffers) rewritten by ``operators/layout.
  compact_parquet`` (crash-safe staging/rename promotion, coalesce —
  never a shuffle), then read back and aggregated per lang WITH the
  before/after file counts riding the row.  The oracle recomputes
  the aggregates from the raw table and pins the file counts, so a
  hash match certifies: zero row loss/duplication through the
  rewrite, exact content preservation (chars_sum), and the layout
  actually changed (64 → 1).  Reference contrast: the reference has
  no layout maintenance at all — its tables are write-once pandas
  dumps (``load_local_to_db.py``), so a years-lived corpus would
  degrade unboundedly.

Differential evidence: tests/test_staged_r20.py (conftest.staged_diff
at sf0.001; sf0.01/sf0.1 via ``tools/check_correctness.py --staged``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.queries.registry import query
from week4_musemotion_spark.sources.tables import load_table

# chains staged_r19 -> ... -> r9 registration
import week4_musemotion_spark.queries.staged_r19  # noqa: F401

#: Small-file count the fixture accretes before compaction.  64
#: round-robin partitions over >=500 rows are all non-empty, so the
#: pre-compaction file count is deterministic at every SF.
_N_SMALL = 64


def _compact_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Cached small-files dataset + its compaction: documents written
    as {n} tiny files, then ``compact_parquet`` with a target of one
    file.  The build asserts the before/after counts so a layout
    drift (an empty round-robin partition, a changed coalesce) kills
    the fixture loudly instead of hash-failing downstream."""
    import glob
    import json
    import os

    from week4_musemotion_spark.operators.layout import compact_parquet
    from week4_musemotion_spark.queries.pipeline_ops import cached_fixture

    def _build(tmp: str) -> None:
        ds = os.path.join(tmp, "dataset")
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        docs.repartition(_N_SMALL).write.parquet(ds)
        before = len(glob.glob(os.path.join(ds, "*.parquet")))
        if before != _N_SMALL:
            raise AssertionError(
                f"compact fixture drift: wrote {before} files, wanted {_N_SMALL}"
            )
        after = compact_parquet(spark, ds, target_file_bytes=1 << 40)
        if after != 1:
            raise AssertionError(
                f"compact fixture drift: compaction left {after} files, wanted 1"
            )
        with open(os.path.join(tmp, "layout.json"), "w") as fh:
            json.dump({"files_before": before, "files_after": after}, fh)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    return cached_fixture(
        "musemotion_compact",
        sf_dir,
        f"compact:{_N_SMALL}".encode(),
        _build,
        table="documents",
    )


if _compact_fixture.__doc__:  # None under python -OO
    _compact_fixture.__doc__ = _compact_fixture.__doc__.format(n=_N_SMALL)


@query(
    "q_compact_optimize",
    covers=("X-COMPACT-OPTIMIZE",),
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           CAST({_N_SMALL} AS BIGINT) AS files_before,
           CAST(1 AS BIGINT) AS files_after
    FROM documents GROUP BY lang
    """,
)
def q_compact_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-style small-files compaction under the value oracle:
    the 64-tiny-file fixture dataset is compacted by
    ``compact_parquet`` and read back; per-lang aggregates prove the
    rewrite lost and duplicated NOTHING (count + chars_sum hash-match
    the raw table), while the before/after file counts riding every
    row prove the layout really changed (64 → 1).

    100 TB story: compaction is coalesce-only (glues input splits —
    no shuffle, no sort), promotes via staging/rename so the live
    dataset is never deleted before its replacement is complete, and
    recovers from a crash at either rename.  Operationally this is
    the table format's OPTIMIZE action; partition-preserving
    compaction composes it per partition directory.  The reference
    has no layout maintenance surface (write-once pandas dumps,
    ``load_local_to_db.py``)."""
    import json
    import os

    fixture = _compact_fixture(spark, sf_dir)
    with open(os.path.join(fixture, "layout.json")) as fh:
        layout = json.load(fh)
    return (
        spark.read.parquet(os.path.join(fixture, "dataset"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
        .withColumn("files_before", F.lit(layout["files_before"]).cast("long"))
        .withColumn("files_after", F.lit(layout["files_after"]).cast("long"))
    )
