"""End-to-end corpus refresh: the nightly pipeline a training-data
warehouse runs, composed entirely from this engine's operators.

    new batch ──┐
                ├─ exact incremental dedup vs current snapshot
                │    (operators/dedup.incremental_dedup: hash anti-join)
                ├─ CDC merge into the snapshot
                │    (operators/upsert.apply_cdc: latest-change-wins + deletes)
                ├─ versioned snapshot write
                │    (operators/versioned.write_version: time travel, rollback)
                ├─ ANALYZE for the optimizer (operators/stats) [optional]
                └─ data-quality report (row counts, dedup rate)

The reference's loaders (pipeline.py:126-174) do extract→clean→
replace with no dedup, no versioning, and no audit; this is the
production shape those scripts grow into.  Every stage is a keyed
aggregate/join — cost is O(batch + touched snapshot), and rollback
is ``read_version(n-1)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from week4_musemotion_spark.operators.dedup import incremental_dedup
from week4_musemotion_spark.operators.upsert import apply_cdc
from week4_musemotion_spark.operators.versioned import (
    list_versions,
    read_version,
    write_version,
)


def corpus_refresh(
    spark: SparkSession,
    base: str,
    batch: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    deletes: DataFrame | None = None,
) -> dict[str, int]:
    """Apply one ingest batch to the versioned corpus at ``base``.

    1. Content-dedup the batch against the current snapshot (exact,
       hash anti-join) — re-crawled bytes never re-enter the corpus.
    2. Apply surviving rows as CDC upserts (plus optional ``deletes``,
       a 1-column DataFrame of keys to remove — takedowns/opt-outs).
    3. Write the merged state as the next snapshot version.

    Returns an audit report (the numbers a pipeline alerts on):
    ``batch_rows``, ``duplicate_rows`` (dropped by dedup),
    ``deleted_rows``, ``version`` (new snapshot number),
    ``corpus_rows`` (after merge).
    """
    have = list_versions(base)
    snapshot = read_version(spark, base) if have else None

    batch_rows = batch.count()
    if snapshot is not None:
        fresh_ids = incremental_dedup(batch, snapshot, text_col=text_col, id_col=key).select(key)
        fresh = batch.join(fresh_ids, key, "left_semi")
    else:
        fresh = batch
    fresh_rows = fresh.count()

    changes = fresh.withColumn("op", F.lit("U"))
    del_rows = 0
    if deletes is not None:
        del_rows = deletes.count()
        if snapshot is not None:
            tomb_cols = [
                F.col(key) if c == key else F.lit(None).cast(snapshot.schema[c].dataType).alias(c)
                for c in snapshot.columns
            ]
        else:
            tomb_cols = [
                F.col(key) if c == key else F.lit(None).cast(batch.schema[c].dataType).alias(c)
                for c in batch.columns
            ]
        changes = changes.unionByName(
            deletes.select(*tomb_cols).withColumn("op", F.lit("D"))
        )

    # a key both upserted and deleted in the SAME batch must resolve
    # deterministically: the takedown wins (order_by on the delete
    # flag — without it the within-batch winner is shuffle-dependent)
    changes = changes.withColumn("_del_prio", (F.col("op") == "D").cast("int"))
    merged = apply_cdc(snapshot, changes, [key], order_by=["_del_prio"]).drop("_del_prio")
    version = write_version(merged, base)
    corpus_rows = read_version(spark, base, version).count()
    return {
        "batch_rows": batch_rows,
        "duplicate_rows": batch_rows - fresh_rows,
        "deleted_rows": del_rows,
        "version": version,
        "corpus_rows": corpus_rows,
    }
