"""Schema evolution for long-lived parquet corpora.

The reference cannot evolve a schema: every load path is either a
full replace (``pipeline.py:150-175`` truncate-then-insert) or an
explicit drop-and-recreate DDL (``load_local_to_db.py:120-140``) —
workable at 1,499 rows, impossible at 100 TB, where a corpus lives
for years and its schema drifts batch by batch (a new metadata
column appears, an old one stops being emitted, an int column
outgrows 32 bits).  This module is the engine's evolution contract:

- :func:`evolve_append` — append a drifted batch to an existing
  parquet dataset.  Reconciliation is METADATA work (no data scan):
  columns the dataset has but the batch lacks are written as typed
  NULLs; columns the batch adds join the union schema (older files
  simply lack them); type drift is resolved by WIDENING along a
  lossless lattice (int → long, float → double; int → double is
  refused — silent precision loss above 2^53 — as is any unrelated
  pair), and the batch is written at the wider type so newer files
  carry it.
- :func:`read_evolved` — the corpus across every schema generation:
  Spark's parquet reader is given the lattice-merged UNION schema
  explicitly, under which it up-casts narrow files (int32 columns
  read as long — verified against Spark 4.1) and NULL-fills columns
  a generation lacked.  Plain ``mergeSchema`` cannot do this — it
  REFUSES int-vs-long file merges (``CANNOT_MERGE_SCHEMAS``), which
  is exactly why widening needs an engine-level contract.

The current union schema is persisted as a ``_evolution_schema.json``
sidecar on every append (underscore-prefixed, so Spark's file index
ignores it as data) — reads resolve the schema from one tiny file
instead of a footer sweep.  When the sidecar is absent (pre-existing
dataset), the union is recovered by a per-file footer pass (pyarrow;
at cluster scale run the same pass distributed over the file list,
or adopt a real metastore — the sidecar IS the metastore-lite).

Policy notes (deliberate choices, not limitations):

- Widening happens on APPEND (new files get the wider type);
  existing files are never rewritten — the declared-schema read
  up-casts them for free.
- Dropping a column is an append-side non-event (the batch stops
  carrying it); readers keep seeing it (NULL for new rows).
  Actually REMOVING it from the union is a rewrite (compaction's
  job), never an append-time mutation.
- Incompatible drift (string vs int, array vs scalar, narrowing)
  raises a curated error naming the column and both types — a
  3 a.m. pipeline should fail loudly, not coerce.
- The sidecar publishes BEFORE the data on every append (a superset
  sidecar is harmless; files newer than the sidecar are not), and
  the WHOLE append — sidecar merge and data write — is serialized by
  an ``O_CREAT|O_EXCL`` lock file: the merge is read-modify-write
  (unserialized, concurrent appends drop each other's added
  columns), and Spark's FileOutputCommitter stages every job to one
  path under the same ``_temporary/0`` dir, so concurrent data
  writes corrupt each other regardless (measured).  Single-writer
  per dataset is the honest contract for a metastore-less local
  protocol; table formats with concurrency-designed committers
  (Iceberg/Delta) are the cluster answer.
- The sidecar/lock protocol is os.path-based, so remote URIs
  (s3://, hdfs://, abfss://) are REFUSED loudly rather than
  mis-read as "dataset absent" — the cluster deployment routes the
  same protocol through the Hadoop FileSystem API or a metastore.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SIDECAR = "_evolution_schema.json"
_LOCK = _SIDECAR + ".lock"
_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def _require_local(path: str) -> None:
    """This module's sidecar/lock discipline is os.path-based; a
    remote URI (s3://, abfss://, hdfs://) would silently read as
    "dataset absent" and take the first-write branch — appending an
    UNRECONCILED batch into an existing dataset.  Fail loudly
    instead; the cluster deployment routes the same sidecar protocol
    through the Hadoop FileSystem API (or a real metastore)."""
    if _SCHEME.match(path):
        raise NotImplementedError(
            f"schema evolution sidecar protocol is local-filesystem only; "
            f"got {path!r} — route remote datasets through the Hadoop "
            f"FileSystem API or a metastore"
        )

#: Lossless widenings (narrow simpleString -> wider simpleString).
#: Anything not listed (and not an exact match) is a conflict.
_WIDENINGS: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint"},
    "smallint": {"int", "bigint"},
    "int": {"bigint"},
    "float": {"double"},
}


def _widen(a: T.DataType, b: T.DataType, col: str) -> T.DataType:
    """The narrower-to-wider resolution of two drifted types, or a
    curated error when no lossless widening exists."""
    if a == b:
        return a
    an, bn = a.simpleString(), b.simpleString()
    if bn in _WIDENINGS.get(an, ()):
        return b
    if an in _WIDENINGS.get(bn, ()):
        return a
    raise ValueError(
        f"schema evolution conflict on column {col!r}: dataset has "
        f"{an}, batch has {bn} — no lossless widening; rewrite the "
        f"dataset (compaction) or rename the batch column"
    )


def _merge_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """Union of two generations' fields, types widened per column;
    field order = a's fields then b's new fields (stable across
    repeated merges)."""
    a_by_name = {f.name: f for f in a.fields}
    out: list[T.StructField] = []
    for f in a.fields:
        if any(g.name == f.name for g in b.fields):
            g = next(g for g in b.fields if g.name == f.name)
            out.append(T.StructField(f.name, _widen(f.dataType, g.dataType, f.name), True))
        else:
            out.append(T.StructField(f.name, f.dataType, True))
    for g in b.fields:
        if g.name not in a_by_name:
            out.append(T.StructField(g.name, g.dataType, True))
    return T.StructType(out)


def reconcile_to(df: DataFrame, target: T.StructType) -> DataFrame:
    """``df`` projected onto ``target``'s column set and order:
    missing columns become typed NULLs, present columns cast to the
    target type (validated against the lossless lattice), extra
    columns are an error (merge the union schema first)."""
    have = {f.name: f for f in df.schema.fields}
    extra = set(have) - {f.name for f in target.fields}
    if extra:
        raise ValueError(f"reconcile_to: unexpected columns {sorted(extra)}")
    cols = []
    for f in target.fields:
        if f.name in have:
            wide = _widen(have[f.name].dataType, f.dataType, f.name)  # raises on conflict
            if wide != f.dataType:
                # the df's type is the WIDER of the pair: casting down
                # to the target would silently truncate (bigint -> int
                # wraps).  Only lossless up-casts pass; widen the
                # target first (merge the union schema).
                raise ValueError(
                    f"reconcile_to: column {f.name!r} is "
                    f"{have[f.name].dataType.simpleString()} but the target "
                    f"declares narrower {f.dataType.simpleString()} — "
                    "refusing the lossy down-cast; merge the union schema "
                    "into the target first"
                )
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def _footer_union(path: str) -> T.StructType | None:
    """Per-file footer sweep (pyarrow), lattice-merged — the sidecar
    fallback for datasets that predate this module."""
    import glob as _glob

    from pyspark.sql.pandas.types import from_arrow_schema
    import pyarrow.parquet as pq

    # recursive: a dataset that was ever written with partitionBy
    # nests its files under key=value dirs (note: the partition
    # columns themselves live in directory names, not footers — a
    # partitioned corpus should carry its sidecar, which records the
    # full schema)
    files = sorted(
        _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    if not files:
        return None
    merged: T.StructType | None = None
    for f in files:
        s = from_arrow_schema(pq.ParquetFile(f).schema_arrow)
        merged = s if merged is None else _merge_schemas(merged, s)
    return merged


def _read_sidecar(path: str) -> tuple[T.StructType, int] | None:
    side = os.path.join(path, _SIDECAR)
    if not os.path.exists(side):
        return None
    with open(side) as fh:
        doc = json.load(fh)
    return T.StructType.fromJson(doc["schema"]), doc["generation"]


def dataset_schema(spark: SparkSession, path: str) -> T.StructType | None:
    """The dataset's current UNION schema (sidecar if present, else a
    footer sweep), or None when the dataset doesn't exist yet."""
    _require_local(path)
    side = _read_sidecar(path)
    if side is not None:
        return side[0]
    if not os.path.isdir(path):
        return None
    return _footer_union(path)


def _write_sidecar(path: str, schema: T.StructType, generation: int) -> None:
    # temp + atomic rename: a concurrent reader sees the old sidecar
    # or the new one, never a torn write (same discipline as the
    # export manifest's staging+rename)
    side = os.path.join(path, _SIDECAR)
    tmp = side + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"generation": generation, "schema": schema.jsonValue()}, fh)
    os.replace(tmp, side)


#: Default time an appender will wait for a competing append to
#: finish.  The lock covers the DATA write too (see _acquire_lock),
#: so the budget is sized for a real batch write, not a metadata
#: blip.
_LOCK_TIMEOUT = 600.0


def _acquire_lock(path: str, timeout: float) -> str:
    """Take the dataset's exclusive append lock (`O_CREAT|O_EXCL`
    file), waiting up to ``timeout``.  The lock covers the WHOLE
    append — sidecar merge AND data write — for two reasons:

    - **Lost-update safety**: the sidecar merge is read-modify-write;
      unserialized, two concurrent appends each merge against the
      stale union and the last writer silently drops the other's
      added/widened column.
    - **Committer safety**: Spark's FileOutputCommitter stages every
      job writing to a path under the SAME ``<path>/_temporary/0``
      dir, so two concurrent appends to one dataset clobber each
      other's task-attempt dirs (measured: a threaded append race
      fails inside the committer's chmod, not in our code).  Parquet
      appends landing "distinct files" is not enough — the STAGING
      area is shared.

    A lock older than ``timeout`` raises with the lock path so an
    operator can remove a crashed holder's leftover."""
    lock = os.path.join(path, _LOCK)
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return lock
        except FileExistsError:
            # staleness check (the docstring's contract): a lock whose
            # mtime is older than the full timeout cannot belong to a
            # live append — raise NOW naming the holder instead of
            # making every future appender sit out the whole wait
            try:
                age = time.time() - os.stat(lock).st_mtime
            except FileNotFoundError:
                continue  # holder released between open and stat
            if age > timeout:
                try:
                    with open(lock) as fh:
                        holder = fh.read().strip() or "?"
                except OSError:
                    holder = "?"
                raise TimeoutError(
                    f"evolve_append: stale lock {lock} (age {age:.0f}s > "
                    f"timeout {timeout:.0f}s, holder pid {holder}) — a "
                    "crashed writer likely left it behind; remove the lock "
                    f"after confirming pid {holder} is not a live writer"
                )
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"evolve_append: could not acquire {lock} within "
                    f"{timeout:.0f}s — another append holds it, or a "
                    "crashed writer left it behind (safe to remove after "
                    "confirming no live writer)"
                )
            time.sleep(0.05)


def _resolve_and_publish(
    spark: SparkSession, path: str, batch: T.StructType
) -> tuple[T.StructType | None, T.StructType, int]:
    """Resolve the current union, merge ``batch`` in, and publish the
    sidecar — BEFORE any data lands.  Caller must hold the lock.

    The ordering is the crash-safety invariant: a sidecar describing
    a SUPERSET of the files on disk is harmless (declared-schema
    reads NULL-fill columns that have no files yet), while files
    newer than the sidecar are not — readers would miss added
    columns, and a widened file under a stale narrow declared type is
    a read error.  A crash between sidecar and data leaves a valid
    (if slightly eager) dataset."""
    side = _read_sidecar(path)
    if side is not None:
        current, prev_gen = side
        gen = prev_gen + 1
    else:
        current = _footer_union(path)  # pre-existing sidecar-less dataset
        gen = 0
    union = batch if current is None else _merge_schemas(current, batch)
    _write_sidecar(path, union, gen)
    return current, union, gen


def _publish_union(spark: SparkSession, path: str, batch: T.StructType,
                   timeout: float = _LOCK_TIMEOUT) -> tuple[T.StructType | None, T.StructType, int]:
    """Sidecar-only publish (no data): acquire the lock, merge +
    publish, release.  Exists for crash-simulation tests; real
    appends go through :func:`evolve_append`, which holds the lock
    across the data write too."""
    os.makedirs(path, exist_ok=True)
    lock = _acquire_lock(path, timeout)
    try:
        return _resolve_and_publish(spark, path, batch)
    finally:
        os.remove(lock)


def evolve_append(df: DataFrame, path: str, timeout: float = _LOCK_TIMEOUT) -> dict:
    """Append a possibly-drifted batch to the parquet dataset at
    ``path`` and return an evolution report::

        {"added": [new cols], "filled": [cols NULL-filled in batch],
         "widened": [(col, from, to)], "generation": n}

    First write (no dataset yet) is a plain create (generation 0).
    The batch lands under the UNION schema — batch-missing columns
    as typed NULLs, drifted types widened — so every file remains
    individually consistent and :func:`read_evolved` reconstructs
    the union without a rewrite.

    Single-writer per dataset, ENFORCED: the lock file is held across
    the sidecar merge AND the data write, because concurrent Spark
    jobs writing one path share the committer's ``_temporary/0``
    staging dir and corrupt each other (see :func:`_acquire_lock`).
    Within the lock the sidecar still publishes BEFORE the data —
    the crash-safety ordering (see :func:`_resolve_and_publish`).
    Concurrent appends therefore serialize (second waits up to
    ``timeout``), which is the honest contract for a metastore-less
    local protocol; a cluster deployment gets write concurrency from
    a real table format (Iceberg/Delta) whose committers are
    designed for it."""
    spark = df.sparkSession
    _require_local(path)
    os.makedirs(path, exist_ok=True)
    lock = _acquire_lock(path, timeout)
    try:
        current, union, gen = _resolve_and_publish(spark, path, df.schema)
        report: dict = {"added": [], "filled": [], "widened": [], "generation": gen}
        if current is None:
            df.write.mode("append").parquet(path)
            return report
        batch = {f.name: f.dataType for f in df.schema.fields}
        for f in current.fields:
            if f.name in batch:
                wide = _widen(f.dataType, batch[f.name], f.name)
                if wide != f.dataType:
                    report["widened"].append(
                        (f.name, f.dataType.simpleString(), wide.simpleString())
                    )
            else:
                report["filled"].append(f.name)
        known = {f.name for f in current.fields}
        report["added"] = [f.name for f in df.schema.fields if f.name not in known]
        reconcile_to(df, union).write.mode("append").parquet(path)
        return report
    finally:
        os.remove(lock)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """The corpus across every schema generation: the lattice-merged
    union schema is DECLARED to the reader, under which Spark
    up-casts narrow files (int32 → long, float → double) and
    NULL-fills columns a generation lacked.  One sidecar read (or
    footer sweep) + one scan; no file rewrite ever."""
    schema = dataset_schema(spark, path)
    if schema is None:
        raise FileNotFoundError(f"no parquet dataset at {path}")
    return spark.read.schema(schema).parquet(path)
