"""Malformed-record quarantine (dead-letter) ingestion.

A 100 TB ingest ALWAYS contains broken lines — truncated writes,
encoding damage, a producer bug's half-JSON.  The two default
postures are both wrong at scale: FAILFAST kills a day-long job on
line 40 billion, and DROPMALFORMED silently deletes data (the
reference inherits pandas' posture: ``pd.to_numeric(errors=
"coerce")`` nulls bad FIELDS but a bad LINE kills the load,
``pipeline.py:108-110``).  The production contract is a dead-letter
split: clean rows flow on, broken lines land in a quarantine with
enough context to replay them after the producer is fixed.

Design (one scan, no caching tricks): the file is read as TEXT and
parsed with ``from_json`` in the projection, so the malformed-ness
test is just ``parsed IS NULL`` — sidestepping Spark's restriction
on queries that reference only the internal corrupt-record column of
a JSON reader (which forces a ``cache()`` of the whole corpus to
split clean from bad; unacceptable at scale).

Malformed means the LINE doesn't parse (broken JSON, empty).  A line
that parses but carries a wrong-typed FIELD is clean-with-NULL-field
— that is the engine's safe-cast discipline (SURVEY §2 F3), same as
the reference's ``errors="coerce"``; quarantine is for lines that
cannot enter the schema at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """``(clean, quarantined)`` from a JSON-lines path.

    ``clean`` carries the schema's columns (wrong-typed fields are
    NULL — safe-cast semantics); ``quarantined`` carries the raw
    line verbatim plus its source file, which is everything a replay
    needs.  Blank lines are noise, not data — they are dropped from
    both sides.  One text scan; the parse runs in the projection
    (whole-stage codegen), never a second pass."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    for f in schema.fields:
        if not isinstance(f.dataType, T.AtomicType):
            raise ValueError(
                f"read_jsonl_quarantined: column {f.name!r} has non-atomic "
                f"type {f.dataType.simpleString()} — the safe-cast split is "
                "defined for flat tabular schemas; parse nested payloads "
                "downstream with from_json on the string column"
            )
    # parse every field as STRING first: from_json under a typed
    # schema treats a wrong-typed FIELD as a bad RECORD (whole row
    # nulled — measured), which would quarantine coercible lines.
    # The string parse always succeeds for well-formed JSON; the
    # typed cast then nulls exactly the bad fields (try_cast — the
    # engine's F3 safe-cast, ANSI-proof).  Malformed LINES land in
    # the corrupt-record slot (a bare null-struct test cannot see
    # them: broken JSON and '{}' both parse to a struct of nulls —
    # measured).
    parse_schema = T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
        + [T.StructField("_corrupt", T.StringType(), True)]
    )
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
    raw = spark.read.text(path).select(
        F.col("value").alias("_raw"),
        F.input_file_name().alias("_src_file"),
    )
    raw = raw.filter(F.trim(F.col("_raw")) != "")
    parsed = raw.select(
        "_raw", "_src_file", F.from_json(F.col("_raw"), parse_schema, opts).alias("_p")
    )
    bad = F.col("_p").isNull() | F.col("_p._corrupt").isNotNull()
    clean = parsed.filter(~bad).select(
        *[
            F.col(f"_p.{f.name}").try_cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )
    quarantined = parsed.filter(bad).select(
        F.col("_raw").alias("raw_line"), F.col("_src_file").alias("src_file")
    )
    return clean, quarantined


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    sep: str = ",",
    header: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The CSV twin of :func:`read_jsonl_quarantined` — the
    reference's headerless-CSV shape (SURVEY §2 S1/P2) with a
    dead-letter lane.  ``from_csv`` under PERMISSIVE surfaces
    structurally broken lines through an explicit corrupt-record
    slot; wrong-typed FIELDS null out (safe-cast), wrong-SHAPED
    lines (extra/missing separators that PERMISSIVE cannot place)
    quarantine."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    # all-string parse for the same reason as the JSONL twin: under a
    # typed schema, PERMISSIVE records a TYPE failure in the corrupt
    # slot too (measured — '4,badnum,xx' with a bigint column
    # quarantines), which would ship coercible rows to the dead
    # letter.  String fields cannot type-fail, so the corrupt slot is
    # left meaning exactly "the line's SHAPE doesn't fit"; the typed
    # try_cast below nulls bad fields (F3 safe-cast).
    parse_schema = T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
        + [T.StructField("_corrupt", T.StringType(), True)]
    )
    raw = spark.read.text(path).select(
        F.col("value").alias("_raw"),
        F.input_file_name().alias("_src_file"),
        F.col("_metadata.file_block_start").alias("_blk"),
    )
    raw = raw.filter(F.trim(F.col("_raw")) != "")
    if header:
        # drop each file's first line (headerless is the reference's
        # norm; header=True exists for completeness of the twin).
        # The header is row 1 of the block at FILE OFFSET 0 — keying
        # the window by (file, block) keeps the row_number ordering
        # within a single scan task, where monotonically_increasing_id
        # follows physical read order by construction.  A file-wide
        # window ordered by that id would instead lean on partition
        # indices following split-offset order across tasks, which is
        # an implementation detail, not a contract — a reordering
        # would drop a data row and keep the header.
        from pyspark.sql import Window

        w = Window.partitionBy("_src_file", "_blk").orderBy(
            F.monotonically_increasing_id()
        )
        raw = raw.withColumn("_ln", F.row_number().over(w)).filter(
            ~((F.col("_blk") == 0) & (F.col("_ln") == 1))
        ).drop("_ln")
    raw = raw.drop("_blk")
    opts = {
        "sep": sep,
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": "_corrupt",
    }
    # from_csv takes a DDL string, not a StructType
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in parse_schema.fields)
    parsed = raw.select(
        "_raw",
        "_src_file",
        F.from_csv(F.col("_raw"), ddl, opts).alias("_p"),
    )
    bad = F.col("_p").isNull() | F.col("_p._corrupt").isNotNull()
    clean = parsed.filter(~bad).select(
        *[
            F.col(f"_p.{f.name}").try_cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )
    quarantined = parsed.filter(bad).select(
        F.col("_raw").alias("raw_line"), F.col("_src_file").alias("src_file")
    )
    return clean, quarantined


def quarantine_to(quarantined: DataFrame, path: str) -> int:
    """Append the dead-letter rows (plus an ingest timestamp) to a
    parquet quarantine and return how many landed — the number an
    ingest report alerts on.

    ONE pass: the count rides the write as an ``Observation`` metric
    (the engine's zero-extra-scan pattern), never a separate
    ``count()`` — the quarantine OUTPUT is tiny but its lineage is
    the full text scan + parse, so a pre-count would pay a whole
    extra corpus pass at 100 TB (and could disagree with the write
    if input files changed between the two).  When the single pass
    lands zero rows into a directory this call created, the empty
    directory is removed so ops tooling globbing quarantine dirs
    never alerts on schema-only debris — but only after re-checking
    the parquet footers on disk actually hold zero rows, so a
    concurrent ingest that landed rows into the same fresh path just
    after ours can never be rmtree'd away (the single-report-per-path
    assumption is now enforced, not just stated)."""
    import os
    import shutil

    from pyspark.sql import Observation

    preexisting = os.path.isdir(path)
    obs = Observation()
    out = quarantined.observe(obs, F.count(F.lit(1)).alias("n"))
    out.withColumn("quarantined_at", F.current_timestamp()).write.mode(
        "append"
    ).parquet(path)
    n = int(obs.get["n"])
    if n == 0 and not preexisting and _parquet_dir_rows(path) == 0:
        shutil.rmtree(path, ignore_errors=True)
    return n


def _parquet_dir_rows(path: str) -> int:
    """Total rows across every parquet footer directly under ``path``
    — the cheap (footer-only) emptiness re-check quarantine_to runs
    before removing a zero-row directory.  An unreadable part file
    counts as data: when in doubt, keep the directory."""
    import os

    import pyarrow.parquet as pq

    if not os.path.isdir(path):
        return 0
    total = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        try:
            total += pq.ParquetFile(os.path.join(path, name)).metadata.num_rows
        except Exception:
            return 1  # torn/foreign file: treat as occupied
    return total


def replay_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fix=None,
    fmt: str = "json",
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Re-ingest a dead-letter parquet after the producer is fixed:
    ``(clean, still_bad)`` from re-parsing each quarantined
    ``raw_line`` (optionally repaired first by ``fix``, a Column →
    Column expression builder — e.g. a regexp_replace closing a
    known truncation).  Lines that now parse flow on under the same
    all-string-parse + try_cast discipline as the live lane; lines
    that still fail stay in replay shape (raw_line, src_file) so the
    loop can run again after the next fix.  ``fmt`` selects the
    lane's grammar ("json" or "csv", matching which reader
    quarantined the lines).

    This is the second half of the dead-letter contract: the
    quarantine stores the raw line + source file precisely so a
    replay needs NO access to the original (possibly already aged
    out) ingest files.  At 100 TB the quarantine is tiny relative to
    the corpus, so replays are cheap to iterate."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if fmt not in ("json", "csv"):
        raise ValueError(f"replay_quarantined: fmt must be json or csv, got {fmt!r}")
    q = spark.read.parquet(path)
    line = F.col("raw_line")
    if fix is not None:
        line = fix(line)
    parse_schema = T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
        + [T.StructField("_corrupt", T.StringType(), True)]
    )
    if fmt == "json":
        opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
        parsed_col = F.from_json(line, parse_schema, opts)
    else:
        opts = {
            "sep": sep,
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": "_corrupt",
        }
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in parse_schema.fields
        )
        parsed_col = F.from_csv(line, ddl, opts)
    parsed = q.select(
        "raw_line",
        "src_file",
        parsed_col.alias("_p"),
    )
    bad = F.col("_p").isNull() | F.col("_p._corrupt").isNotNull()
    clean = parsed.filter(~bad).select(
        *[
            F.col(f"_p.{f.name}").try_cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )
    still_bad = parsed.filter(bad).select("raw_line", "src_file")
    return clean, still_bad
