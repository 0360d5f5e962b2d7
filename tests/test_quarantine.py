"""Dead-letter ingestion (sources/quarantine.py): clean/quarantine
splits for JSONL and CSV, safe-cast vs quarantine boundary, replay
context, quarantine sink."""

from __future__ import annotations

import os

from week4_musemotion_spark.sources.quarantine import (
    quarantine_to,
    read_csv_quarantined,
    read_jsonl_quarantined,
)

_SCHEMA = "doc_id bigint, text string, score bigint"


def _write(p, lines):
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_jsonl_split_clean_vs_quarantine(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    _write(
        p,
        [
            '{"doc_id": 1, "text": "ok", "score": 5}',
            '{"doc_id": 2, "text": "also ok"}',          # missing field -> NULL, clean
            '{"doc_id": 3, "text": "typed", "score": "NaNish"}',  # bad FIELD -> safe-cast NULL, clean
            '{"doc_id": 4, "text": "trunca',              # broken JSON -> quarantine
            "",                                           # blank -> dropped entirely
            "not json at all",                            # -> quarantine
        ],
    )
    clean, bad = read_jsonl_quarantined(spark, p, _SCHEMA)
    got = {r.doc_id: (r.text, r.score) for r in clean.collect()}
    assert got == {1: ("ok", 5), 2: ("also ok", None), 3: ("typed", None)}
    bl = bad.collect()
    assert sorted(r.raw_line for r in bl) == ["not json at all", '{"doc_id": 4, "text": "trunca']
    # replay context: every quarantined row names its source file
    assert all(r.src_file.endswith("in.jsonl") for r in bl)


def test_csv_split_clean_vs_quarantine(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    _write(
        p,
        [
            "1,hello,5",
            "2,partial,",            # empty numeric field -> NULL, clean
            "3,too,many,fields,9",   # extra separators -> quarantine
            "4,badnum,xx",           # bad FIELD -> safe-cast NULL, clean
        ],
    )
    clean, bad = read_csv_quarantined(spark, p, _SCHEMA)
    got = {r.doc_id: (r.text, r.score) for r in clean.collect()}
    assert got == {1: ("hello", 5), 2: ("partial", None), 4: ("badnum", None)}
    assert [r.raw_line for r in bad.collect()] == ["3,too,many,fields,9"]


def test_quarantine_sink_appends_and_counts(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    _write(p, ['{"doc_id": 1, "text": "ok", "score": 2}', "broken {"])
    _, bad = read_jsonl_quarantined(spark, p, _SCHEMA)
    qdir = str(tmp_path / "dead_letter")
    assert quarantine_to(bad, qdir) == 1
    back = spark.read.parquet(qdir)
    rows = back.collect()
    assert len(rows) == 1 and rows[0].raw_line == "broken {"
    assert rows[0].quarantined_at is not None
    # empty quarantines write nothing (no empty parquet directories)
    clean_only, none_bad = read_jsonl_quarantined(spark, p, _SCHEMA)
    empty = none_bad.filter("raw_line = 'never-matches'")
    assert quarantine_to(empty, str(tmp_path / "q2")) == 0
    assert not os.path.exists(str(tmp_path / "q2"))


def test_csv_header_dropped_per_file_by_block_offset(spark, tmp_path):
    # two files, each with a header line; headers must vanish from
    # BOTH lanes while every data row (clean or broken) survives
    p1 = str(tmp_path / "a.csv")
    p2 = str(tmp_path / "b.csv")
    _write(p1, ["doc_id,text,score", "1,hello,5", "2,too,many,fields,9"])
    _write(p2, ["doc_id,text,score", "3,world,7"])
    clean, bad = read_csv_quarantined(
        spark, str(tmp_path), _SCHEMA, header=True
    )
    got = {r.doc_id: (r.text, r.score) for r in clean.collect()}
    # the header line itself parses shape-wise ("doc_id" try_casts to
    # NULL) — header=True must remove it, not null-cast it
    assert got == {1: ("hello", 5), 3: ("world", 7)}
    assert [r.raw_line for r in bad.collect()] == ["2,too,many,fields,9"]


def test_quarantine_sink_zero_rows_keeps_existing_dir(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    _write(p, ['{"doc_id": 1, "text": "ok", "score": 2}', "broken {"])
    _, bad = read_jsonl_quarantined(spark, p, _SCHEMA)
    qdir = str(tmp_path / "dead_letter")
    assert quarantine_to(bad, qdir) == 1
    # a later zero-row ingest must not delete the existing quarantine
    assert quarantine_to(bad.filter("raw_line = 'no-match'"), qdir) == 0
    assert os.path.isdir(qdir)
    assert spark.read.parquet(qdir).count() == 1


def test_replay_after_producer_fix_round_trips(spark, tmp_path):
    from pyspark.sql import functions as F

    from week4_musemotion_spark.sources.quarantine import replay_quarantined

    p = str(tmp_path / "in.jsonl")
    # two truncated lines (missing the closing brace) + one clean
    _write(
        p,
        [
            '{"doc_id": 1, "text": "ok", "score": 2}',
            '{"doc_id": 2, "text": "cut", "score": 3',
            '{"doc_id": 3, "text": "cut2", "score": 4',
        ],
    )
    clean, bad = read_jsonl_quarantined(spark, p, _SCHEMA)
    qdir = str(tmp_path / "dead_letter")
    assert quarantine_to(bad, qdir) == 2
    # replay WITHOUT a fix: still broken, nothing flows
    flowed, still = replay_quarantined(spark, qdir, _SCHEMA)
    assert flowed.count() == 0 and still.count() == 2
    # replay WITH the producer fix (close the object)
    fix = lambda c: F.concat(c, F.lit("}"))  # noqa: E731
    flowed, still = replay_quarantined(spark, qdir, _SCHEMA, fix=fix)
    got = {r.doc_id: (r.text, r.score) for r in flowed.collect()}
    assert got == {2: ("cut", 3), 3: ("cut2", 4)}
    assert still.count() == 0
    # still_bad keeps replay shape so the loop can run again
    assert [f.name for f in still.schema.fields] == ["raw_line", "src_file"]


def test_csv_replay_after_fix(spark, tmp_path):
    from pyspark.sql import functions as F

    from week4_musemotion_spark.sources.quarantine import replay_quarantined

    p = str(tmp_path / "in.csv")
    # one shape-broken line (extra field from an unescaped comma)
    _write(p, ["1,hello,5", "2,oops,extra,7"])
    _, bad = read_csv_quarantined(spark, p, _SCHEMA)
    qdir = str(tmp_path / "dl")
    assert quarantine_to(bad, qdir) == 1
    # producer fix: collapse the stray comma
    fix = lambda c: F.regexp_replace(c, "oops,extra", "oops extra")  # noqa: E731
    flowed, still = replay_quarantined(spark, qdir, _SCHEMA, fix=fix, fmt="csv")
    got = {r.doc_id: (r.text, r.score) for r in flowed.collect()}
    assert got == {2: ("oops extra", 7)} and still.count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fmt must be"):
        replay_quarantined(spark, qdir, _SCHEMA, fmt="xml")


def test_zero_row_cleanup_rechecks_footers_before_removal(
    spark, tmp_path, monkeypatch
):
    """Round-12 advice: quarantine_to sampled `preexisting` BEFORE
    the write, so a concurrent ingest landing rows into the same
    fresh path just after ours could be rmtree'd away.  The removal
    now re-checks the parquet footers on disk."""
    import week4_musemotion_spark.sources.quarantine as q

    p = str(tmp_path / "in.jsonl")
    _write(p, ['{"doc_id": 1, "text": "ok", "score": 2}'])
    _, bad = read_jsonl_quarantined(spark, p, _SCHEMA)
    none_bad = bad.filter("raw_line = 'no-match'")

    qdir = str(tmp_path / "dl_fresh")
    # simulate the racing writer: footers report rows at check time
    monkeypatch.setattr(q, "_parquet_dir_rows", lambda _path: 5)
    assert q.quarantine_to(none_bad, qdir) == 0
    assert os.path.isdir(qdir)  # NOT removed: someone else's rows
    monkeypatch.undo()

    # and without a racer the schema-only debris still gets cleaned
    qdir2 = str(tmp_path / "dl_fresh2")
    assert q.quarantine_to(none_bad, qdir2) == 0
    assert not os.path.isdir(qdir2)


def test_parquet_dir_rows_footer_check(spark, tmp_path):
    import week4_musemotion_spark.sources.quarantine as q

    d = str(tmp_path / "dirq")
    assert q._parquet_dir_rows(d) == 0  # absent dir
    spark.createDataFrame([(1,), (2,)], "x long").coalesce(1).write.parquet(d)
    assert q._parquet_dir_rows(d) == 2
    # torn/foreign part file counts as occupied
    with open(os.path.join(d, "part-torn.parquet"), "w") as fh:
        fh.write("not a parquet file")
    assert q._parquet_dir_rows(d) >= 1
