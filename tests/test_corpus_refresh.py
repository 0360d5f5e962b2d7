"""End-to-end corpus refresh (operators/refresh.py): dedup + CDC +
versioned snapshots composed, with the audit numbers pinned."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_refresh_lifecycle(spark, tmp_path):
    from week4_musemotion_spark.operators.refresh import corpus_refresh
    from week4_musemotion_spark.operators.versioned import list_versions, read_version

    base = str(tmp_path / "corpus")

    # v1: bootstrap
    r1 = corpus_refresh(spark, base, _docs(spark, [
        (1, "alpha doc", "en", "web", 9),
        (2, "beta doc", "en", "web", 8),
    ]))
    assert r1 == {"batch_rows": 2, "duplicate_rows": 0, "deleted_rows": 0,
                  "version": 1, "corpus_rows": 2}

    # v2: one exact re-crawl (dropped), one new doc, one revision of
    # doc 2 (different text -> passes dedup -> CDC update)
    r2 = corpus_refresh(spark, base, _docs(spark, [
        (3, "alpha doc", "en", "web", 9),     # same content as doc 1 -> dup
        (4, "gamma doc", "en", "web", 9),
        (2, "beta doc v2", "en", "web", 11),
    ]))
    assert r2["duplicate_rows"] == 1
    assert r2["version"] == 2
    assert r2["corpus_rows"] == 3  # {1, 2(updated), 4}
    texts = {r["doc_id"]: r["text"] for r in read_version(spark, base).collect()}
    assert texts == {1: "alpha doc", 2: "beta doc v2", 4: "gamma doc"}

    # v3: takedown of doc 1 + upsert-and-delete same key in one batch
    # (delete wins deterministically)
    r3 = corpus_refresh(
        spark, base,
        _docs(spark, [(4, "gamma doc revised", "en", "web", 17)]),
        deletes=spark.createDataFrame([(1,), (4,)], "doc_id long"),
    )
    assert r3["deleted_rows"] == 2
    assert {r["doc_id"] for r in read_version(spark, base).collect()} == {2}

    # time travel: every prior state still readable
    assert list_versions(base) == [1, 2, 3]
    assert read_version(spark, base, 1).count() == 2
    assert read_version(spark, base, 2).count() == 3
