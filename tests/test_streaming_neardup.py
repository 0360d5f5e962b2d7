"""Streaming near-dup ingest loop (streaming/neardup.py): micro-batch
arrivals are gated against the growing LSH index — near-dups of the
seed corpus OR of an earlier batch land in quarantine, clean docs
join the corpus and become the reference for later batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_neardup_gate_quarantines_cross_batch_dups(spark, tmp_path):
    from week4_musemotion_spark.operators.dedup import minhash_lsh_join
    from week4_musemotion_spark.operators.lsh_index import build_index
    from week4_musemotion_spark.sources.tables import load_table
    from week4_musemotion_spark.streaming.neardup import stream_neardup_ingest

    d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    seed = d.filter(F.col("doc_id") % 10 > 1)
    arrivals = d.filter(F.col("doc_id") % 10 <= 1)

    # ground truth: which arrivals near-dup the seed corpus (batch
    # boundaries only refine this further)
    vs_seed = {
        r["doc_a"] for r in minhash_lsh_join(arrivals, seed, threshold=0.8).collect()
    }
    assert vs_seed, "fixture must plant at least one cross-split near-dup"

    idx = str(tmp_path / "idx")
    build_index(seed, idx)
    src = tmp_path / "arrivals"
    src.mkdir()

    # two FLAT files -> maxFilesPerTrigger=1 gives two sequential
    # batches (the file source does not recurse into the directories
    # df.write.parquet produces, so lift the part-file out)
    def _flat_file(df, name):
        staging = tmp_path / f"_stage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        part.rename(src / f"{name}.parquet")

    _flat_file(arrivals.filter(F.col("doc_id") % 10 == 0), "b0")
    _flat_file(arrivals.filter(F.col("doc_id") % 10 == 1), "b1")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = stream_neardup_ingest(
        stream,
        index_path=idx,
        corpus_path=str(tmp_path / "corpus"),
        quarantine_path=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    quarantined = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "quarantine" / "docs")).collect()
    }
    clean = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus" / "docs")).collect()
    }
    arrived = {r["doc_id"] for r in arrivals.collect()}
    # partition: every arrival lands exactly once, on exactly one side
    assert quarantined | clean == arrived
    assert quarantined & clean == set()
    # everything that near-dups the SEED is quarantined; extra
    # quarantines can only come from dups against an earlier batch
    assert vs_seed <= quarantined
    extra = quarantined - vs_seed
    if extra:
        corpus_after_b0 = seed.unionByName(
            arrivals.filter(F.col("doc_id") % 10 == 0).join(
                spark.createDataFrame([(i,) for i in quarantined], "doc_id long"),
                "doc_id",
                "left_anti",
            )
        )
        b1 = arrivals.filter(F.col("doc_id") % 10 == 1)
        vs_grown = {
            r["doc_a"] for r in minhash_lsh_join(b1, corpus_after_b0, threshold=0.8).collect()
        }
        assert extra <= vs_grown
    # the index grew: band rows exist for clean docs
    bands = spark.read.parquet(str(tmp_path / "idx" / "bands"))
    assert bands.filter(F.col("_id").isin(list(clean)[:5])).count() > 0
