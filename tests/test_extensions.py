"""Extension-operator tests: dedup, similarity, text, multimodal."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_minhash_equals_exact_jaccard(spark):
    """LSH + verification must reproduce the exact near-dup pair set."""
    from week4_musemotion_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs

    exact = {(r.doc_a, r.doc_b, r.jaccard_e4) for r in jaccard_pairs(_docs(spark), 0.8).collect()}
    lsh = {(r.doc_a, r.doc_b, r.jaccard_e4) for r in minhash_lsh_pairs(_docs(spark), 0.8).collect()}
    assert exact, "corpus should contain planted near-dups"
    assert lsh == exact


def test_simhash_near_dups_have_small_hamming(spark):
    """Near-dup pairs (by Jaccard) must land at small SimHash Hamming
    distance; random pairs at large distance on average."""
    from week4_musemotion_spark.operators.dedup import jaccard_pairs, simhash_signatures

    sig = {r.doc_id: r.simhash for r in simhash_signatures(_docs(spark)).collect()}
    pairs = [(r.doc_a, r.doc_b) for r in jaccard_pairs(_docs(spark), 0.8).collect()]
    assert pairs

    def ham(a, b):
        return bin(sig[a] ^ sig[b]).count("1")

    near = [ham(a, b) for a, b in pairs]
    ids = sorted(sig)[:40]
    rand = [ham(a, b) for a in ids for b in ids if a < b and (a, b) not in set(pairs)]
    # the synthetic corpus shares a tiny vocabulary, so distinct-token
    # SimHash separates weakly — require a clear mean gap, not a split
    assert sum(near) / len(near) < sum(rand) / len(rand) - 1


def test_exact_dedup_groups(spark):
    from week4_musemotion_spark.operators.dedup import exact_dedup_groups

    docs = _docs(spark)
    # duplicate the corpus with shifted ids: every group must collapse to 2
    dup = docs.withColumn("doc_id", F.col("doc_id") + 100_000)
    groups = exact_dedup_groups(docs.unionByName(dup)).collect()
    assert len(groups) == docs.count()
    assert all(g.dup_cnt == 2 for g in groups)
    assert all(g.keep_id < 100_000 for g in groups)


def test_knn_brute_force_ranks(spark):
    from week4_musemotion_spark.operators.similarity import knn_brute_force

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = knn_brute_force(emb, emb.filter(F.col("vec_id") < 3), k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4]
        sims = [r.cosine_e6 for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != r.query_id for r in rows)


def test_knn_lsh_subset_of_exact_topk_pool(spark):
    """LSH neighbors must be genuine corpus vectors ranked by true
    cosine (rerank is exact), even if recall is partial."""
    from week4_musemotion_spark.operators.similarity import knn_lsh

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = knn_lsh(emb, emb.filter(F.col("vec_id") < 5), k=3).collect()
    assert got, "buckets should produce at least some candidates"
    for r in got:
        assert 1 <= r.rank <= 3
        assert -1_000_000 <= r.cosine_e6 <= 1_000_000


def test_multimodal_meta_plumbing(spark):
    from week4_musemotion_spark.operators.multimodal import extract_media_meta

    docs = _docs(spark)
    meta = extract_media_meta(docs)
    assert meta.columns == ["doc_id", "n_bytes", "width", "height", "format"]
    rows = meta.collect()
    assert len(rows) == docs.count()
    n_chars = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    for r in rows:
        assert r.n_bytes == n_chars[r.doc_id]  # ascii corpus: bytes == chars
        assert 64 <= r.width < 1024 and 64 <= r.height < 1024
        assert r.format in ("png", "jpeg")


def test_decode_media_is_gated():
    import pytest

    from week4_musemotion_spark.operators.multimodal import decode_media

    pytest.importorskip  # documentation: no imaging lib here
    try:
        decode_media(b"\x89PNG")
    except NotImplementedError as e:
        assert "imaging" in str(e)
    else:  # pragma: no cover - only if Pillow is installed
        pass


def test_connected_components_chain_and_triangle(spark):
    from week4_musemotion_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain: one component, min 1
         (10, 11), (11, 12), (10, 12),  # triangle: min 10
         (20, 21)],                     # pair: min 20
        ["doc_a", "doc_b"],
    )
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_transitive(spark):
    """A~B and B~C must land in ONE cluster even without an A~C edge."""
    from week4_musemotion_spark.operators.graph import dedup_clusters

    pairs = spark.createDataFrame([(5, 9), (9, 2)], ["doc_a", "doc_b"])
    got = {r.doc_id: r.keep_id for r in dedup_clusters(pairs).collect()}
    assert got == {2: 2, 5: 2, 9: 2}


def test_frame_sample_stride_and_fingerprints(spark):
    import hashlib

    from week4_musemotion_spark.operators.multimodal import sample_frames
    from week4_musemotion_spark.sources.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    out = sample_frames(d).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    n_docs = d.count()
    assert len(per_doc) == n_docs  # every video yields frames (>= 8 exist)
    # stride-4 sampling: indices are exactly 0,4,8,... below n_frames
    for rows in per_doc.values():
        nf = rows[0].n_frames
        assert 8 <= nf <= 63
        assert sorted(r.frame_idx for r in rows) == list(range(0, nf, 4))
    # fingerprint replays the documented stub for one known row
    row = min(out, key=lambda r: (r.doc_id, r.frame_idx))
    text = d.filter(f"doc_id = {row.doc_id}").collect()[0].text
    b = text.encode()
    exp = int(hashlib.md5(b"frame:" + b + b":" + str(row.frame_idx).encode()).hexdigest()[:15], 16)
    assert row.frame_fp == exp


def test_thumbnail_stub_binary_roundtrip(spark):
    from pyspark.sql import types as T

    from week4_musemotion_spark.operators.multimodal import thumbnail_stub
    from week4_musemotion_spark.sources.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    out = thumbnail_stub(d)
    assert isinstance(out.schema["thumb"].dataType, T.BinaryType)
    rows = out.collect()
    assert len(rows) == d.count()
    assert all(r.thumb_bytes == 16 and len(bytes(r.thumb)) == 16 for r in rows)
    # deterministic across runs
    again = {r.doc_id: bytes(r.thumb) for r in thumbnail_stub(d).collect()}
    assert all(bytes(r.thumb) == again[r.doc_id] for r in rows)


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 120-node chain converges within the default iteration cap —
    only possible because pointer jumping collapses path length
    exponentially (plain min-propagation would need 120 rounds)."""
    from week4_musemotion_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], ["doc_a", "doc_b"]
    )
    got = connected_components(edges).collect()
    assert len(got) == 121
    assert all(r.comp == 0 for r in got)


def test_star_contraction_equals_propagation(spark):
    """Large-star/small-star contraction must produce the same
    (node, comp) labeling as pointer-jumped propagation, in a
    comparable number of rounds, on adversarial shapes: a long chain,
    a skewed hub-with-chains graph, and disjoint cliquelets."""
    from week4_musemotion_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    skew = []
    nid = 1
    for _ in range(10):  # hub 0, 10 chains of length 6
        prev = 0
        for _ in range(6):
            skew.append((prev, nid))
            prev = nid
            nid += 1
    fixtures = {
        "chain": [(i, i + 1) for i in range(64)],
        "hub": skew,
        "cliquelets": [(b * 10, b * 10 + j + 1) for b in range(8) for j in range(3)],
    }
    for name, rows in fixtures.items():
        edges = spark.createDataFrame(rows, ["doc_a", "doc_b"])
        s_jump, s_star = {}, {}
        jump = sorted(map(tuple, connected_components(edges, stats=s_jump).collect()))
        star = sorted(map(tuple, connected_components_star(edges, stats=s_star).collect()))
        assert star == jump, name
        # measured: identical round counts on these shapes (both are
        # O(log diameter)); fail if star ever regresses past jump+1
        assert s_star["rounds"] <= s_jump["rounds"] + 1, (name, s_star, s_jump)


def test_embed_media_feeds_similarity_operators(spark):
    """The stub encoder's output must plug into the similarity
    operators unchanged: fixed dim, float64, exact thousandths in
    [-1, 1], deterministic across calls and partitionings."""
    from week4_musemotion_spark.operators.multimodal import EMBED_DIM, embed_media
    from week4_musemotion_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    emb = embed_media(docs)
    rows = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    assert rows and all(len(v) == EMBED_DIM for v in rows.values())
    for v in rows.values():
        for x in v:
            assert -1.0 <= x <= 1.0
            assert abs(x * 1000 - round(x * 1000)) < 1e-9  # exact thousandths
    again = {r["doc_id"]: r["embedding"] for r in embed_media(docs.repartition(7)).collect()}
    assert rows == again


def test_multimodal_ops_drop_null_payload_rows(spark, tmp_path):
    """Testdata regeneration guard: a NULL text row must be dropped by
    attach_binary, not crash the Arrow stubs with bytes(None)."""
    spark.createDataFrame(
        [(1, "hello world", "en", "web", 11), (2, None, "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    from week4_musemotion_spark.queries import REGISTRY

    for name in ("q_multimodal_meta", "q_frame_sample", "q_media_knn"):
        rows = REGISTRY[name].builder(spark, str(tmp_path)).collect()
        assert all(r["doc_id"] != 2 for r in rows), name
    meta = REGISTRY["q_multimodal_meta"].builder(spark, str(tmp_path)).collect()
    assert [r["doc_id"] for r in meta] == [1]
