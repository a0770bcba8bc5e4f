"""Operator tests: dedup family, similarity search, greedy association,
iterative CC, multimodal plumbing."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from cosmos_spark.operators import assoc, dedup, graph, multimodal, similarity

BASE = "the quick brown fox jumps over the lazy dog again and again"
NEAR = "the quick brown cat jumps over the lazy dog again and again"
OTHER = "completely different words nothing shared here at all whatsoever ok"


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [BASE, NEAR, BASE, OTHER],
    })
    return spark.createDataFrame(pdf).cache()


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, "doc_id", "text").toPandas()
    grp = out[out["n_dups"] == 2]
    assert len(grp) == 1
    assert grp.iloc[0]["keep_id"] == 0
    assert list(grp.iloc[0]["dup_ids"]) == [0, 2]


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text").toPandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 2) in got            # identical -> all bands collide
    assert not any(3 in p for p in got)  # OTHER shares nothing


def test_ngram_jaccard_verification(spark, docs):
    cands = spark.createDataFrame(
        pd.DataFrame({"id_a": [0, 0, 0], "id_b": [1, 2, 3]}))
    out = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", cands,
                                    threshold=0.5).toPandas()
    j = dict(zip(zip(out["id_a"], out["id_b"]), out["jaccard"]))
    assert j[(0, 2)] == 1.0
    assert 0.5 <= j[(0, 1)] < 1.0
    assert (0, 3) not in j


def test_simhash_signatures_and_candidates(docs):
    sigs = dedup.simhash_signatures(docs, "doc_id", "text").toPandas()
    s = dict(zip(sigs["id"], sigs["simhash"]))
    assert s[0] == s[2]
    # near-dup within small hamming distance of the base
    ham = bin((s[0] ^ s[1]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham <= 16
    cands = dedup.simhash_candidate_pairs(docs, "doc_id", "text").toPandas()
    got = set(zip(cands["id_a"], cands["id_b"]))
    assert (0, 2) in got


def test_hamming64(spark):
    df = spark.range(1).select(
        dedup.hamming64(F.lit(0b1011).cast("long"),
                        F.lit(0b0010).cast("long")).alias("h"))
    assert df.collect()[0]["h"] == 2


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8).astype("float32")
    vecs[5] = vecs[0] * 1.5          # same direction as 0 -> cosine 1
    vecs[7] = vecs[0] + 0.05 * rng.randn(8).astype("float32")  # near 0
    pdf = pd.DataFrame({"vec_id": range(20),
                        "embedding": [list(map(float, v)) for v in vecs]})
    return spark.createDataFrame(pdf).cache()


def test_cosine_topk_exact(emb):
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = similarity.cosine_topk(emb, q, k=3).toPandas()
    top = out.sort_values("rn")
    assert list(top["vec_id"])[:2] == [5, 7]
    assert top.iloc[0]["cos_sim"] == pytest.approx(1.0, abs=1e-4)


def test_cosine_topk_lsh_agrees_on_top1(emb):
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = similarity.cosine_topk_lsh(emb, q, k=3, n_planes=4,
                                     dim=8).toPandas()
    # colinear vector must share every hyperplane sign -> always in bucket
    assert 5 in set(out["vec_id"])
    assert out.sort_values("rn").iloc[0]["vec_id"] == 5


def test_embedding_cosine_dup_pairs(emb):
    out = similarity.embedding_cosine_dup_pairs(
        emb, threshold=0.95, n_planes=4, dim=8).toPandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert (0, 5) in got


def test_iterative_cc(spark):
    nodes = spark.createDataFrame(
        pd.DataFrame({"node": ["a", "b", "c", "d", "e"]}))
    edges = spark.createDataFrame(
        pd.DataFrame({"src": ["a", "b", "d"], "dst": ["b", "c", "e"]}))
    out = graph.connected_components(nodes, edges).toPandas()
    comp = dict(zip(out["node"], out["component"]))
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["d"] == comp["e"] == "d"


def test_greedy_association_semantics(spark):
    """Two comments nearest the same function: the first (in line order)
    takes it, the second gets the next-nearest — pool-pop semantics a
    plain window join can't produce."""
    segs = pd.DataFrame([
        # kind, line_start
        ("c1", "comment", 10),
        ("c2", "comment", 12),
        ("f1", "function", 11),
        ("f2", "function", 30),
    ], columns=["seg_id", "kind", "line_start"])
    segs["repo"] = "r"
    segs["path"] = "p"
    sdf = spark.createDataFrame(segs)
    out = assoc.associate_comments(sdf).toPandas()
    pairs = dict(zip(out["comment_seg_id"], out["object_seg_id"]))
    assert pairs["c1"] == "f1"       # c1 first, takes nearest
    assert pairs["c2"] == "f2"       # f1 already consumed
    # kernel parity with direct pandas call (shared-kernel oracle)
    direct = assoc.associate_kernel(segs)
    dp = dict(zip(direct["comment_seg_id"], direct["object_seg_id"]))
    assert dp == {k: v for k, v in pairs.items() if k is not None}


def test_association_leftovers_and_empty_pool(spark):
    segs = pd.DataFrame([
        ("c1", "comment", 1),
        ("f1", "function", 5),
        ("f2", "function", 9),
    ], columns=["seg_id", "kind", "line_start"])
    segs["repo"] = "r"
    segs["path"] = "p"
    out = assoc.associate_comments(spark.createDataFrame(segs)).toPandas()
    # unmatched object emitted with null caption (aggregate.py:94-111)
    leftovers = out[out["comment_seg_id"].isna()]
    assert list(leftovers["object_seg_id"]) == ["f2"]


def test_multimodal_plumbing(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = multimodal.media_from_documents(docs.limit(20))
    feats = multimodal.extract_media_features(media, fake=True).toPandas()
    assert len(feats) == 20
    assert (feats["n_bytes"] >= 0).all()
    assert feats["payload_sha256"].str.len().eq(64).all()
    assert feats["feature"].map(len).eq(8).all()
    assert feats["width"].between(64, 127).all()


def test_multimodal_real_decode_raises():
    multimodal._DECODER_SINGLETON.clear()
    with pytest.raises(NotImplementedError):
        multimodal._get_decoder(fake=False)
    multimodal._DECODER_SINGLETON.clear()
