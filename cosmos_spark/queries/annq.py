"""Embedding similarity: brute-force / LSH-bucketed / IVF cosine top-k, embedding norms and dup pairs, IVF refinement, Word2Vec representation learning."""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ._shared import (  # noqa: F401
    _t,
)

def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: the ANN baseline. Query = vector 0; rounded
    before ranking so the cross-engine float comparison is stable."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q"))
    joined = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qvec))
    dot = "aggregate(zip_with(cast(embedding as array<double>), cast(q as array<double>), (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
    na = "sqrt(aggregate(cast(embedding as array<double>), 0.0D, (acc, v) -> acc + v * v))"
    nb = "sqrt(aggregate(cast(q as array<double>), 0.0D, (acc, v) -> acc + v * v))"
    scored = joined.select(
        "vec_id",
        F.expr(f"round(({dot}) / (({na}) * ({nb})), 4)").alias("cos_sim"))
    # distributed top-k: orderBy+limit plans as TakeOrderedAndProject
    # (per-partition take, driver merge of k rows) — no global-window
    # single-reducer Exchange ever forms; rn is a window over just k rows.
    top = scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        top.withColumn("rn", F.row_number().over(w))
        .select("vec_id", "cos_sim", "rn")
    )


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))), 4)
           AS cos_sim
  FROM embeddings, q WHERE vec_id <> 0)
SELECT vec_id, cos_sim, rn FROM (
  SELECT vec_id, cos_sim,
         row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored) WHERE rn <= 10
"""


def q_embedding_norms(spark, sf_dir):
    """Array math (F8 analog): per-vector L2 norm + dimension, grouped by
    label — the embedding-stat scan an ANN index build starts with."""
    emb = _t(spark, sf_dir, "embeddings")
    norm = ("sqrt(aggregate(cast(embedding as array<double>), 0.0D,"
            " (acc, v) -> acc + v * v))")
    return (
        emb.select("label", F.expr(f"round({norm}, 4)").alias("l2"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             (F.sum(F.col("l2").cast("decimal(18,4)")).cast("double")
              / F.count(F.lit(1))).alias("avg_l2"))
    )


SQL_EMBEDDING_NORMS = """
SELECT label, count(*) AS n_vecs,
       CAST(sum(CAST(l2 AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_l2
FROM (SELECT label,
             round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))), 4) AS l2
      FROM embeddings)
GROUP BY label
"""

def q_lsh_bucket(spark, sf_dir):
    """Random-hyperplane LSH bucket ids over the embeddings table — the
    ANN index build, cross-checked bit-for-bit (hyperplanes derived from
    md5, no RNG)."""
    from ..operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.rhp_lsh_buckets(emb, n_planes=8, dim=64)


SQL_LSH_BUCKET = r"""
WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) - 1 AS d
           FROM embeddings),
proj AS (SELECT vec_id, p,
                sum(x * (('0x'||substr(md5(p::VARCHAR||'|'||d::VARCHAR),1,4))::BIGINT
                         - 32767.5)) AS dot
         FROM e, range(8) r(p) GROUP BY vec_id, p)
SELECT vec_id,
       CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS INT)
         AS bucket
FROM proj GROUP BY vec_id
"""

def q_embedding_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs: RHP-LSH bucket -> bounded in-bucket
    pairing -> cosine threshold (the embedding twin of MinHash LSH),
    cross-checked pair-for-pair."""
    from ..operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_cosine_dup_pairs(
        emb, threshold=0.3, n_planes=6, dim=64, max_bucket=200)
    return pairs.select(
        F.col("id_a").alias("vec_a"), F.col("id_b").alias("vec_b"),
        F.round("cos_sim", 4).alias("cos_sim"))


SQL_EMBEDDING_DUP_PAIRS = r"""
WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) - 1 AS d
           FROM embeddings),
proj AS (SELECT vec_id, p,
                sum(x * (('0x'||substr(md5(p::VARCHAR||'|'||d::VARCHAR),1,4))::BIGINT
                         - 32767.5)) AS dot
         FROM e, range(6) r(p) GROUP BY vec_id, p),
b AS (SELECT vec_id,
             CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS INT)
               AS bucket
      FROM proj GROUP BY vec_id),
sized AS (SELECT bucket, count(*) AS c FROM b GROUP BY bucket)
SELECT a.vec_id AS vec_a, bb.vec_id AS vec_b,
       round(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))),
             4) AS cos_sim
FROM b a
JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
JOIN sized s ON s.bucket = a.bucket AND s.c > 1 AND s.c <= 200
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = bb.vec_id
WHERE list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))))
      >= 0.3
"""

def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate top-k (the ANN scale path): queries =
    vectors 0-2, k = 5, candidates pruned to the query's RHP bucket —
    cross-checked bucket-for-bucket and score-for-score."""
    from ..operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = similarity.cosine_topk_lsh(emb, qs, k=5, n_planes=8, dim=64,
                                     round_to=4)
    return out.select("q_id", "vec_id", "cos_sim", "rn")


SQL_ANN_LSH_TOPK = r"""
WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) - 1 AS d
           FROM embeddings),
proj AS (SELECT vec_id, p,
                sum(x * (('0x'||substr(md5(p::VARCHAR||'|'||d::VARCHAR),1,4))::BIGINT
                         - 32767.5)) AS dot
         FROM e, range(8) r(p) GROUP BY vec_id, p),
b AS (SELECT vec_id,
             CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)
                  AS INT) AS bucket
      FROM proj GROUP BY vec_id),
q AS (SELECT b.vec_id AS q_id, emb.embedding AS qv, b.bucket
      FROM b JOIN embeddings emb ON emb.vec_id = b.vec_id
      WHERE b.vec_id < 3),
s AS (SELECT q.q_id, c.vec_id,
             round(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                    CAST(q.qv AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]),
                                              CAST(q.qv AS DOUBLE[])))), 4)
               AS cos_sim
      FROM q
      JOIN b cb ON cb.bucket = q.bucket
      JOIN embeddings c ON c.vec_id = cb.vec_id
      WHERE c.vec_id <> q.q_id)
SELECT q_id, vec_id, cos_sim, CAST(rn AS INT) AS rn FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM s) WHERE rn <= 5
"""

def word_vectors(spark, sf_dir, num_partitions: int):
    """A7 (`representation_learning/compute_word_vecs.py:4-11`): corpus
    word-vector training via pyspark.ml Word2Vec (skipgram analog) over
    the token stream. ``num_partitions`` is the at-scale knob: Word2Vec
    shards skip-gram batches per partition and merges hogwild-style, so
    >1 trades bit-determinism for linear training parallelism (the same
    trade the reference's fastText training makes). The invariants that
    survive any partitioning — full vocabulary coverage, vector arity,
    positive norms — are pytest-asserted at numPartitions=4."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.expr(r"regexp_extract_all(lower(text), '\\S+', 0)").alias("words"))
    w2v = Word2Vec(vectorSize=16, minCount=1, seed=42, maxIter=1,
                   numPartitions=num_partitions,
                   inputCol="words", outputCol="vec")
    model = w2v.fit(toks)
    vecs = model.getVectors().withColumn("varr",
                                         vector_to_array(F.col("vector")))
    return vecs.select(
        "word",
        F.expr("round(aggregate(varr, 0.0D, (a, v) -> a + v * v), 6)")
        .alias("sq_norm"))


def q_word_vectors(spark, sf_dir):
    """Driver surface for A7: the fitted Word2Vec model's VOCABULARY —
    every word that received a vector, its corpus frequency, and the
    vector arity. With minCount=1 the vocabulary is exactly the
    distinct lowercased whitespace tokens, so this is value-exact
    against a pure-SQL oracle (an inner join against corpus counts:
    a dropped vocab word shows up as a missing row). The trained
    vector VALUES are SGD output and stay pytest-pinned via
    :func:`word_vectors` (positive norms, partition-independent
    vocabulary at numPartitions=4)."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.expr(r"regexp_extract_all(lower(text), '\\S+', 0)").alias("words"))
    w2v = Word2Vec(vectorSize=16, minCount=1, seed=42, maxIter=1,
                   numPartitions=1, inputCol="words", outputCol="vec")
    vocab = (w2v.fit(toks).getVectors()
             .select("word",
                     F.size(vector_to_array(F.col("vector"))).alias("dim")))
    freqs = (toks.select(F.explode("words").alias("word"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    return vocab.join(freqs, "word").select("word", "freq", "dim")


SQL_WORD_VECTORS = r"""
SELECT word, CAST(count(*) AS BIGINT) AS freq, 16 AS dim FROM (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents)
GROUP BY word
"""

def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k (the other ANN scale path beside LSH):
    deterministic coarse centroids -> per-vector nearest-centroid index ->
    probe the query's 2 nearest lists -> exact rerank, k=5, queries =
    vectors 0-2 — assignment, probes, and scores all cross-checked."""
    from ..operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = similarity.cosine_topk_ivf(emb, qs, k=5, n_centroids=8,
                                     n_probe=2)
    return out.select("q_id", "vec_id", "cos_sim", "rn")


SQL_ANN_IVF_TOPK = r"""
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings
           ORDER BY md5('ivf-seed|' || CAST(vec_id AS VARCHAR)), vec_id
           LIMIT 8),
av AS (SELECT e.vec_id, c.cid,
              round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             CAST(e.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(c.cv, c.cv))), 6) AS s
       FROM embeddings e, c),
assign AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY s DESC, cid) AS rn
             FROM av) WHERE rn = 1),
qv AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
       FROM embeddings WHERE vec_id < 3),
qs AS (SELECT q.q_id, q.qe, c.cid,
              round(list_dot_product(q.qe, c.cv)
                    / (sqrt(list_dot_product(q.qe, q.qe))
                       * sqrt(list_dot_product(c.cv, c.cv))), 6) AS s
       FROM qv q, c),
probes AS (SELECT q_id, qe, cid FROM (
             SELECT q_id, qe, cid,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY s DESC, cid) AS pr
             FROM qs) WHERE pr <= 2),
sc AS (SELECT p.q_id, e.vec_id,
              round(list_dot_product(CAST(e.embedding AS DOUBLE[]), p.qe)
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             CAST(e.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(p.qe, p.qe))), 4) AS cos_sim
       FROM probes p
       JOIN assign a ON a.cid = p.cid
       JOIN embeddings e ON e.vec_id = a.vec_id
       WHERE e.vec_id <> p.q_id)
SELECT q_id, vec_id, cos_sim, CAST(rn AS INT) AS rn FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM sc) WHERE rn <= 5
"""

def q_ivf_refine(spark, sf_dir):
    """IVF k-means refinement (one Lloyd iteration over the coarse lists):
    per-centroid per-dimension means, decimal-exact across engines."""
    from ..operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids(emb, 8)
    assign = similarity.ivf_assign(emb, cents)
    return similarity.ivf_refine(emb, assign)


SQL_IVF_REFINE = r"""
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings
           ORDER BY md5('ivf-seed|' || CAST(vec_id AS VARCHAR)), vec_id
           LIMIT 8),
av AS (SELECT e.vec_id, c.cid,
              round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             CAST(e.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(c.cv, c.cv))), 6) AS s
       FROM embeddings e, c),
assign AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY s DESC, cid) AS rn
             FROM av) WHERE rn = 1),
j AS (SELECT a.cid AS centroid_id, e.embedding
      FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
d AS (SELECT centroid_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM j)
SELECT centroid_id, dim,
       round(CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6)
         AS val
FROM d GROUP BY centroid_id, dim
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup capstone (operators/similarity.py
    semantic_dedup): one derandomized Lloyd round over md5-seeded
    centroids clusters the embedding space, then every vector with a
    lower-id near-duplicate (cosine >= 0.45, rounded) in its own cluster
    is dropped. The oracle re-derives the full (vec_id, cluster_id,
    kept) relation — clustering AND the greedy dedup policy. (The
    oracle carries no ``max_cluster`` arm: at sf<=0.1 the largest
    cluster is ~hundreds of members, orders of magnitude under the
    operator's 20k cap, so capped and uncapped semantics coincide on
    every driver input; the cap itself is pinned by the oversized-
    cluster pytest.)"""
    from ..operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, n_clusters=16, iterations=1,
                                     threshold=0.45)


SQL_SEMANTIC_DEDUP = r"""
WITH c AS MATERIALIZED (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
  ORDER BY md5('ivf-seed|' || CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 16),
e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
av AS MATERIALIZED (
  SELECT e.vec_id, c.cid,
         round(list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(c.cv, c.cv))), 6) AS s
  FROM e, c),
a1 AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cid) AS rn
    FROM av) WHERE rn = 1),
d AS MATERIALIZED (
  SELECT a1.cid, CAST(generate_subscripts(e.v, 1) - 1 AS INT) AS dim,
         CAST(unnest(e.v) AS DOUBLE) AS x
  FROM e JOIN a1 USING (vec_id)),
m AS MATERIALIZED (
  SELECT cid, dim,
         round(CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE)
               / count(*), 6) AS val
  FROM d GROUP BY cid, dim),
c2 AS MATERIALIZED (
  SELECT cid, list(val ORDER BY dim) AS cv FROM m GROUP BY cid),
av2 AS MATERIALIZED (
  SELECT e.vec_id, c2.cid,
         round(list_dot_product(e.v, c2.cv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(c2.cv, c2.cv))), 6) AS s
  FROM e, c2),
a2 AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cid) AS rn
    FROM av2) WHERE rn = 1),
p AS MATERIALIZED (
  SELECT eb.vec_id AS ib
  FROM e ea JOIN a2 aa ON aa.vec_id = ea.vec_id
  JOIN a2 ab ON ab.cid = aa.cid
  JOIN e eb ON eb.vec_id = ab.vec_id AND ea.vec_id < eb.vec_id
  WHERE round(list_dot_product(ea.v, eb.v)
              / (sqrt(list_dot_product(ea.v, ea.v))
                 * sqrt(list_dot_product(eb.v, eb.v))), 6) >= 0.45)
SELECT a2.vec_id, a2.cid AS cluster_id,
       a2.vec_id NOT IN (SELECT ib FROM p) AS kept
FROM a2
"""
