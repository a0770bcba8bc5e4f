"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: the correctness baseline.
  One pass over the corpus per query batch; queries are broadcast (they're
  the small side by definition), so the scan stays shuffle-free until the
  final global top-k, which aggregates per-partition heaps.
- :func:`rhp_lsh_buckets` / :func:`cosine_topk_lsh` — the scale path:
  random-hyperplane LSH with hyperplanes derived deterministically from
  md5 (no RNG state to ship), so only same-bucket candidates are scored.
  At 10^12 rows the bucket table is the pre-built index (write it once,
  partition by bucket, prune at query time).

All dot products run JVM-side (``zip_with`` + ``aggregate`` over
array<double>) — no Python in the hot path.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Distributed top-k per q_id over a (q_id, vec_id, cos_sim) frame.

    Stage 1 is a *narrow* per-partition prune (``mapInPandas`` keeps at most
    k rows per q_id per input partition — the per-partition heap), so the
    only shuffle is the final window over the pruned survivors:
    <= k * n_partitions rows per query instead of every scored row funneling
    through one reducer. Tie-break (cos_sim desc, vec_id asc) is identical
    in both stages, so the result is exactly the global window's.
    """
    schema = scored.schema

    def prune(it):
        acc: pd.DataFrame | None = None
        for pdf in it:
            cur = pdf if acc is None else pd.concat([acc, pdf],
                                                    ignore_index=True)
            cur = cur.sort_values(["q_id", "cos_sim", "vec_id"],
                                  ascending=[True, False, True])
            acc = cur.groupby("q_id", sort=False).head(k)
        if acc is not None and len(acc):
            yield acc

    pruned = scored.mapInPandas(prune, schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


_DOT = ("aggregate(zip_with(cast({a} as array<double>), "
        "cast({b} as array<double>), (x, y) -> x * y), 0.0D, "
        "(acc, v) -> acc + v)")
_NORM = ("sqrt(aggregate(cast({a} as array<double>), 0.0D, "
         "(acc, v) -> acc + v * v))")


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", q_vec_col: str = "q_vec",
                round_to: int | None = 6) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    (q_id, vec_id, cos_sim, rn<=k). ``queries`` is broadcast; ranking is a
    per-partition top-k prune followed by a small merge window (ties broken
    by id for determinism) — no single-reducer global window.
    """
    dot = _DOT.format(a=vec_col, b=q_vec_col)
    na = _NORM.format(a=vec_col)
    nb = _NORM.format(a=q_vec_col)
    sim = f"({dot}) / (({na}) * ({nb}))"
    if round_to is not None:
        sim = f"round({sim}, {round_to})"
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(q_id_col))
        .select(F.col(q_id_col).alias("q_id"),
                F.col(id_col).alias("vec_id"),
                F.expr(sim).alias("cos_sim"))
    )
    return _topk_per_query(scored, k)


def _plane_expr(vec_col: str, plane_idx: int, dim: int) -> str:
    """Deterministic pseudo-random hyperplane component: md5(plane|dim) hex
    nibble mapped to [-7.5 .. +7.5] (zero-mean). Sign of the dot product is
    one LSH bit."""
    comp = (f"transform(sequence(0, {dim - 1}), d -> "
            f"cast(conv(substring(md5(concat('{plane_idx}|', "
            f"cast(d as string))), 1, 4), 16, 10) as double) - 32767.5)")
    return (f"aggregate(zip_with(cast({vec_col} as array<double>), {comp}, "
            f"(x, p) -> x * p), 0.0D, (acc, v) -> acc + v)")


def rhp_lsh_buckets(emb: DataFrame, n_planes: int = 8,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    dim: int = 64) -> DataFrame:
    """(id, bucket): bucket = n_planes sign bits of deterministic random
    hyperplane projections. Row-local — this IS the index build."""
    bits = " + ".join(
        f"(case when ({_plane_expr(vec_col, p, dim)}) > 0 "
        f"then {1 << p} else 0 end)"
        for p in range(n_planes)
    )
    return emb.select(F.col(id_col).alias("vec_id"),
                      F.expr(f"cast({bits} as int)").alias("bucket"))


def cosine_topk_lsh(emb: DataFrame, queries: DataFrame, k: int = 10,
                    n_planes: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding", q_id_col: str = "q_id",
                    q_vec_col: str = "q_vec", dim: int = 64,
                    round_to: int | None = 6) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's LSH
    bucket. Recall < 1 by construction (that's the trade); at corpus scale
    this prunes the scan to ~1/2^n_planes of the rows."""
    b_emb = emb.join(rhp_lsh_buckets(emb, n_planes, id_col, vec_col, dim),
                     id_col)
    q_buckets = rhp_lsh_buckets(
        queries.select(F.col(q_id_col).alias("vec_id"),
                       F.col(q_vec_col).alias("embedding")),
        n_planes, "vec_id", "embedding", dim
    ).withColumnRenamed("vec_id", q_id_col)
    q = queries.join(q_buckets, q_id_col)

    dot = _DOT.format(a=vec_col, b=q_vec_col)
    na = _NORM.format(a=vec_col)
    nb = _NORM.format(a=q_vec_col)
    sim = f"({dot}) / (({na}) * ({nb}))"
    if round_to is not None:
        sim = f"round({sim}, {round_to})"
    scored = (
        b_emb.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col(q_id_col))
        .select(F.col(q_id_col).alias("q_id"),
                F.col(id_col).alias("vec_id"),
                F.expr(sim).alias("cos_sim"))
    )
    return _topk_per_query(scored, k)


def ivf_centroids(emb: DataFrame, n_centroids: int = 8,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Deterministic coarse quantizer seeds for the IVF index: the
    n_centroids vectors ranked first by ``md5('ivf-seed|' || id)`` — a
    derandomized uniform sample of the corpus (the k-means init step with
    the RNG replaced by a hash, so it is reproducible AND cross-engine
    replicable), unlike lowest-id seeding, which inherits whatever
    correlation ids carry (insertion order, shard, time). Plans as
    TakeOrderedAndProject — no single-reducer sort. Compose with
    :func:`ivf_refine` + :func:`ivf_assign` for Lloyd iterations on top
    of the seeds."""
    seed = F.md5(F.concat(F.lit("ivf-seed|"), F.col(id_col).cast("string")))
    return (emb.orderBy(seed, F.col(id_col)).limit(n_centroids)
            .select(F.col(id_col).alias("centroid_id"),
                    F.col(vec_col).alias("c_vec")))


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               round_to: int = 6) -> DataFrame:
    """(vec_id, centroid_id): nearest centroid by cosine — the IVF index
    build. Centroids broadcast; C dot products per row JVM-side; the
    argmax is a map-side-combinable max(struct) agg (ties -> smallest
    centroid id), so the only shuffle is one row per vector."""
    dot = _DOT.format(a=vec_col, b="c_vec")
    na = _NORM.format(a=vec_col)
    nb = _NORM.format(a="c_vec")
    sim = f"round(({dot}) / (({na}) * ({nb})), {round_to})"
    scored = (
        emb.crossJoin(F.broadcast(centroids))
        .select(F.col(id_col).alias("vec_id"), "centroid_id",
                F.expr(sim).alias("c_sim"))
    )
    best = (
        scored.groupBy("vec_id")
        .agg(F.max(F.struct(F.col("c_sim"),
                            (-F.col("centroid_id")).alias("neg"),
                            F.col("centroid_id").alias("cid"))).alias("b"))
        .select("vec_id", F.col("b.cid").alias("centroid_id"))
    )
    return best


def ivf_refine(emb: DataFrame, assign: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """One Lloyd (k-means) refinement iteration over the IVF assignment:
    (centroid_id, dim, val) where val = elementwise mean of the vectors in
    that coarse list. One equi-join + one groupBy with map-side partial
    aggregation — the shape iterates cheaply at any scale (re-assign with
    :func:`ivf_assign` against the refined centroids and repeat). Sums go
    through decimal so the cross-engine compare is exact, not
    float-association-dependent."""
    j = emb.join(assign.withColumnRenamed("vec_id", id_col), id_col)
    d = j.select(
        "centroid_id",
        F.posexplode(F.expr(f"cast({vec_col} as array<double>)"))
        .alias("dim", "x"))
    return (
        d.groupBy("centroid_id", "dim")
        .agg(F.round(
            F.sum(F.col("x").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1)), 6).alias("val"))
    )


def cosine_topk_ivf(emb: DataFrame, queries: DataFrame, k: int = 10,
                    n_centroids: int = 8, n_probe: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
                    round_to: int | None = 4) -> DataFrame:
    """IVF approximate top-k: score only vectors whose coarse list is
    among the query's ``n_probe`` nearest centroids. At corpus scale the
    assignment is the pre-built index (write once, partition by
    centroid_id, prune at query time) and the probe fraction bounds the
    scan at ~n_probe/n_centroids of the corpus."""
    cents = ivf_centroids(emb, n_centroids, id_col, vec_col)
    assign = ivf_assign(emb, cents, id_col, vec_col)

    qdot = _DOT.format(a=q_vec_col, b="c_vec")
    qna = _NORM.format(a=q_vec_col)
    qnb = _NORM.format(a="c_vec")
    qsim = f"round(({qdot}) / (({qna}) * ({qnb})), 6)"
    qprobe = (
        queries.crossJoin(F.broadcast(cents))
        .select(q_id_col, q_vec_col, "centroid_id",
                F.expr(qsim).alias("c_sim"))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("c_sim"),
                                             F.asc("centroid_id"))
    probes = (qprobe.withColumn("pr", F.row_number().over(w))
              .filter(F.col("pr") <= n_probe)
              .select(q_id_col, q_vec_col, "centroid_id"))

    cand = emb.join(assign.withColumnRenamed("vec_id", id_col), id_col)
    dot = _DOT.format(a=vec_col, b=q_vec_col)
    na = _NORM.format(a=vec_col)
    nb = _NORM.format(a=q_vec_col)
    sim = f"({dot}) / (({na}) * ({nb}))"
    if round_to is not None:
        sim = f"round({sim}, {round_to})"
    scored = (
        cand.join(F.broadcast(probes), "centroid_id")
        .filter(F.col(id_col) != F.col(q_id_col))
        .select(F.col(q_id_col).alias("q_id"),
                F.col(id_col).alias("vec_id"),
                F.expr(sim).alias("cos_sim"))
    )
    return _topk_per_query(scored, k)


def embedding_cosine_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                               n_planes: int = 6, id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               dim: int = 64,
                               max_bucket: int = 200) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket the corpus, pair
    within buckets (bounded), keep cosine >= threshold. The embedding twin
    of minhash_lsh_pairs."""
    b = emb.join(rhp_lsh_buckets(emb, n_planes, id_col, vec_col, dim),
                 id_col).select("bucket", F.col(id_col).alias("id"),
                                F.col(vec_col).alias("v"))
    grouped = (
        b.groupBy("bucket")
        .agg(F.sort_array(F.collect_list(F.struct("id", "v"))).alias("rows"))
        .filter((F.size("rows") > 1) & (F.size("rows") <= max_bucket))
    )
    pairs = grouped.select(F.explode(F.expr(
        "flatten(transform(rows, (x, i) -> "
        "transform(slice(rows, i + 2, size(rows) - i - 1), "
        "y -> struct(x.id as id_a, y.id as id_b, x.v as va, y.v as vb))))"
    )).alias("p")).select("p.*")
    dot = _DOT.format(a="va", b="vb")
    na = _NORM.format(a="va")
    nb = _NORM.format(a="vb")
    return (
        pairs.withColumn("cos_sim", F.expr(f"({dot}) / (({na}) * ({nb}))"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
        .distinct()
    )
