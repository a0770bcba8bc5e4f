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
            # NaN/null cos_sim ranks LAST in both stages: pandas sorts
            # NaN last here, and every row crosses this Arrow boundary
            # before the final window, where NaN has become NULL (Arrow
            # NaN->null coercion) and F.desc puts nulls last. Note Spark
            # would rank a *surviving* NaN FIRST under desc — it never
            # survives this hop, which is what keeps the two stages
            # consistent (partition-invariance pinned by test).
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
    """Deterministic pseudo-random hyperplane component: the first 4 hex
    chars of md5('<plane>|<d>') mapped to [-32767.5 .. +32767.5]
    (zero-mean). The plane depends only on (plane_idx, d), so the
    components are computed ONCE driver-side (hashlib — bit-identical to
    the engines' md5) and inlined as an array literal: the previous HOF
    formulation re-hashed the constant matrix per corpus ROW
    (n_planes x dim interpreted md5 calls each — the per-element-HOF
    pitfall dedup.py documents). DuckDB oracles keep reproducing the
    same bits from md5 directly."""
    import hashlib as _hl
    comps = ", ".join(
        repr(int(_hl.md5(f"{plane_idx}|{d}".encode()).hexdigest()[:4], 16)
             - 32767.5) + "D"
        for d in range(dim))
    return (f"aggregate(zip_with(cast({vec_col} as array<double>), "
            f"array({comps}), "
            f"(x, p) -> x * p), 0.0D, (acc, v) -> acc + v)")


def rhp_bucket_expr(vec_col: str, n_planes: int = 8, dim: int = 64):
    """The bucket as a COLUMN over the row's own embedding — attach with
    ``withColumn`` (a pure row-local function; joining a separately built
    bucket frame back on id would scan and shuffle the corpus twice for
    a value each row already determines)."""
    bits = " + ".join(
        f"(case when ({_plane_expr(vec_col, p, dim)}) > 0 "
        f"then {1 << p} else 0 end)"
        for p in range(n_planes)
    )
    return F.expr(f"cast({bits} as int)")


def rhp_lsh_buckets(emb: DataFrame, n_planes: int = 8,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    dim: int = 64) -> DataFrame:
    """(id, bucket): bucket = n_planes sign bits of deterministic random
    hyperplane projections. Row-local — this IS the index build."""
    return emb.select(F.col(id_col).alias("vec_id"),
                      rhp_bucket_expr(vec_col, n_planes, dim)
                      .alias("bucket"))


def cosine_topk_lsh(emb: DataFrame, queries: DataFrame, k: int = 10,
                    n_planes: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding", q_id_col: str = "q_id",
                    q_vec_col: str = "q_vec", dim: int = 64,
                    round_to: int | None = 6) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's LSH
    bucket. Recall < 1 by construction (that's the trade); at corpus scale
    this prunes the scan to ~1/2^n_planes of the rows."""
    b_emb = emb.withColumn("bucket",
                           rhp_bucket_expr(vec_col, n_planes, dim))
    q = queries.withColumn("bucket",
                           rhp_bucket_expr(q_vec_col, n_planes, dim))

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
    # min over (-c_sim, cid): max similarity, ties -> SMALLEST centroid
    # id for ANY id type (negating the id itself silently null-casts
    # string ids and inverted the tie to largest-id; -c_sim is always
    # numeric)
    best = (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct((-F.col("c_sim")).alias("ns"),
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
    aggregation — the shape iterates cheaply at any scale (pivot with
    :func:`refined_centroids`, re-assign with :func:`ivf_assign`,
    repeat). Sums go
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


def refined_centroids(refined: DataFrame) -> DataFrame:
    """Pivot :func:`ivf_refine`'s long (centroid_id, dim, val) output
    back into the (centroid_id, c_vec) shape :func:`ivf_assign`
    consumes — the missing glue that makes the documented Lloyd loop
    (assign -> refine -> re-assign) actually compose. One k-bounded
    groupBy; array_sort on struct(dim, val) restores dimension order."""
    return (refined.groupBy("centroid_id")
            .agg(F.array_sort(
                F.collect_list(F.struct("dim", "val"))).alias("dv"))
            .select("centroid_id",
                    F.expr("transform(dv, s -> s.val)").alias("c_vec")))


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
    b = emb.select(rhp_bucket_expr(vec_col, n_planes, dim).alias("bucket"),
                   F.col(id_col).alias("id"),
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


def semantic_dedup(emb: DataFrame, n_clusters: int = 16,
                   iterations: int = 1, threshold: float = 0.45,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_cluster: int = 20_000,
                   round_to: int = 6,
                   assign: DataFrame | None = None) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    cluster the embedding space, compare pairs only WITHIN a cluster, and
    drop every vector that has a lower-id near-duplicate (cosine >=
    ``threshold``) in its cluster — the greedy keep-lowest-id policy, so
    each near-dup neighborhood keeps exactly its minimal elements.
    Returns the full per-vector relation ``(vec_id, cluster_id, kept)``.

    The k-means is the derandomized Lloyd loop this module already
    ships: md5-seeded :func:`ivf_centroids`, then ``iterations`` rounds
    of :func:`ivf_refine` -> :func:`refined_centroids` ->
    :func:`ivf_assign` (all sims rounded to ``round_to`` so the chain is
    cross-engine exact).

    Scale shape: clustering IS the blocking — pair cost is
    sum(|cluster|^2), bounded by raising ``n_clusters`` (SemDeDup's own
    knob) and hard-capped by ``max_cluster`` (oversized clusters skip
    pairing — degenerate embedding mass, same spirit as the LSH
    ``max_bucket``); nothing all-pairs. Pair generation is a
    cluster-keyed self-join with ``id_a < id_b`` — rows stay
    pair-sized, the shuffle streams, and AQE's skew split can fan a fat
    cluster across tasks. (The previous collect_list +
    flatten(transform(...)) shape materialized a whole cluster in ONE
    row and expanded |c|^2/2 pair-structs inside ONE task — a
    straggler/OOM cliff at scale; the only collect_list left in this
    plan is the k-bounded centroid pivot.) Dot products stay JVM-side.

    ``assign`` injects a precomputed ``(vec_id, centroid_id)``
    assignment and skips the Lloyd loop — the cluster-once/dedup-many
    pattern, and the deterministic hook the cap tests use."""
    if assign is None:
        cents = ivf_centroids(emb, n_clusters, id_col, vec_col)
        assign = ivf_assign(emb, cents, id_col, vec_col, round_to=round_to)
        for _ in range(iterations):
            cents = refined_centroids(
                ivf_refine(emb, assign, id_col, vec_col))
            assign = ivf_assign(emb, cents, id_col, vec_col,
                                round_to=round_to)
    assigned = (emb.select(F.col(id_col).alias("vec_id"),
                           F.col(vec_col).alias("v"))
                .join(assign, "vec_id")
                .withColumnRenamed("centroid_id", "cluster_id"))
    # count-first cap: decide pairability from cluster SIZES before any
    # collect_list builds a cluster-sized row — filtering after the agg
    # would materialize the degenerate multi-GB cluster it is supposed
    # to skip (the count-then-collect shape the LSH max_bucket path
    # uses). Counted off the bare assignment relation (one row per
    # vec_id already) so the emb-join chain isn't evaluated a third time.
    pairable = (assign.groupBy(F.col("centroid_id").alias("cluster_id"))
                .agg(F.count(F.lit(1)).alias("n"))
                .filter((F.col("n") > 1) & (F.col("n") <= max_cluster))
                .select("cluster_id"))
    side = assigned.join(pairable, "cluster_id", "left_semi")
    # within-cluster self-join, id_a < id_b: identical pair set to the
    # old sorted-collect_list expansion (vec_ids are unique, so struct
    # sort order IS vec_id order) but each row carries ONE pair, never a
    # whole cluster.
    pairs = (side.select("cluster_id", F.col("vec_id").alias("id_a"),
                         F.col("v").alias("va"))
             .join(side.select("cluster_id",
                               F.col("vec_id").alias("id_b"),
                               F.col("v").alias("vb")),
                   "cluster_id")
             .filter(F.col("id_a") < F.col("id_b")))
    dot = _DOT.format(a="va", b="vb")
    na = _NORM.format(a="va")
    nb = _NORM.format(a="vb")
    dropped = (
        pairs
        .filter(F.expr(f"round(({dot}) / (({na}) * ({nb})), {round_to})")
                >= threshold)
        .select(F.col("id_b").alias("vec_id")).distinct())
    return (assigned.select("vec_id", "cluster_id")
            .join(dropped.withColumn("_drop", F.lit(True)),
                  "vec_id", "left")
            .select("vec_id", "cluster_id",
                    F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept")))
