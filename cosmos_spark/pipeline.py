"""The staged Spark KG-construction pipeline.

source (repo, path, commit, lang, content)            [Iceberg/parquet scan]
  -> segments   mapInPandas(segment_kernel)           [narrow, no shuffle]
  -> mentions   mapInPandas(mention_kernel)           [narrow, no shuffle]
  -> entities + alias dict   groupBy(norm)            [one small shuffle]
  -> links      broadcast join + batched scoring UDF  [map-side join]
  -> canonical  blocked similarity CC                 [one block shuffle]
  -> triples    unions -> hash-agg dedup -> partitioned sink

Scale design (the reason this layout wins at 100 TB / 1000 executors):

- Segmentation & mention detection are *row-local* — expressed as
  ``mapInPandas`` so the scan -> segments -> mentions chain is a single
  narrow stage: zero shuffles until the first aggregation. The reference
  crossed a process + filesystem boundary at every one of these hops
  (pickle files per page, `cosmos/ingestion/ingest/process/process_page.py:52-54`).
- The alias dictionary is tiny relative to mentions (distinct defined
  names), so candidate generation is an explicit ``F.broadcast`` map-side
  join — no shuffle of the big mentions table (reference analog: the
  in-memory UMLS candidate KB, `link.py:11-39`).
- Per-file skew is a non-issue (group key is (repo, path), never bare
  ``repo``); AQE skew-join splitting covers residual shuffle skew.
- Canonicalization blocks entities on a name prefix: similarity edges
  cannot cross blocks, so connected components runs block-locally in one
  ``applyInPandas`` shuffle (the scale replacement for `link.py:113`
  drop_duplicates). The general iterative min-label CC lives in
  :mod:`cosmos_spark.operators.graph` for cross-block edge relations.
"""

from __future__ import annotations

import atexit
import os
import shutil

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import types as T

from . import kernels as K

SEGMENT_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content_sha256", T.StringType()),
    T.StructField("seg_id", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("line_start", T.IntegerType()),
    T.StructField("line_end", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("score", T.DoubleType()),
])

MENTION_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("content_sha256", T.StringType()),
    T.StructField("seg_id", T.StringType()),
    T.StructField("mention_id", T.StringType()),
    T.StructField("mention_text", T.StringType()),
    T.StructField("mention_kind", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("link_rep", T.BooleanType()),
])

TRIPLE_SCHEMA = T.StructType([
    T.StructField("subj", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("obj", T.StringType()),
    T.StructField("repo", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("provenance", T.StringType()),
])


@F.pandas_udf(T.DoubleType())
def _trigram_jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return K.trigram_jaccard(a, b)


def _alias_norm_col(col):
    """Spark-expression twin of kernels.alias_norm (must match exactly)."""
    snake = F.regexp_replace(col, r"(?<=[a-z0-9])([A-Z])", "_$1")
    return F.regexp_replace(F.lower(snake), r"^_+|_+$", "")


def _entity_id_col(norm_col):
    """Spark twin of kernels.entity_id_for."""
    return F.concat(
        F.lit("ent_"),
        F.substring(F.sha2(F.concat(F.lit("ent|"), norm_col), 256), 1, 16),
    )


def _with_passthrough(base_schema: T.StructType, source: DataFrame,
                      passthrough: tuple[str, ...]) -> T.StructType:
    """base kernel schema + the passthrough columns (typed from source)."""
    out = T.StructType(list(base_schema.fields))
    for c in passthrough:
        out = out.add(source.schema[c])
    return out


def segments_of(source: DataFrame,
                passthrough: tuple[str, ...] = ()) -> DataFrame:
    """source -> segments. Narrow mapInPandas — the whole segmentation stage
    fuses with the scan (reference: one Dask task + pickle per page,
    `ingest.py:156-169`).

    ``passthrough`` columns (e.g. an event-time ``ingested_at``) are
    carried from the source row onto every derived segment row via an
    in-batch (repo, path) merge — exact under the unique-(repo, path)
    source invariant, still row-local (no shuffle). The merge side is
    deduplicated on (repo, path) like mentions_of's: a batch carrying
    two versions of one file (a streaming micro-batch with quick
    successive updates) must not fan segment rows out multiplicatively."""
    src = source
    if "content_sha256" not in src.columns:
        src = src.withColumn("content_sha256", F.sha2(F.col("content"), 256))

    def fn(it):
        for pdf in it:
            out = K.segment_kernel(pdf)
            if passthrough:
                out = out.merge(
                    pdf[["repo", "path", *passthrough]].drop_duplicates(
                        ["repo", "path"]),
                    on=["repo", "path"], how="left")
            yield out

    return src.mapInPandas(
        fn, _with_passthrough(SEGMENT_SCHEMA, src, passthrough))


def mentions_of(segments: DataFrame,
                passthrough: tuple[str, ...] = ()) -> DataFrame:
    def fn(it):
        for pdf in it:
            out = K.mention_kernel(pdf)
            if passthrough:
                out = out.merge(
                    pdf[["repo", "path", *passthrough]].drop_duplicates(
                        ["repo", "path"]),
                    on=["repo", "path"], how="left")
            yield out

    return segments.mapInPandas(
        fn, _with_passthrough(MENTION_SCHEMA, segments, passthrough))


SEG_MARKER = "_seg"


def fused_mentions_of(source: DataFrame) -> DataFrame:
    """source -> mentions + one ``_seg`` marker row per segment, in a
    single narrow ``mapInPandas`` pass.

    The seg -> mention hop stays inside the Python worker, so segment text
    never crosses the Arrow boundary, is never cached, and the whole
    front-end is one stage instead of two. The marker rows carry exactly
    the columns the member_of branch needs (repo, path, seg_id), replacing
    the segments relation for triple assembly — the relation this saves
    from materialization is ~3x the source in rows and carries every
    segment's full text. Kernels are unchanged (same bytes as the staged
    path; tests compare both against the oracle)."""
    src = source
    if "content_sha256" not in src.columns:
        src = src.withColumn("content_sha256", F.sha2(F.col("content"), 256))

    def fn(it):
        for pdf in it:
            seg = K.segment_kernel(pdf)
            men = K.mention_kernel(seg)
            markers = seg[["repo", "path", "commit", "content_sha256",
                           "seg_id"]].copy()
            markers["mention_id"] = None
            markers["mention_text"] = None
            markers["mention_kind"] = SEG_MARKER
            markers["score"] = 1.0
            markers["link_rep"] = False
            yield pd.concat([men, markers[K.MENTION_COLUMNS]],
                            ignore_index=True)

    return src.mapInPandas(fn, MENTION_SCHEMA)


SUBSEG_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("seg_id", T.StringType()),
    T.StructField("method", T.StringType()),
    T.StructField("sub_line_start", T.IntegerType()),
    T.StructField("sub_line_end", T.IntegerType()),
])


def subsegments_of(segments: DataFrame) -> DataFrame:
    """G6 nested segmentation (method sub-segments inside class segments)
    as a narrow mapInPandas over the segments relation — fuses with the
    segmentation stage, no shuffle."""

    def fn(it):
        for pdf in it:
            yield K.subsegment_kernel(pdf)

    return segments.mapInPandas(fn, SUBSEG_SCHEMA)


def entities_of(mentions: DataFrame) -> DataFrame:
    """Entities = distinct normalized def names. One shuffle on ``norm``
    (map-side partial aggregation; the key is low-cardinality)."""
    defs = (
        mentions.filter(F.col("mention_kind") == "def")
        .withColumn("norm", _alias_norm_col(F.col("mention_text")))
        .filter(F.col("norm") != "")
    )
    return (
        defs.groupBy("norm")
        .agg(F.sort_array(F.collect_set("mention_text")).alias("aliases"))
        .withColumn("entity_id", _entity_id_col(F.col("norm")))
        .withColumn("canonical_name", F.col("norm"))
        .withColumn("types", F.array(F.lit("def")))
        .select("entity_id", "canonical_name", "aliases", "types")
    )


def aliases_of(entities: DataFrame) -> DataFrame:
    """Alias dict (exact + fuzzy keys) derived from the *entities* frame —
    so when entities is persisted, building aliases touches only the tiny
    dim, not the mentions relation again.

    (alias_key, entity_id) is unique by construction — no dedup shuffle:
    ``entities`` is unique on entity_id (one row per distinct norm, see
    :func:`entities_of`), each row emits one exact key (its norm) and at
    most one fuzzy key that the filter guarantees differs from it — so
    the whole dict is a narrow projection of the dim."""
    base = entities.select(
        F.col("canonical_name").alias("norm"), "entity_id", "canonical_name")
    exact = base.select(
        F.col("norm").alias("alias_key"), "entity_id", "canonical_name",
        F.lit("exact").alias("alias_kind"))
    fuzzy = (
        base.withColumn("alias_key", F.regexp_replace(F.col("norm"), r"_v\d+$", ""))
        .filter(F.col("alias_key") != F.col("norm"))
        .select("alias_key", "entity_id", "canonical_name",
                F.lit("fuzzy").alias("alias_kind"))
    )
    return exact.unionByName(fuzzy)


def entities_and_aliases(mentions: DataFrame) -> tuple[DataFrame, DataFrame]:
    entities = entities_of(mentions)
    return entities, aliases_of(entities)


def best_aliases(aliases: DataFrame) -> DataFrame:
    """Per-alias_key top-1 scored candidate — the broadcast-sized link
    dim (alias_key, entity_id, link_score, multi_key). Scoring (trigram
    Jaccard vs the canonical name; exact aliases = 1.0 by construction)
    runs on alias rows, never candidate rows. ``multi_key`` flags
    entities that win MORE THAN ONE alias_key: only links to those can
    duplicate a mentions triple, so only that subset ever needs a dedup
    agg downstream (:func:`triples_of`). Both windows shuffle the dim
    only, never a mentions relation."""
    scored = aliases.withColumn(
        "link_score",
        F.when(F.col("alias_kind") == "exact", F.lit(1.0)).otherwise(
            _trigram_jaccard_udf(F.col("alias_key"), F.col("canonical_name"))))
    w = Window.partitionBy("alias_key").orderBy(
        F.desc("link_score"), F.asc("entity_id"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("alias_key", "entity_id", "link_score")
    )
    wk = Window.partitionBy("entity_id")
    return best.withColumn("multi_key", F.count(F.lit(1)).over(wk) > 1)


def link_mentions(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Candidate generation + scoring + top-1 acceptance (`link.py:26-33`).

    Key scale property: a mention's entire candidate set is determined by
    its single ``alias_key`` (candidates = alias rows sharing that key), so
    top-1-per-mention == top-1-per-alias_key — computable on the *tiny*
    alias table before the join. The big mentions table then takes exactly
    one broadcast equi-join (J4) and never shuffles: no per-mention
    aggregation, no sort. Scoring (trigram Jaccard vs the canonical name,
    exact aliases = 1.0 by construction) runs on alias rows, not candidate
    rows — O(|aliases|) UDF work instead of O(|mentions|)."""
    best = best_aliases(aliases)
    base = (
        mentions.filter(F.col("mention_kind").isin("call", "import", "ref"))
        .withColumn("alias_key",
                    _alias_norm_col(F.substring_index(F.col("mention_text"), ".", -1)))
    )
    cols = ["repo", "path", "seg_id", "mention_id", "entity_id",
            "multi_key"]
    if "link_rep" in base.columns:
        cols.append("link_rep")
    return (
        base.join(F.broadcast(best), "alias_key", "inner")
        .select(*cols, F.col("link_score").alias("score"))
        .withColumn("linked", F.col("score") > F.lit(K.LINK_THRESHOLD))
    )


CANON_NUM_HASHES = 8    # single-row bands: recall 1-(1-J)^8 at J>=0.7
CANON_MAX_BUCKET = 64   # hot-bucket cap (same spirit as dedup.minhash_lsh_pairs)

# THE banding expressions — shared verbatim with plans/incremental.py's
# persisted blocking index (_banded_rows/_bucket_edges): incremental
# surgery's bit-for-bit equivalence to a full recanonicalization requires
# both sides to band and sign IDENTICALLY, so there is exactly one
# definition of each
CANON_TG_EXPR = ("array_distinct(filter(transform("
                 "sequence(1, greatest(length(canonical_name) - 2, 1)), "
                 "i -> substring(canonical_name, i, 3)), t -> t != ''))")
CANON_SIG_EXPR = (f"transform(sequence(0, {CANON_NUM_HASHES - 1}), "
                  f"h -> array_min(transform(tg, t -> xxhash64(t, h))))")

# The pair-generation/verification half of the same one-definition
# contract: the upper-triangle enumeration over a bucket's sorted rows
# and the exact trigram-Jaccard verify must also be IDENTICAL on both
# sides, or a tweak to either silently breaks incremental-vs-rebuild
# equality (pinned by test_incremental_canon_mode_matches_full).
CANON_JACCARD_EXPR = ("size(array_intersect(tg_a, tg_b)) / "
                      "cast(size(array_union(tg_a, tg_b)) as double)")


def canon_pair_expr(field_map: str) -> str:
    """Upper-triangle pair enumeration over the sorted ``rows`` array of
    one blocking bucket: every (x, y) with x before y, projected through
    ``field_map`` (a struct field list referencing x/y)."""
    return ("flatten(transform(rows, (x, i) -> "
            "transform(slice(rows, i + 2, size(rows) - i - 1), "
            f"y -> struct({field_map}))))")


def canonical_candidate_pairs(entities: DataFrame,
                              max_bucket: int = CANON_MAX_BUCKET) -> DataFrame:
    """Verified similarity edges (id_a, name_a, id_b, name_b) between
    entities whose names have trigram-Jaccard >= CANON_THRESHOLD.

    Multi-key blocking: each of the CANON_NUM_HASHES trigram-MinHash values
    (xxhash64 seeded per band) is an independent blocking key (a single-row
    LSH band), so a J>=0.7 pair collides on >= 1 key w.p. 1-0.3^8 = 99.993%
    — unlike prefix blocking, edges are not structurally confined to one
    block. Buckets over ``max_bucket`` are dropped (degenerate names; the
    19-proposal-cap spirit, `connected_components.py:96,193-196`), bounding
    the quadratic pairing. Candidates are then *verified* by exact
    trigram-Jaccard (array_intersect/array_union), so bucket collisions add
    no false edges.

    Entirely JVM-side (HOF lambdas + xxhash64): per-element lambda
    interpretation is acceptable here because the input is the
    distinct-def-name dim — orders smaller than the corpus — and it keeps
    Python workers (and their cold-start) out of the canonicalization path
    entirely."""
    banded = (
        entities.withColumn("tg", F.expr(CANON_TG_EXPR))
        .filter(F.size("tg") > 0)
        .select(F.struct("canonical_name", "entity_id", "tg").alias("row"),
                F.posexplode(F.expr(CANON_SIG_EXPR)).alias("band", "bval"))
    )
    buckets = (
        banded.groupBy("band", "bval")
        .agg(F.sort_array(F.collect_list("row")).alias("rows"))
        .filter((F.size("rows") > 1) & (F.size("rows") <= max_bucket))
    )
    pairs = buckets.select(F.explode(F.expr(canon_pair_expr(
        "x.entity_id as id_a, x.canonical_name as name_a, "
        "x.tg as tg_a, y.entity_id as id_b, y.canonical_name as name_b, "
        "y.tg as tg_b"
    ))).alias("p")).select("p.*").distinct()
    return (
        pairs.filter(F.expr(
            f"({CANON_JACCARD_EXPR}) >= {K.CANON_THRESHOLD}"))
        .select("id_a", "name_a", "id_b", "name_b")
    )


def _union_find_mapping(edges: list[tuple[str, str]],
                        name: dict[str, str]) -> list[tuple[str, str]]:
    """Union-find over (id_a, id_b) edges. Returns only the non-identity
    (entity_id, canonical_id) mappings; representative = min
    (canonical_name, entity_id) per component."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ia, ib in edges:
        for i in (ia, ib):
            if i not in parent:
                parent[i] = i
        ra, rb = find(ia), find(ib)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    members: dict[str, list[str]] = {}
    for i in parent:
        members.setdefault(find(i), []).append(i)
    mapping: list[tuple[str, str]] = []
    for ms in members.values():
        rep = min(ms, key=lambda m: (name[m], m))
        mapping.extend((m, rep) for m in ms if m != rep)
    return mapping


def _driver_union_find(rows) -> list[tuple[str, str]]:
    """Union-find over collected (id_a, name_a, id_b, name_b) edge rows."""
    name: dict[str, str] = {}
    edges: list[tuple[str, str]] = []
    for r in rows:
        name[r.id_a] = r.name_a
        name[r.id_b] = r.name_b
        edges.append((r.id_a, r.id_b))
    return _union_find_mapping(edges, name)


def _driver_canonical_mapping(
        rows,
        num_hashes: int = CANON_NUM_HASHES,
        max_bucket: int = CANON_MAX_BUCKET) -> list[tuple[str, str]]:
    """Driver-side twin of ``canonical_candidate_pairs`` + union-find, run
    when the entities dim itself fits on the driver (the adaptive fast
    path of :func:`canonicalize`).

    Same algorithm, vectorized in numpy instead of Catalyst HOFs: per-name
    trigram sets (``kernels._trigrams`` — identical to the SQL trigram
    expression), ``num_hashes`` trigram-MinHash blocking keys per name
    (splitmix64 over crc32 trigram codes; the *bits* need not match the
    distributed path — banding only generates candidates, recall comes
    from the same 1-(1-J)^8 collision bound), buckets over ``max_bucket``
    dropped, then candidates verified by EXACT trigram Jaccard >=
    CANON_THRESHOLD (so the blocking hash never changes the edge set on
    any pair it surfaces), then union-find with min-(name, id)
    representatives. Semantics therefore match the distributed branch
    edge-for-edge wherever both surface the candidate, with the identical
    verify + component contract."""
    import zlib

    import numpy as np

    ids: list[str] = []
    names: list[str] = []
    tgs: list[set] = []
    for r in rows:
        t = K._trigrams(r.canonical_name or "")
        if t:
            ids.append(r.entity_id)
            names.append(r.canonical_name)
            tgs.append(t)
    if not ids:
        return []

    vocab: dict[str, int] = {}
    flat: list[int] = []
    offsets = [0]
    for t in tgs:
        for g in t:
            gi = vocab.get(g)
            if gi is None:
                gi = vocab[g] = len(vocab)
            flat.append(gi)
        offsets.append(len(flat))
    flat_ids = np.asarray(flat, dtype=np.int64)
    starts = np.asarray(offsets[:-1], dtype=np.int64)
    base = np.array([zlib.crc32(g.encode("utf-8")) for g in vocab],
                    dtype=np.uint64)

    cand: set[tuple[int, int]] = set()
    n = len(ids)
    for b in range(num_hashes):
        # splitmix64 finalizer over (crc32(trigram), band); band offset
        # reduced mod 2^64 in Python first (numpy warns on scalar uint64
        # wraparound even though wraparound is the intent)
        h = base + np.uint64((b * 0x9E3779B97F4A7C15) % (1 << 64))
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
        mins = np.minimum.reduceat(h[flat_ids], starts)
        order = np.argsort(mins, kind="stable")
        sm = mins[order]
        run_starts = np.flatnonzero(np.r_[True, sm[1:] != sm[:-1]])
        run_ends = np.r_[run_starts[1:], n]
        for s, e in zip(run_starts, run_ends):
            if 1 < e - s <= max_bucket:
                members = order[s:e]
                for i in range(len(members)):
                    for j in range(i + 1, len(members)):
                        a, c = members[i], members[j]
                        cand.add((a, c) if a < c else (c, a))

    thr = K.CANON_THRESHOLD
    name_of = dict(zip(ids, names))
    edges = []
    for a, c in cand:
        u = len(tgs[a] | tgs[c])
        if u and len(tgs[a] & tgs[c]) / u >= thr:
            edges.append((ids[a], ids[c]))
    return _union_find_mapping(edges, name_of)


CANON_DRIVER_CC_MAX_EDGES = 200_000
CANON_DRIVER_DIM_MAX = 500_000


def canonicalize(entities: DataFrame,
                 driver_cc_max_edges: int = CANON_DRIVER_CC_MAX_EDGES,
                 driver_dim_max: int = CANON_DRIVER_DIM_MAX
                 ) -> DataFrame:
    """Connected components over the multi-key-blocked similarity edges
    (the scale replacement for `link.py:113` drop_duplicates; fixpoint
    semantics from the reference's bbox merge, `group_cls.py:60-144`).

    Edges come from MinHash-band blocking + exact verify — recall-safe
    across name prefixes. The whole step is *adaptive*, the same runtime
    size-switch AQE applies to join strategies, with a two-level cascade:

    1. The entities dim (one row per distinct normalized def name — orders
       smaller than the corpus) is probed with ``limit(dim_max+1)``. When
       it fits (<= driver_dim_max, default 500k ~= 40 MB of short
       strings), the ENTIRE blocking + verify + union-find runs
       driver-side, numpy-vectorized (:func:`_driver_canonical_mapping`),
       in the one job that also materializes the entities persist for the
       downstream alias/same_as consumers — no Catalyst banding job at
       all, and the mapping goes back as a broadcast join (zero shuffles
       added downstream). This removed the pipeline's largest fixed eager
       cost (~1.3 s of HOF banding codegen + execution per run at sf0.1).
    2. Otherwise the distributed :func:`canonical_candidate_pairs` plan
       builds the verified edges; ``limit(max+1)`` probes THEM, and when
       they fit (<= driver_cc_max_edges, default 200k) union-find still
       runs driver-side. The edge relation is persisted *before* the probe
       so the overflow branch reuses the expensive LSH+verify computation
       instead of recomputing it.
    3. Else the iterative large/small-star CC (:mod:`operators.graph`)
       runs over only the edge-incident nodes (isolated entities never
       enter the loop).

    Representative per component = min (canonical_name, entity_id).
    Returns ``entities`` + ``canonical_id`` (canonical_id == entity_id for
    isolated/representative entities)."""
    spark = entities.sparkSession
    e = entities.select("entity_id", "canonical_name")
    schema = "entity_id string, canonical_id string"

    dim_head = e.limit(driver_dim_max + 1).collect()
    if len(dim_head) <= driver_dim_max:
        # level 1: whole dim fits — driver-vectorized mapping, no
        # Catalyst banding job; shares the single return tail below
        mapping = _driver_canonical_mapping(dim_head)
        canon = F.broadcast(spark.createDataFrame(mapping or [], schema))
    else:
        from pyspark import StorageLevel

        pairs = (canonical_candidate_pairs(e)
                 .persist(StorageLevel.MEMORY_AND_DISK))
        head = pairs.limit(driver_cc_max_edges + 1).collect()
        if len(head) <= driver_cc_max_edges:
            pairs.unpersist()
            mapping = _driver_union_find(head)
            canon = F.broadcast(
                spark.createDataFrame(mapping or [], schema))
        else:
            from .operators.graph import connected_components_star
            edges = pairs
            nodes = (edges.select(F.col("id_a").alias("node"))
                     .unionByName(edges.select(F.col("id_b").alias("node")))
                     .distinct())
            # star CC: name-similarity components can be chain-shaped
            # (a~b~c with a!~c), where min-label propagation would need
            # O(chain length) rounds — large/small-star needs O(log n)
            cc = connected_components_star(
                nodes, edges.select(F.col("id_a").alias("src"),
                                    F.col("id_b").alias("dst")))
            lab = cc.join(e, cc["node"] == e["entity_id"]).select(
                "node", "component", "canonical_name")
            rep = (
                lab.groupBy("component")
                .agg(F.min(F.struct("canonical_name",
                                    F.col("node").alias("eid"))).alias("r"))
                .select("component", F.col("r.eid").alias("canonical_id"))
            )
            canon = (lab.join(rep, "component")
                     .filter(F.col("node") != F.col("canonical_id"))
                     .select(F.col("node").alias("entity_id"),
                             "canonical_id"))
            # connected_components_star localCheckpoints eagerly per
            # round, so the persisted edge relation has been fully
            # consumed by the time it returns — release it (cache-leak
            # fix, ADVICE r2).
            pairs.unpersist()
    return (
        entities.join(canon, "entity_id", "left")
        .withColumn("canonical_id",
                    F.coalesce(F.col("canonical_id"), F.col("entity_id")))
    )


_PRED_FOR_KIND = {"def": "defines", "import": "imports", "call": "calls"}


def triples_of(
    segments: DataFrame,
    mentions: DataFrame,
    links: DataFrame,
    entities_canon: DataFrame,
    run_id: str = "run0",
    source_unique_paths: bool = True,
) -> DataFrame:
    """Assemble the four triple families.

    ``source_unique_paths=True`` (default) declares the ingestion-level
    invariant that source rows are unique per (repo, path) — the scan-side
    contract an Iceberg identifier-field table gives for free. Under it no
    branch needs a dedup (subj embeds a per-segment content hash and each
    family is distinct by construction), which removes the pipeline's
    largest remaining shuffle: deduping once at the source (1 row per file)
    is strictly cheaper than re-deduping the ~3x larger triple relation on
    every run. Pass False when feeding multi-commit snapshots of the same
    path: then ALL families are deduped by a global
    (subj, pred, obj) hash-agg (max score / min repo per key) — duplicate
    (repo, path) rows duplicate base/mentions/member triples alike, not
    just member_of."""
    m = mentions.withColumn(
        "subj", F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"),
                            F.lit("#"), F.col("seg_id")))

    # The four triple families have disjoint pred sets, so (subj,pred,obj)
    # dedup never crosses branches — dedup per branch and skip it entirely
    # where uniqueness holds by construction. This removes the former
    # whole-output groupBy (the largest shuffle in the job: every triple's
    # long subj string crossed the wire) in favor of one small agg on the
    # linked subset.
    pred_map = F.create_map(
        *[F.lit(x) for kv in _PRED_FOR_KIND.items() for x in kv])
    # base: mention_kernel dedups per (seg, kind, text) and pred is a
    # function of kind -> (subj,pred,obj) already distinct. No shuffle.
    base = (
        m.filter(F.col("mention_kind").isin(*_PRED_FOR_KIND))
        .select("subj", pred_map[F.col("mention_kind")].alias("pred"),
                F.col("mention_text").alias("obj"), "repo", "score")
    )
    # ment: two mentions in one segment (e.g. a call and a ref of the same
    # name) can emit the same (subj, mentions, entity) triple. The kernel
    # pre-marks one representative per (segment, alias_key) — link
    # candidates are a function of alias_key, so representatives cover all
    # linked entities with identical scores — making the bulk a pure
    # filter; only links to entities that win >1 alias_key (`multi_key`)
    # need a keep-max hash-agg for exact uniqueness. Fallback for links
    # without the flags: hash-agg dedup over the whole linked subset.
    if "seg_id" in links.columns:  # links carries provenance columns
        lm = links.filter(F.col("linked")).withColumn(
            "subj", F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"),
                                F.lit("#"), F.col("seg_id")))
    else:  # externally supplied links (checkpoint of an older layout)
        lm = (links.filter(F.col("linked"))
              .join(m.select("mention_id", "subj", "repo"), "mention_id"))
    if "link_rep" in lm.columns and "multi_key" in lm.columns:
        # Exact, shuffle-bounded dedup: link_rep makes (subj, entity)
        # unique per alias_key; a duplicate needs two DISTINCT keys
        # resolving to one entity, i.e. multi_key (flagged on the tiny
        # alias dim in link_mentions). Only that subset — empty to tiny
        # on real corpora — pays a hash-agg (max score, matching the
        # oracle's keep-max global dedup); the bulk stays a pure filter.
        rep = lm.filter(F.col("link_rep"))
        safe = (
            rep.filter(~F.col("multi_key"))
            .select("subj", F.lit("mentions").alias("pred"),
                    F.col("entity_id").alias("obj"), "repo", "score")
        )
        amb = (
            rep.filter(F.col("multi_key"))
            .groupBy("subj", F.col("entity_id").alias("obj"))
            .agg(F.max("score").alias("score"), F.min("repo").alias("repo"))
            .select("subj", F.lit("mentions").alias("pred"), "obj", "repo",
                    "score")
        )
        ment = safe.unionByName(amb)
    elif "link_rep" in lm.columns:  # older checkpoint layout: filter-only
        ment = (
            lm.filter(F.col("link_rep"))
            .select("subj", F.lit("mentions").alias("pred"),
                    F.col("entity_id").alias("obj"), "repo", "score")
        )
    else:
        ment = (
            lm.groupBy("subj", F.col("entity_id").alias("obj"))
            .agg(F.max("score").alias("score"), F.min("repo").alias("repo"))
            .select("subj", F.lit("mentions").alias("pred"), "obj", "repo",
                    "score")
        )
    # member: one row per segment; seg_id hashes (line_start, line_end,
    # text) so subj repeats only if source holds duplicate (repo, path)
    # rows (e.g. two commits of one file).
    member = segments.select(
        F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"),
                    F.lit("#"), F.col("seg_id")).alias("subj"),
        F.lit("member_of").alias("pred"),
        F.concat_ws("/", "repo", "path").alias("obj"),
        "repo", F.lit(1.0).alias("score"))
    # same: one row per non-canonical entity — unique by construction.
    same = (
        entities_canon.filter(F.col("entity_id") != F.col("canonical_id"))
        .select(F.col("entity_id").alias("subj"),
                F.lit("same_as").alias("pred"),
                F.col("canonical_id").alias("obj"),
                F.lit("*").alias("repo"), F.lit(1.0).alias("score"))
    )
    t = base.unionByName(ment).unionByName(member).unionByName(same)
    if not source_unique_paths:
        # multi-commit inputs duplicate every family: one global hash-agg
        # (map-side partial combine) restores (subj, pred, obj) uniqueness,
        # matching the oracle's global dedup (oracle.emit_triples)
        t = (
            t.groupBy("subj", "pred", "obj")
            .agg(F.max("score").alias("score"), F.min("repo").alias("repo"))
            .select("subj", "pred", "obj", "repo", "score")
        )
    return t.withColumn(
        "provenance",
        F.concat(F.lit(f"triples@{run_id}:"),
                 F.spark_partition_id().cast("string")))


_TEMP_DIRS: list[str] = []


def _cleanup_temp_dirs() -> None:
    while _TEMP_DIRS:
        shutil.rmtree(_TEMP_DIRS.pop(), ignore_errors=True)


atexit.register(_cleanup_temp_dirs)


def run_pipeline(spark: SparkSession, source: DataFrame,
                 run_id: str = "run0",
                 persist_intermediates: bool = True,
                 fused: bool = True,
                 workdir: str | None = None,
                 source_unique_paths: bool = True) -> dict[str, DataFrame]:
    """End-to-end plan (no checkpointing — see plans.lineage for the
    resumable runner). NOTE: with ``fused=True`` and
    ``persist_intermediates=True`` (the defaults) the call is *eager* at
    the front end — the fused mentions relation is written to parquet
    immediately (process-lifetime temp dir, cleaned at exit or via
    ``workdir``); everything downstream stays lazy.

    ``fused=True`` runs segmentation + mention detection as one
    narrow mapInPandas pass whose output (mentions + per-segment marker
    rows) is the only thing persisted: it feeds all four downstream
    branches (entities, links, triple base, member edges). The staged path
    (``fused=False``) materializes segments and mentions separately — the
    layout the checkpointed at-scale runner (plans.lineage) uses, at the
    cost of caching the segment-text relation.

    ``source_unique_paths`` is forwarded to :func:`triples_of` — pass False
    when source rows are not unique per (repo, path)."""
    if fused:
        fusedf = fused_mentions_of(source)
        if persist_intermediates:
            # Materialize the fused front-end as PARQUET, not a block
            # cache. Measured on this host (pinned CPUs, 2 vs 8 cores,
            # whole pipeline, min of interleaved repeats): the
            # MemoryStore/BlockManager cache write serializes under the
            # block-manager lock — the persist step alone cost +2.4 s on
            # 2 CPUs but +8.5 s on 8 (anti-scaling) — while a parquet
            # write is per-task parallel and re-reads are vectorized
            # columnar scans: pipeline efficiency 0.73 (pq) vs 0.64 (MAD)
            # with the best absolute time as well. This is also the
            # at-scale layout (plans.lineage materializes stages the same
            # way; on a cluster the write lands in the lake, and executor
            # loss re-reads instead of recomputing). Exchange-reuse
            # materialization would avoid the copy entirely, but Catalyst
            # never canonicalizes two MapInPandas subtrees as equal
            # (Python function identity), so a shared repartition is
            # recomputed per consumer.
            import tempfile
            if workdir:
                d = os.path.join(workdir, "fused")
            else:
                d = tempfile.mkdtemp(prefix="cosmos_fused_")
                _TEMP_DIRS.append(d)  # reclaimed at process exit
            # Codec: session default (snappy). Measured (interleaved
            # warm A/B, 8 pinned CPUs, min of 4): lz4 7.99 s vs snappy
            # 7.85 s whole-pipeline — the scratch write is not
            # compression-bound, so no scratch-tier codec override.
            fusedf.write.mode("overwrite").parquet(d)
            fusedf = spark.read.parquet(d)
        mentions = fusedf.filter(F.col("mention_kind") != SEG_MARKER)
        member_src = fusedf.filter(F.col("mention_kind") == SEG_MARKER)
        segments = segments_of(source)  # lazy; computed only if consumed
    else:
        segments = segments_of(source)
        mentions = mentions_of(segments)
        if persist_intermediates:
            from pyspark import StorageLevel
            segments = segments.persist(StorageLevel.MEMORY_AND_DISK)
            mentions = mentions.persist(StorageLevel.MEMORY_AND_DISK)
        member_src = segments
    entities = entities_of(mentions)
    if persist_intermediates:
        # the post-agg dim is tiny at any corpus scale (one row per
        # distinct normalized def name) but feeds 3 consumers (alias
        # broadcast, canonicalize, same_as) — persisting caps the mentions
        # relation at one dim-building scan. (Measured alternative, worth
        # recording: collecting the dim once and rebuilding it as a
        # LocalRelation for all consumers is ~0.8 s SLOWER at sf0.1 —
        # the driver->JVM re-serialization of the dim into every
        # consumer's job costs more than the one MemoryStore write.)
        from pyspark import StorageLevel
        entities = entities.persist(StorageLevel.MEMORY_AND_DISK)
    aliases = aliases_of(entities)
    links = link_mentions(mentions, aliases)
    entities_canon = canonicalize(entities)
    triples = triples_of(member_src, mentions, links, entities_canon,
                         run_id=run_id,
                         source_unique_paths=source_unique_paths)
    return {
        "segments": segments,
        "mentions": mentions,
        "entities": entities_canon,
        "aliases": aliases,
        "links": links,
        "triples": triples,
    }


def write_triples(triples: DataFrame, path: str) -> None:
    """Partitioned graph sink. Directory partitioning by ``pred`` (6 stable
    values, never skew-explodes metadata the way per-repo partitioning would
    at 10^12 files); shuffle partitioning by ``(pred, repo)`` so the write
    stage keeps full task parallelism — hash-partitioning on ``pred`` alone
    would collapse the entire sink to <= 6 non-empty tasks, the single worst
    bottleneck at 100 TB. Within each task, rows sort by (pred, repo, subj):
    one pred per output file run and per-repo clustering inside it (the
    parquet-dir stand-in for an Iceberg writeTo with bucket(repo) —
    SURVEY §1.1)."""
    (
        sink_layout(triples)
        .write.mode("overwrite")
        .partitionBy("pred")
        .parquet(path)
    )


def doc_rollup(segments: DataFrame, mentions: DataFrame) -> DataFrame:
    """G4 whole-document rollup — one row per (repo, path) with the
    reassembled content plus segment/mention counters: the Spark analog of
    the reference's separate ``fulldocument`` index
    (`elastic_retriever.py:262-277`), which backs the doc-level filter
    semi-join at query time.

    One hash-shuffle on (repo, path) per input (map-side partial agg;
    the key is the file key, so skew follows file count, never repo
    size). Content pooling is order-deterministic (segments sorted by
    line_start)."""
    segs = (
        segments.groupBy("repo", "path")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.array_join(F.expr(
                "transform(array_sort(collect_list("
                "struct(line_start, seg_id, text))), x -> x.text)"),
                "\n\n").alias("content"),
            F.sort_array(F.collect_set("kind")).alias("kinds"),
            F.max("score").alias("max_score"),
        )
    )
    men = (mentions.groupBy("repo", "path")
           .agg(F.count(F.lit(1)).alias("n_mentions")))
    return (
        segs.join(men, ["repo", "path"], "left")
        .withColumn("n_mentions",
                    F.coalesce(F.col("n_mentions"), F.lit(0)))
    )


def write_graph(result: dict[str, DataFrame], catalog,
                prefix: str = "graph") -> None:
    """Materialize the whole queryable knowledge graph through the table
    catalog: the ``triples`` edge table (pred-partitioned, (pred, repo)-
    parallel), the ``nodes`` entity dim (with canonical ids + aliases),
    and the ``documents`` whole-doc rollup (:func:`doc_rollup` — the
    two-index layout of the reference, which maintains `fulldocument`
    beside the object index, `elastic_retriever.py:262-277,360-613`).
    Query-time code (:mod:`cosmos_spark.retrieval`) runs unchanged on the
    re-read tables; the documents table serves doc-level filters without
    touching the segment relation. NOTE: in the fused pipeline layout the
    ``segments`` relation is lazy — materializing the rollup is the one
    consumer that re-runs the segmentation kernel (the fused output
    deliberately drops segment text)."""
    catalog.write(result["triples"], f"{prefix}.triples",
                  partition_by=("pred",), sort_within_by=("repo", "subj"))
    nodes = result["entities"].select(
        "entity_id", "canonical_name", "canonical_id", "aliases", "types")
    catalog.write(nodes, f"{prefix}.nodes",
                  sort_within_by=("canonical_name",))
    docs = doc_rollup(result["segments"], result["mentions"])
    catalog.write(docs, f"{prefix}.documents",
                  sort_within_by=("repo", "path"))


def sink_layout(triples: DataFrame) -> DataFrame:
    """The pre-write shuffle/sort layout of :func:`write_triples`, exposed
    so plan tests can pin its shape (hash on (pred, repo), never pred
    alone)."""
    return (triples.repartition("pred", "repo")
            .sortWithinPartitions("pred", "repo", "subj"))
