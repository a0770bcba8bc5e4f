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

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
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


def segments_of(source: DataFrame) -> DataFrame:
    """source -> segments. Narrow mapInPandas — the whole segmentation stage
    fuses with the scan (reference: one Dask task + pickle per page,
    `ingest.py:156-169`)."""
    src = source
    if "content_sha256" not in src.columns:
        src = src.withColumn("content_sha256", F.sha2(F.col("content"), 256))

    def fn(it):
        for pdf in it:
            yield K.segment_kernel(pdf)

    return src.mapInPandas(fn, SEGMENT_SCHEMA)


def mentions_of(segments: DataFrame) -> DataFrame:
    def fn(it):
        for pdf in it:
            yield K.mention_kernel(pdf)

    return segments.mapInPandas(fn, MENTION_SCHEMA)


def entities_and_aliases(mentions: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Entities = distinct normalized def names; alias dict = exact + fuzzy
    keys. One shuffle on ``norm`` (the key is already low-cardinality)."""
    defs = (
        mentions.filter(F.col("mention_kind") == "def")
        .withColumn("norm", _alias_norm_col(F.col("mention_text")))
        .filter(F.col("norm") != "")
    )
    entities = (
        defs.groupBy("norm")
        .agg(F.sort_array(F.collect_set("mention_text")).alias("aliases"))
        .withColumn("entity_id", _entity_id_col(F.col("norm")))
        .withColumn("canonical_name", F.col("norm"))
        .withColumn("types", F.array(F.lit("def")))
        .select("entity_id", "canonical_name", "aliases", "types")
    )
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
    aliases = exact.unionByName(fuzzy).dropDuplicates(["alias_key", "entity_id"])
    return entities, aliases


def link_mentions(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Candidate generation = broadcast equi-join on the normalized basename
    (J4); scoring = exact-match fast path JVM-side (score 1.0 — the
    overwhelmingly common case) with the batched Arrow trigram UDF only on
    fuzzy-alias candidates; acceptance = top-1 per mention with score > 0.8
    (`link.py:26-33`). Top-1 is a hash aggregation (min over a
    (-score, entity_id) struct), not a sort window — partial aggregation
    runs map-side, so no full candidate sort ever shuffles."""
    base = (
        mentions.filter(F.col("mention_kind").isin("call", "import", "ref"))
        .withColumn("alias_key",
                    _alias_norm_col(F.substring_index(F.col("mention_text"), ".", -1)))
    )
    # exact aliases score 1.0 by construction (alias_key == canonical_name)
    # — keep that branch fully JVM-side; the Arrow UDF only ever sees the
    # small fuzzy-alias candidate stream. (A when/otherwise would NOT do
    # this: Spark hoists pandas UDFs into an ArrowEvalPython node that
    # evaluates them on every row regardless of the branch.)
    exact = (
        base.join(F.broadcast(aliases.filter(F.col("alias_kind") == "exact")),
                  "alias_key", "inner")
        .withColumn("link_score", F.lit(1.0))
    )
    fuzzy = (
        base.join(F.broadcast(aliases.filter(F.col("alias_kind") == "fuzzy")),
                  "alias_key", "inner")
        .withColumn("link_score",
                    _trigram_jaccard_udf(F.col("alias_key"),
                                         F.col("canonical_name")))
    )
    cands = exact.unionByName(fuzzy)
    top = (
        cands.groupBy("mention_id")
        .agg(F.min(F.struct((-F.col("link_score")).alias("neg_score"),
                            F.col("entity_id").alias("eid"))).alias("best"))
        .select("mention_id",
                F.col("best.eid").alias("entity_id"),
                (-F.col("best.neg_score")).alias("score"))
    )
    return top.withColumn("linked", F.col("score") > F.lit(K.LINK_THRESHOLD))


CC_SCHEMA = T.StructType([
    T.StructField("entity_id", T.StringType()),
    T.StructField("canonical_id", T.StringType()),
])


def canonicalize(entities: DataFrame) -> DataFrame:
    """Connected components over a blocked similarity self-join.

    Blocking: the first-4-chars prefix of the normalized name. Because every
    similarity edge requires a shared block, no component crosses blocks —
    so global CC reduces to *block-local* union-find, one shuffle on the
    block key and zero iterations (the same shape as the reference's
    per-page fixpoint bbox merge, `group_cls.py:60-144`, run per group).
    The pair generation + scoring happens inside the group kernel, so the
    quadratic work is bounded by block size; a pathologically hot block is
    an AQE-splittable group only if we re-block — for identifier-shaped
    names prefix blocks stay small (monitored via lineage row counts).
    For genuinely cross-block graphs use
    :func:`cosmos_spark.operators.graph.connected_components` (iterative).
    """
    e = entities.select(
        "entity_id", "canonical_name",
        F.substring("canonical_name", 1, 4).alias("block"),
    )
    canon = e.groupBy("block").applyInPandas(
        lambda pdf: K.cc_block_kernel(pdf), CC_SCHEMA)
    return entities.join(canon, "entity_id", "left")


_PRED_FOR_KIND = {"def": "defines", "import": "imports", "call": "calls"}


def triples_of(
    segments: DataFrame,
    mentions: DataFrame,
    links: DataFrame,
    entities_canon: DataFrame,
    run_id: str = "run0",
) -> DataFrame:
    m = mentions.withColumn(
        "subj", F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"),
                            F.lit("#"), F.col("seg_id")))

    pred_map = F.create_map(
        *[F.lit(x) for kv in _PRED_FOR_KIND.items() for x in kv])
    base = (
        m.filter(F.col("mention_kind").isin(*_PRED_FOR_KIND))
        .select("subj", pred_map[F.col("mention_kind")].alias("pred"),
                F.col("mention_text").alias("obj"), "repo", "score")
    )
    ment = (
        links.filter(F.col("linked"))
        .join(m.select("mention_id", "subj", "repo"), "mention_id")
        .select("subj", F.lit("mentions").alias("pred"),
                F.col("entity_id").alias("obj"), "repo", "score")
    )
    member = (
        segments.select(
            "repo", "path",
            F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"),
                        F.lit("#"), F.col("seg_id")).alias("subj"))
        .dropDuplicates(["subj"])
        .select("subj", F.lit("member_of").alias("pred"),
                F.concat_ws("/", "repo", "path").alias("obj"),
                "repo", F.lit(1.0).alias("score"))
    )
    same = (
        entities_canon.filter(F.col("entity_id") != F.col("canonical_id"))
        .select(F.col("entity_id").alias("subj"),
                F.lit("same_as").alias("pred"),
                F.col("canonical_id").alias("obj"),
                F.lit("*").alias("repo"), F.lit(1.0).alias("score"))
    )
    t = base.unionByName(ment).unionByName(member).unionByName(same)
    # dedup keeping max score: hash aggregate (map-side partial combine),
    # not a sort window — the cheapest possible (subj,pred,obj) dedup.
    # repo is functionally dependent on (subj,pred): min() is a no-op pick.
    return (
        t.groupBy("subj", "pred", "obj")
        .agg(F.max("score").alias("score"), F.min("repo").alias("repo"))
        .select("subj", "pred", "obj", "repo", "score")
        .withColumn("provenance",
                    F.concat(F.lit(f"triples@{run_id}:"),
                             F.spark_partition_id().cast("string")))
    )


def run_pipeline(spark: SparkSession, source: DataFrame,
                 run_id: str = "run0",
                 persist_intermediates: bool = True) -> dict[str, DataFrame]:
    """Lazy end-to-end plan (no checkpointing — see plans.lineage for the
    resumable runner). ``mentions`` feeds four downstream branches
    (entities, links, triple base, member edges), so it is persisted by
    default — otherwise every branch re-runs the scan->segment->mention
    front-end (the at-scale runner materializes stages to parquet instead)."""
    segments = segments_of(source)
    mentions = mentions_of(segments)
    if persist_intermediates:
        from pyspark import StorageLevel
        segments = segments.persist(StorageLevel.MEMORY_AND_DISK)
        mentions = mentions.persist(StorageLevel.MEMORY_AND_DISK)
    entities, aliases = entities_and_aliases(mentions)
    links = link_mentions(mentions, aliases)
    entities_canon = canonicalize(entities)
    triples = triples_of(segments, mentions, links, entities_canon,
                         run_id=run_id)
    return {
        "segments": segments,
        "mentions": mentions,
        "entities": entities_canon,
        "aliases": aliases,
        "links": links,
        "triples": triples,
    }


def write_triples(triples: DataFrame, path: str) -> None:
    """Partitioned graph sink. Partition by ``pred`` (6 stable values, never
    skew-explodes metadata the way per-repo partitioning would at 10^12
    files); within a partition, sort by (repo, subj) so per-repo reads are
    clustered (the parquet-dir stand-in for an Iceberg writeTo with
    bucket(repo) — SURVEY §1.1)."""
    (
        triples.repartition("pred")
        .sortWithinPartitions("repo", "subj")
        .write.mode("overwrite")
        .partitionBy("pred")
        .parquet(path)
    )
