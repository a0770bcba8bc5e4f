"""Structured-Streaming ingestion.

The reference is strictly batch — its only queue is an asyncio job queue
feeding subprocesses (`cosmos_service/src/work_queue.py:15-38`), so SURVEY
§2.11 records no streaming operators to reproduce. This module exists for
the *engine* to be usable in continuous mode: the same mapInPandas kernels
run unchanged on a streaming DataFrame (segmentation and mention detection
are stateless row-local transforms), and the only stateful piece — mention
counts — is a watermarked windowed aggregation.

Pattern: ``readStream`` (file source over the source-table directory; on a
real deployment: Kafka/Iceberg CDC) -> kernels -> ``writeStream`` with
``availableNow`` for catch-up batches or continuous triggers for tailing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .. import pipeline as P

SOURCE_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
    T.StructField("ingested_at", T.TimestampType()),
])


def stream_segments(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of source rows -> streaming segments DataFrame.
    The batch kernels apply verbatim: mapInPandas is stateless."""
    src = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .parquet(source_dir)
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )
    return P.segments_of(src)


def stream_mention_counts(spark: SparkSession, source_dir: str,
                          window: str = "1 minute",
                          watermark: str = "2 minutes") -> DataFrame:
    """Windowed mention counts per kind with late-data watermark — the
    stateful-aggregation shape (counts analog of A6 class counters)."""
    src = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .parquet(source_dir)
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )
    segs = P.segments_of(src.drop("ingested_at"))
    # re-attach event time by joining is overkill for counts; file sources
    # carry ingested_at on the row — propagate it through the kernel input
    mentions = P.mentions_of(segs)
    # streaming aggregations need an event-time column: stamp arrival time
    stamped = mentions.withColumn("event_time", F.current_timestamp())
    return (
        stamped.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"),
                 F.col("mention_kind"))
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select("win.start", "win.end", "mention_kind", "n_mentions")
    )


def stream_triples(spark: SparkSession, source_dir: str,
                   aliases: DataFrame | None = None) -> DataFrame:
    """Continuous KG construction: a streaming source table -> the SAME
    fused segmentation+mention kernel -> append-mode triples.

    Emits the stateless families — defines/imports/calls from mentions,
    member_of from the per-segment markers, and (when a *static* alias
    dim is supplied) the mentions family via a stream-static broadcast
    join (`link_mentions` unchanged: its window runs on the static alias
    side, the stream side only ever map-side-joins). Canonicalization
    (same_as) stays batch — it is a global fixpoint over the entity dim,
    recomputed per snapshot, not a row-incremental operator."""
    import pyspark.sql.functions as F  # noqa: F811 (local alias clarity)

    from .. import pipeline as P

    src = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .parquet(source_dir)
        .drop("ingested_at")
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )
    fused = P.fused_mentions_of(src)
    mentions = fused.filter(F.col("mention_kind") != P.SEG_MARKER)
    markers = fused.filter(F.col("mention_kind") == P.SEG_MARKER)

    subj = F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"),
                       F.lit("#"), F.col("seg_id"))
    pred_map = F.create_map(*[
        F.lit(x) for kv in P._PRED_FOR_KIND.items() for x in kv])
    base = (
        mentions.filter(F.col("mention_kind").isin(*P._PRED_FOR_KIND))
        .select(subj.alias("subj"),
                pred_map[F.col("mention_kind")].alias("pred"),
                F.col("mention_text").alias("obj"), "repo", "score")
    )
    member = markers.select(
        subj.alias("subj"), F.lit("member_of").alias("pred"),
        F.concat_ws("/", "repo", "path").alias("obj"),
        "repo", F.lit(1.0).alias("score"))
    out = base.unionByName(member)
    if aliases is not None:
        links = P.link_mentions(mentions, aliases)
        ment = (
            links.filter(F.col("linked") & F.col("link_rep"))
            .select(F.concat_ws("", F.col("repo"), F.lit("/"),
                                F.col("path"), F.lit("#"),
                                F.col("seg_id")).alias("subj"),
                    F.lit("mentions").alias("pred"),
                    F.col("entity_id").alias("obj"), "repo", "score")
        )
        out = out.unionByName(ment)
    return out


FIRST_SEEN_OUTPUT = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("n_new", T.LongType()),
    T.StructField("n_dup", T.LongType()),
    T.StructField("n_seen_total", T.LongType()),
])

FIRST_SEEN_STATE = T.StructType([
    T.StructField("hashes", T.ArrayType(T.StringType())),
])


def stream_first_seen(spark: SparkSession, source_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-repo streaming exact-dedup counters. The group state holds the set
    of content hashes seen so far; each micro-batch emits how many rows
    were first-seen vs duplicate.

    This is the S10 job-cache / U4 dedup analog in continuous mode. Scale
    note: the in-state hash set is the demonstration layout — at 100 TB
    the state store (RocksDB on executors) holds it fine per-repo-shard,
    but an unbounded-retention deployment would swap the exact set for a
    bloom filter or attach a state TTL (``GroupStateTimeout``)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .parquet(source_dir)
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )

    def fn(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        n_new = n_dup = 0
        for pdf in pdfs:
            for h in pdf["content_sha256"]:
                if h in seen:
                    n_dup += 1
                else:
                    seen.add(h)
                    n_new += 1
        state.update((sorted(seen),))
        yield pd.DataFrame([{"repo": key[0], "n_new": n_new,
                             "n_dup": n_dup, "n_seen_total": len(seen)}])

    return (
        src.groupBy("repo")
        .applyInPandasWithState(fn, FIRST_SEEN_OUTPUT, FIRST_SEEN_STATE,
                                "append", GroupStateTimeout.NoTimeout)
    )


def run_stream_once(stream_df: DataFrame, checkpoint_dir: str,
                    out_dir: str | None = None) -> None:
    """Drain all available input with availableNow (the test/catch-up
    trigger), writing to memory or parquet."""
    writer = stream_df.writeStream.option("checkpointLocation", checkpoint_dir)
    if out_dir:
        q = (writer.outputMode("append").format("parquet")
             .option("path", out_dir).trigger(availableNow=True).start())
    else:
        q = (writer.outputMode("complete").format("memory")
             .queryName("mention_counts").trigger(availableNow=True).start())
    q.awaitTermination()
