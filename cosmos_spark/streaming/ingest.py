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
