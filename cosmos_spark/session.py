"""SparkSession factory.

One place to pin the configs that matter at 100 TB:

- Arrow on for every pandas UDF hop (the reference moved state between
  stages as pickle files on shared disk, `cosmos/ingestion/ingest/ingest.py:325-331`;
  we move it as Arrow record batches inside one lazy plan).
- AQE on: post-shuffle coalescing + skew-join splitting replace the
  reference's hand-tuned 2000-page Dask chunks (`ingest.py:94,119`).
- shuffle partitions sized ~= cores locally; on a real cluster this is
  set per-job (AQE coalesces down, so oversizing is safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The portable engine conf — everything that is NOT process topology.
# Shared by the local factory below and the spark-submit entrypoint
# (scripts/submit_kg.py), where master/executors/driver-memory come from
# spark-submit flags instead.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "cosmos_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard conf."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else max(cpus, 8)
    driver_mem = os.environ.get("SPARK_DRIVER_MEMORY", "8g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", driver_mem)
        # Pin Xms=Xmx + pre-touch: a lazily grown multi-GB heap page-faults
        # on every young-gen allocation wave (kernel page zeroing showed up
        # as >50% system time and erased all scaling beyond ~8 threads on
        # this host — measured 18.1s -> 1.4s on a 32-thread sha2 burn).
        .config("spark.driver.extraJavaOptions",
                f"-Xms{driver_mem} -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # make the engine's pluggable source available everywhere
    # (idempotent; re-registration replaces the same name)
    from .sources.corpus_source import CorpusDataSource
    spark.dataSource.register(CorpusDataSource)
    return spark
