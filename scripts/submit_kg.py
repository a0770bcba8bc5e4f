#!/usr/bin/env python
"""spark-submit entrypoint for the KG-construction job.

This is the cluster-deployment surface the north rule names: the same
artifact runs at N and 4N executors with only spark-submit flags changing.

Packaging + launch::

    cd <repo> && zip -qr /tmp/cosmos_spark.zip cosmos_spark
    spark-submit --master <cluster-master> \\
        --num-executors 16 --executor-cores 4 --executor-memory 8g \\
        --py-files /tmp/cosmos_spark.zip \\
        scripts/submit_kg.py --source s3://.../source_table \\
        --output s3://.../graph --workdir s3://.../checkpoints/run7

The script never sets a master or sizes the driver: process topology
comes entirely from spark-submit (``--master`` / ``--num-executors`` /
``--executor-cores`` / ``--driver-memory``), which is exactly what lets
one artifact produce the N-vs-4N scaling pair. Only the portable
engine conf (:data:`cosmos_spark.session.ENGINE_CONF` — AQE, Arrow,
broadcast threshold) is applied in-app.

Modes:
- default: one lazy end-to-end plan (``pipeline.run_pipeline``).
- ``--workdir``: the checkpointed resumable runner
  (``plans.lineage.run_resumable``) — each stage materializes with a
  lineage fingerprint; re-submitting after a kill skips every completed
  stage.
- ``--graph``: write the whole queryable catalog (triples + nodes +
  documents rollup) instead of just the triples table.
- ``--versioned``: the incremental-maintenance deployment
  (``plans.incremental``): first submit builds the versioned graph
  (``--cluster-buckets N`` declares the Iceberg-style bucket layout the
  surgery reads prune against); every later submit against the same
  ``--output`` absorbs the source as a delta (unchanged-sha rows skip,
  changed/new files patch the graph exactly) — the daily-crawl recipe.

Prints one JSON metrics line on stdout (file/triple counts, wall time,
throughput) — the per-run record the scaling evidence consumes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_session():
    """Session from spark-submit's topology + the portable engine conf."""
    from pyspark.sql import SparkSession

    from cosmos_spark.session import ENGINE_CONF

    builder = SparkSession.builder.appName("cosmos_kg_submit")
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src_group = p.add_mutually_exclusive_group(required=True)
    src_group.add_argument(
        "--source",
        help="parquet/table dir with (repo, path, commit, lang, content)")
    src_group.add_argument(
        "--synthetic-files-per-repo", type=int, metavar="N",
        help="generate the deterministic benchmark corpus (10 repos x N "
             "files, 20x skewed monorepo) instead of reading --source")
    p.add_argument("--output", required=True,
                   help="sink dir (triples table, or catalog root with "
                        "--graph)")
    p.add_argument("--workdir",
                   help="checkpoint root: enables the resumable runner")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--graph", action="store_true",
                   help="write triples + nodes + documents catalog tables")
    p.add_argument("--versioned", action="store_true",
                   help="build/update the incremental versioned graph at "
                        "--output (build on first submit, exact delta "
                        "update on re-submit)")
    p.add_argument("--cluster-buckets", type=int, default=None,
                   metavar="N",
                   help="with --versioned, declare bucket(N, key) "
                        "clustering on the maintenance tables so "
                        "incremental surgery reads prune to the delta's "
                        "storage buckets")
    p.add_argument("--source-partitions", type=int, default=None,
                   help="repartition the synthetic corpus generator "
                        "(default: 4x defaultParallelism)")
    p.add_argument("--no-stop", action="store_true",
                   help=argparse.SUPPRESS)  # tests reuse the session
    args = p.parse_args(argv)
    if args.versioned and (args.workdir or args.graph):
        # the versioned path has its own resume story (delta absorption
        # via the catalog manifest) and graph layout (inc.* tables) —
        # silently dropping these flags misled resubmits into full
        # rebuilds, so refuse the combination loudly
        p.error("--versioned handles resume/output via the catalog at "
                "--output; it is mutually exclusive with --workdir and "
                "--graph")

    spark = build_session()
    sc = spark.sparkContext

    from cosmos_spark import pipeline as P

    if args.source:
        source = spark.read.parquet(args.source)
    else:
        from cosmos_spark.corpus import make_corpus_spark
        parts = args.source_partitions or sc.defaultParallelism * 4
        source = make_corpus_spark(
            spark, n_repos=10,
            files_per_repo=args.synthetic_files_per_repo,
            skew_factor=20, seed=42, partitions=parts)

    if args.versioned:
        from cosmos_spark.plans import incremental as I
        from cosmos_spark.sources.catalog import Catalog
        cat = Catalog(spark, args.output)
        t0 = time.monotonic()
        if cat.snapshots("inc.manifest"):
            stats = I.update_graph(spark, cat, source,
                                   run_id=args.run_id,
                                   collect_stats=False)
            op = f"update[{stats['canon_mode']}]"
        else:
            I.build_graph(spark, source, cat, run_id=args.run_id,
                          cluster_buckets=args.cluster_buckets)
            op = "build"
        n_triples = I.triples_view(cat).count()
        wall = time.monotonic() - t0
        n_files = source.count()
        print(json.dumps({
            "job": "cosmos_kg_submit", "mode": op,
            "master": sc.master,
            "default_parallelism": sc.defaultParallelism,
            "cluster_buckets": args.cluster_buckets,
            "n_source_files": n_files, "n_triples": n_triples,
            "wall_sec": round(wall, 3),
            "triples_per_sec": (round(n_triples / wall, 1)
                                if wall else None),
            "output": args.output,
        }))
        if not args.no_stop:
            spark.stop()
        return

    t0 = time.monotonic()
    if args.workdir:
        from cosmos_spark.plans.lineage import run_resumable
        res = run_resumable(spark, source, args.workdir,
                            run_id=args.run_id)
        # adapt the stage-keyed resumable output to run_pipeline's shape
        # (the checkpointed entities_canon drops the array columns for the
        # stage parquet; the nodes table re-joins them from the entities
        # dim stage)
        result = {
            "segments": res["segments"],
            "mentions": res["mentions"],
            "entities": res["entities_aliases"].join(
                res["entities_canon"].select("entity_id", "canonical_id"),
                "entity_id"),
            "triples": res["triples"],
        }
    else:
        result = P.run_pipeline(spark, source, run_id=args.run_id)

    if args.graph:
        from cosmos_spark.sources.catalog import Catalog
        cat = Catalog(spark, args.output)
        P.write_graph(result, cat)
        n_triples = cat.read("graph.triples").count()
    else:
        P.write_triples(result["triples"], args.output)
        n_triples = spark.read.parquet(args.output).count()
    wall = time.monotonic() - t0

    n_files = source.count()
    print(json.dumps({
        "job": "cosmos_kg_submit",
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "resumable": bool(args.workdir),
        "n_source_files": n_files,
        "n_triples": n_triples,
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(n_triples / wall, 1) if wall else None,
        "output": args.output,
    }))
    if not args.no_stop:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
