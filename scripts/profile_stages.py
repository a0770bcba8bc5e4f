#!/usr/bin/env python
"""Per-stage wall-time profile of the KG pipeline at one parallelism level.

Usage: python scripts/profile_stages.py <cpus> [files_per_repo]
Prints RESULT json with per-stage seconds so scaling bottlenecks are
attributable (front-end mapInPandas vs shuffles vs driver-side overhead).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fpr = int(sys.argv[2]) if len(sys.argv) > 2 else 10000

    from pyspark import StorageLevel

    from cosmos_spark.corpus import make_corpus_spark
    from cosmos_spark import pipeline as P
    from cosmos_spark.session import get_spark

    spark = get_spark(app_name=f"profile_c{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    src = make_corpus_spark(spark, n_repos=10, files_per_repo=fpr,
                            skew_factor=20, seed=42,
                            partitions=max(cpus * 4, 32))
    src = src.persist(StorageLevel.MEMORY_AND_DISK)
    n_files = src.count()

    t: dict[str, float] = {}
    t_all0 = time.monotonic()

    t0 = time.monotonic()
    segments = P.segments_of(src).persist(StorageLevel.MEMORY_AND_DISK)
    n_segs = segments.count()
    t["segments"] = time.monotonic() - t0

    t0 = time.monotonic()
    mentions = P.mentions_of(segments).persist(StorageLevel.MEMORY_AND_DISK)
    n_ment = mentions.count()
    t["mentions"] = time.monotonic() - t0

    t0 = time.monotonic()
    entities, aliases = P.entities_and_aliases(mentions)
    entities = entities.persist(StorageLevel.MEMORY_AND_DISK)
    aliases = aliases.persist(StorageLevel.MEMORY_AND_DISK)
    n_ent = entities.count()
    n_ali = aliases.count()
    t["entities_aliases"] = time.monotonic() - t0

    t0 = time.monotonic()
    links = P.link_mentions(mentions, aliases)
    n_links = links.count()
    t["links"] = time.monotonic() - t0

    t0 = time.monotonic()
    entities_canon = P.canonicalize(entities)
    n_canon = entities_canon.count()
    t["canonicalize"] = time.monotonic() - t0

    t0 = time.monotonic()
    triples = P.triples_of(segments, mentions, links, entities_canon)
    n_triples = triples.count()
    t["triples"] = time.monotonic() - t0

    t["total"] = time.monotonic() - t_all0
    print("RESULT " + json.dumps({
        "cpus": cpus, "stages": {k: round(v, 2) for k, v in t.items()},
        "counts": {"files": n_files, "segments": n_segs, "mentions": n_ment,
                   "entities": n_ent, "aliases": n_ali, "links": n_links,
                   "canon": n_canon, "triples": n_triples},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
