#!/usr/bin/env python
"""Benchmark harness.

Runs (1) the headline KG-construction pipeline on a deterministic synthetic
source corpus sized to the scale factor, and (2) every driver-contract query
at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "kg": {"n_source_files": N, "n_triples": N, "triples_per_sec": N}}

The line is kept under ~1.6 KB (the recording harness retains only the
last ~2000 chars of output — the round-3 full-registry dict overflowed
that window and went unparsed): when the per-query dict would overflow,
the printed "queries" keeps the slowest entries and the COMPLETE payload
is written to BENCH/bench_last_full.json.

Scaling evidence (BASELINE.md: efficiency >= 0.8 between N and 4N cores) is
produced by scripts/scaling_bench.py, which invokes this file at two
parallelism levels.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)

    from pyspark import StorageLevel

    from cosmos_spark.corpus import make_corpus_spark
    from cosmos_spark.pipeline import run_pipeline
    from cosmos_spark.queries import QUERIES
    from cosmos_spark.session import get_spark

    spark = get_spark(app_name=f"cosmos_bench_c{cpus}",
                      master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}

    # --- headline: KG pipeline throughput (triples/sec) ---
    # corpus sized to sf, generated executor-side: sf0.1 -> ~58k files
    files_per_repo = max(int(20000 * sf), 4)
    src = make_corpus_spark(spark, n_repos=10,
                            files_per_repo=files_per_repo,
                            skew_factor=20, seed=42,
                            partitions=cpus * 4)
    src = src.persist(StorageLevel.MEMORY_AND_DISK)
    n_files = src.count()  # materialize input outside the timed region

    # Untimed warm-up on a small slice: forks the Python/Arrow worker
    # pool and JIT-compiles the codegen'd stages so the timed run below
    # measures steady-state throughput (the quantity that scales to the
    # full corpus), not one-time JVM/worker spin-up. The slice is capped
    # so warm-up stays a fraction of the timed work.
    warm = src.limit(min(2000, max(200, n_files // 20)))
    run_pipeline(spark, warm)["triples"].count()

    t0 = time.monotonic()
    triples = run_pipeline(spark, src)["triples"]
    n_triples = triples.count()
    kg_sec = time.monotonic() - t0
    times["kg_pipeline"] = round(kg_sec, 3)

    # sink-inclusive: the partitioned (pred-dirs, (pred,repo)-parallel)
    # graph write on top of the already-built plan
    import shutil
    import tempfile

    from cosmos_spark.pipeline import write_triples
    sink_dir = tempfile.mkdtemp(prefix="bench_sink_")
    t0 = time.monotonic()
    write_triples(triples, sink_dir)
    sink_sec = time.monotonic() - t0
    times["kg_sink"] = round(sink_sec, 3)
    shutil.rmtree(sink_dir, ignore_errors=True)
    spark.catalog.clearCache()  # release kg caches before the query suite

    # --- operator suite at the sf dir ---
    # input staging, same rule as the KG corpus above (materialized
    # outside the timed region): q_incremental_kg measures the delta
    # UPDATE operator, so its perturbed-V0 catalog — deterministic input,
    # not the operator — is prebuilt here (VERDICT r3 #1)
    from cosmos_spark.queries.catalogq import _prebuilt_v0_warehouse
    _prebuilt_v0_warehouse(spark, sf_dir)
    for name, (fn, _sql) in QUERIES.items():
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        times[name] = round(time.monotonic() - t0, 3)

    total = round(sum(times.values()), 3)
    kg = {
        "n_source_files": n_files,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / kg_sec, 1) if kg_sec else None,
        "kg_sec": round(kg_sec, 3),
        "sink_sec": round(sink_sec, 3),
        "triples_per_sec_with_sink": round(
            n_triples / (kg_sec + sink_sec), 1),
    }
    # The consumer of this line keeps only the LAST ~2000 chars of stdout
    # (BENCH_r03.json: the 93-query dict overflowed that window and the
    # line went unparsed). The full per-query dict therefore goes to a
    # FILE, and the printed line carries the headline numbers plus the
    # slowest queries, truncated to always fit the window.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH", "bench_last_full.json")
    payload = {
        "metric": "kg pipeline + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "n_queries": len(times),
        "kg": kg,
        "full": os.path.relpath(full_path,
                                os.path.dirname(os.path.abspath(__file__))),
    }
    try:
        with open(full_path, "w") as fh:
            json.dump(payload, fh)
    except OSError:
        pass  # read-only checkout: the printed line still carries the top-k
    line = json.dumps(payload)
    if len(line) > 1600:
        slowest = dict(sorted(times.items(), key=lambda kv: -kv[1]))
        while len(line) > 1600 and slowest:
            slowest.popitem()
            line = json.dumps({**payload, "queries": slowest,
                               "queries_omitted":
                                   len(times) - len(slowest)})
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
