#!/usr/bin/env python
"""Two-parallelism scaling evidence for the TRAINING-DATA pipeline path
(supplementary to scripts/scaling_bench.py, which covers the KG
pipeline — the north rule's primary criterion).

Job: the end-to-end data recipe over the synthetic corpus — exact
dedup (content-hash groupBy), token/quality accounting, deterministic
weighted mixture sampling, per-repo KMV vocabulary sketches, and one
per-source rollup — i.e. the operator families rounds 2-3 added beyond
the reference (dedup / sampling / sketches), chained the way a real
corpus build chains them. Same pinning/interleaving methodology as the
other pairs (taskset to N and 4N CPUs, min of repeats, input
materialized before the timed region).

Usage: python scripts/datapipe_scaling_bench.py [--n 2]
       [--files-per-repo 40000] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import pyspark.sql.functions as F
from pyspark import StorageLevel
from cosmos_spark.session import get_spark
from cosmos_spark.corpus import make_corpus_spark
from cosmos_spark.operators import sampling, sketch

cpus = {cpus}
spark = get_spark(app_name="datapipe_scaling_c%d" % cpus,
                  master="local[%d]" % cpus,
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")

src = make_corpus_spark(spark, n_repos=10, files_per_repo={files_per_repo},
                        skew_factor=20, seed=42,
                        partitions=max(cpus * 4, 32))
src = src.persist(StorageLevel.MEMORY_AND_DISK)
n_files = src.count()

t0 = time.monotonic()
# 1. exact dedup: keep the lowest path per content hash
keep = (src.groupBy(F.col("content_sha256").alias("h"))
        .agg(F.min(F.concat_ws("|", "repo", "path")).alias("k")))
dd = (src.withColumn("k", F.concat_ws("|", "repo", "path"))
      .join(keep.select("k"), "k", "left_semi").drop("k"))
# 2. quality gate + token accounting (JVM exprs)
toks = r"size(regexp_extract_all(content, '\\S+', 0))"
qual = dd.withColumn("n_toks", F.expr(toks)).where(F.col("n_toks") >= 5)
# 3. weighted mixture sampling: downsample the skewed monorepo to 0.25
w = F.when(F.col("repo") == F.lit("org0/repo_00"), F.lit(0.25)).otherwise(
    F.lit(1.0))
sampled = sampling.mixture_sample(
    qual.withColumn("w", w).withColumn("rid", F.concat_ws("|", "repo",
                                                          "path")),
    "rid", "w")
# 4. per-repo KMV vocabulary sketch over the sampled text
sk = sketch.kmv_sketch_ngrams(sampled.select("repo", F.col("content")
                                             .alias("text")),
                              "repo", "text", ns={{"uni": 1}}, k=128)
n_sketches = sk.count()
# 5. per-source rollup
roll = (sampled.groupBy("repo")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_toks").alias("n_tokens")).collect())
sec = time.monotonic() - t0
n_docs = sum(r["n_docs"] for r in roll)
print("RESULT " + json.dumps({{
    "cpus": cpus, "sec": sec, "n_files": n_files,
    "n_sampled_docs": n_docs, "n_sketches": n_sketches}}))
spark.stop()
"""


def _run_pinned(code: str, ncpus: int, timeout: int = 3600) -> dict:
    cmd = ["taskset", "-c", f"0-{ncpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=timeout)
    for line in out.stdout.replace("\r", "\n").splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT at {ncpus} cpus:\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--files-per-repo", type=int, default=40000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default="datapipe_scaling_r3.json")
    args = ap.parse_args()

    t_start = time.monotonic()
    lo = hi = None  # interleaved so host drift hits both levels equally
    for _ in range(args.repeats):
        for cpus in (args.n, args.n * 4):
            code = RUNNER.format(repo=REPO, cpus=cpus,
                                 files_per_repo=args.files_per_repo)
            r = _run_pinned(code, cpus)
            if cpus == args.n:
                lo = r if lo is None or r["sec"] < lo["sec"] else lo
            else:
                hi = r if hi is None or r["sec"] < hi["sec"] else hi

    thr_lo = lo["n_files"] / lo["sec"]
    thr_hi = hi["n_files"] / hi["sec"]
    eff = (thr_hi / thr_lo) / 4
    result = {
        "lo": lo, "hi": hi,
        "files_per_sec": {str(args.n): round(thr_lo, 1),
                          str(args.n * 4): round(thr_hi, 1)},
        "efficiency": round(eff, 3),
        "wall_total_sec": round(time.monotonic() - t_start, 1),
    }
    out_path = (args.out if os.sep in args.out
                else os.path.join(REPO, "BENCH", args.out))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
