#!/usr/bin/env python
"""Two-parallelism scaling evidence for the round-4 GOVERNANCE/QUALITY
operator wave (supplementary to scripts/scaling_bench.py — the KG
pipeline pair that carries the north rule's primary criterion).

Job: the corpus-governance recipe chained the way a code-corpus build
chains it — license detection + repo-majority propagation, Gopher-style
repetition stats, bigram-LM quality scoring, and content-defined
chunking with a chunk-duplication rollup — i.e. the operator families
round 4 added beyond the reference. Same pinning/interleaving
methodology as the other pairs (taskset to N and 4N CPUs, min of
interleaved repeats, input materialized before the timed region).

Usage: python scripts/govern_scaling_bench.py [--n 2]
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
from cosmos_spark.operators.dedup import cdc_chunks
from cosmos_spark.operators.repostats import (
    PERMISSIVE_LICENSES, bigram_lm_score, detect_license,
    propagate_repo_license)

cpus = {cpus}
spark = get_spark(app_name="govern_scaling_c%d" % cpus,
                  master="local[%d]" % cpus,
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")

src = make_corpus_spark(spark, n_repos=10, files_per_repo={files_per_repo},
                        skew_factor=20, seed=42,
                        partitions=max(cpus * 4, 32))
src = src.persist(StorageLevel.MEMORY_AND_DISK)
n_files = src.count()

t0 = time.monotonic()
# 1. license detect + repo-majority propagation + permissive keep
lic = src.withColumn("file_license", detect_license(F.col("content")))
rl = propagate_repo_license(lic)
# carry (not filter on) the keep decision: the synthetic corpus plants
# no license headers, so the measured work is detect + vote + broadcast
# join — the decision column itself is free
gated = (lic.join(F.broadcast(rl), "repo")
         .withColumn("lic_keep",
                     F.coalesce("file_license", "repo_license")
                     .isin(*PERMISSIVE_LICENSES)))
# 2. Gopher-style repetition stats (dup-bigram fraction via two
# map-side-combined aggs), inline on the gated relation
ws = gated.select("repo", "path", "content",
                  F.expr(r"regexp_extract_all(lower(content), '\\S+', 0)")
                  .alias("w"))
bi = (ws.filter(F.size("w") >= 2)
      .select("repo", "path",
              F.expr("explode(transform(sequence(0, size(w)-2), "
                     "i -> concat(w[i], ' ', w[i+1])))").alias("b")))
rep = (bi.groupBy("repo", "path")
       .agg(F.count(F.lit(1)).alias("n_bi"),
            F.count_distinct("b").alias("n_d")))
# 3. bigram-LM quality scoring over (repo|path)-keyed docs — code
# identifiers make the bigram vocabulary corpus-sized here, so this
# exercises the documented broadcast_model=False escape hatch (hash
# joins, AQE-chosen)
docs = gated.select(F.concat_ws("|", "repo", "path").alias("doc_id"),
                    F.col("content").alias("text"))
lm = bigram_lm_score(docs, broadcast_model=False)
n_scored = lm.count()
# 4. content-defined chunking + chunk-duplication rollup
ch = cdc_chunks(docs, id_col="doc_id", text_col="text")
dup_chunks = (ch.groupBy("chunk_hash")
              .agg(F.count_distinct("id").alias("nd"))
              .where(F.col("nd") >= 2).count())
n_rep = rep.count()
sec = time.monotonic() - t0
print("RESULT " + json.dumps({{
    "cpus": cpus, "sec": sec, "n_files": n_files,
    "n_scored": n_scored, "n_rep": n_rep,
    "n_dup_chunk_hashes": dup_chunks}}))
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
    ap.add_argument("--out", default="govern_scaling_r4.json")
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
