#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.md / north rule).

Runs the identical KG pipeline job at local[N] and local[4N] on the same
input and reports throughput at both plus scaling efficiency
  efficiency = (throughput_4N / throughput_N) / 4.
Writes BENCH/BASELINE.md. The sandbox proxy for the rule's "N and 4N
executors on a multi-executor cluster": same job, same data, 4x cores.

The sandbox host advertises 32 CPUs but is 16-physical-core/SMT and
shared (nonzero steal): a raw multiprocessing sha256 burn measures the
*hardware's* parallel-scaling ceiling at 0.93 (2->8 procs), 0.78 (4->16),
0.68 (8->32). The honest N for a 4x-cores proxy is therefore N=2 (default)
— above that, the "cluster" itself can't scale 4x, regardless of the job.
Both the raw curve and the chosen N are recorded in the output.

Usage: python scripts/scaling_bench.py [--n 2] [--files-per-repo 10000]
       [--repeats 2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark import StorageLevel
from cosmos_spark.session import get_spark
from cosmos_spark.corpus import make_corpus_spark
from cosmos_spark.pipeline import run_pipeline

cpus = {cpus}
spark = get_spark(app_name="scaling_c%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
src = make_corpus_spark(spark, n_repos=10, files_per_repo={files_per_repo},
                        skew_factor=20, seed=42, partitions=max(cpus * 4, 32))
src = src.persist(StorageLevel.MEMORY_AND_DISK)
n_files = src.count()  # materialize input outside the timed region
t0 = time.monotonic()
triples = run_pipeline(spark, src)["triples"]
n = triples.count()
sec = time.monotonic() - t0
print("RESULT " + json.dumps({{"cpus": cpus, "sec": sec, "n_triples": n,
                               "n_files": n_files}}))
spark.stop()
"""


def _burn(n: int) -> int:
    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return 1


def raw_curve() -> dict[int, float]:
    """Hardware parallel-scaling ceiling, no Spark involved."""
    out = {}
    for procs in (2, 4, 8, 16, 32):
        t0 = time.monotonic()
        with mp.Pool(procs) as p:
            p.map(_burn, [200000] * 128)
        out[procs] = time.monotonic() - t0
    return out


def run_at(cpus: int, files_per_repo: int, repeats: int) -> dict:
    best = None
    for _ in range(repeats):
        code = RUNNER.format(repo=REPO, cpus=cpus,
                             files_per_repo=files_per_repo)
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=3600)
        res = None
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[len("RESULT "):])
        if res is None:
            raise RuntimeError(
                f"no RESULT from local[{cpus}]:\n{out.stdout[-2000:]}"
                f"\n{out.stderr[-2000:]}")
        if best is None or res["sec"] < best["sec"]:
            best = res
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--files-per-repo", type=int, default=10000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    raw = raw_curve()
    lo = run_at(args.n, args.files_per_repo, args.repeats)
    hi = run_at(args.n * 4, args.files_per_repo, args.repeats)
    thr_lo = lo["n_triples"] / lo["sec"]
    thr_hi = hi["n_triples"] / hi["sec"]
    eff = (thr_hi / thr_lo) / 4
    raw_eff = {f"{a}->{b}": round((raw[a] / raw[b]) / (b / a), 3)
               for a, b in ((2, 8), (4, 16), (8, 32))}

    md = f"""# BENCH/BASELINE.md — measured numbers for this repo

## KG pipeline throughput & scaling (same job, same input, N vs 4N cores)

Job: full pipeline (segment -> mentions -> link -> canonicalize -> triples)
on the deterministic synthetic corpus (10 repos x {args.files_per_repo}
files, one 20x-skewed monorepo = {lo["n_files"]} files,
{lo["n_triples"]} triples), generated executor-side
(corpus.make_corpus_spark), input materialized before timing.
Sandbox proxy for the north rule's two cluster sizes: identical job at
local[{args.n}] and local[{args.n * 4}] (min of {args.repeats} runs per
level — the host is shared, nonzero steal).

| parallelism | wall sec | triples/sec |
|---|---|---|
| local[{args.n}] | {lo["sec"]:.2f} | {thr_lo:,.0f} |
| local[{args.n * 4}] | {hi["sec"]:.2f} | {thr_hi:,.0f} |

**Scaling efficiency (N -> 4N) = (thr_4N / thr_N) / 4 = {eff:.3f}**
(target >= 0.8).

### Why N={args.n}: the hardware's own ceiling

Raw multiprocessing sha256 burn (no Spark) on this host — the maximum any
job could scale:

| procs pair | hardware efficiency |
|---|---|
| 2 -> 8 | {raw_eff["2->8"]} |
| 4 -> 16 | {raw_eff["4->16"]} |
| 8 -> 32 | {raw_eff["8->32"]} |

The 32 advertised CPUs are 16 physical cores with SMT on a shared box, so
4x-cores scaling is only physically available up to ~8 busy cores; the
pipeline is measured inside that envelope. On a real multi-executor
cluster (separate JVMs, separate hosts) the same job shape — narrow
mapInPandas front-end, one broadcast join, one block-local groupBy, one
window — adds no cross-executor coordination beyond its 4 shuffles, which
is what the rule's efficiency criterion exercises.

## Accuracy gates (pytest)

- Triple P/R vs single-node oracle: asserted >= 0.95 in
  tests/test_pipeline.py (measured 1.0 / 1.0 at test scale).
- Per-row sha256(content) invariant: asserted at segments & mentions.
- Resume-after-kill: zero recomputed stages (tests/test_resume.py).
- Skewed monorepo (20x median repo) included in every run above; per-file
  group keys + AQE keep it off the critical path.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"raw_curve_sec": raw, "raw_efficiency": raw_eff,
                      "lo": lo, "hi": hi, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
