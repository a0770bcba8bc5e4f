#!/usr/bin/env python
"""Per-stage decomposition of ONE incremental-update run at one pinned
parallelism level (the inc_scaling_bench small-delta job, instrumented
via ``update_graph(profile=...)``).

Run it back-to-back at 2 and 8 pinned CPUs and diff the per-stage walls:
a stage whose wall does not shrink 2->8 IS the serial term S of the
T(c)=P/c+S fit in BENCH/inc_scaling_r4_smalldelta_final.json.

Usage: taskset is applied INTERNALLY (subprocess), mirroring
scripts/inc_scaling_bench.py:
    python scripts/profile_inc.py --cpus 2 [--files-per-repo 24000]
        [--mod-every 20] [--cluster-buckets 64]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
import pyspark.sql.functions as F
from pyspark import StorageLevel
from cosmos_spark.session import get_spark
from cosmos_spark.corpus import make_corpus_spark
from cosmos_spark.plans import incremental as I
from cosmos_spark.sources import Catalog

cpus = {cpus}
spark = get_spark(app_name="inc_profile_c%d" % cpus,
                  master="local[%d]" % cpus,
                  shuffle_partitions=max(cpus, 8),
                  extra_conf={extra_conf!r})
spark.sparkContext.setLogLevel("ERROR")

v0 = make_corpus_spark(spark, n_repos=10, files_per_repo={files_per_repo},
                       skew_factor=20, seed=42,
                       partitions=max(cpus * 4, 32))
v0 = v0.persist(StorageLevel.MEMORY_AND_DISK)
n_files = v0.count()

changed = F.pmod(F.crc32(F.col("path")), F.lit({mod_every})) == 0
v1 = (v0.withColumn(
          "content",
          F.when(changed, F.concat(
              "content", F.lit("\ndef upd_"),
              F.pmod(F.crc32(F.col("path")), F.lit(999983)).cast("string"),
              F.lit("(x):\n    return x\n")))
          .otherwise(F.col("content")))
      .drop("content_sha256")
      .persist(StorageLevel.MEMORY_AND_DISK))
n_v1 = v1.count()

wh = tempfile.mkdtemp(prefix="inc_prof_wh_")
cat = Catalog(spark, wh)
I.build_graph(spark, v0, cat, cluster_buckets={cluster_buckets} or None)

prof = {{}}
t0 = time.monotonic()
stats = I.update_graph(spark, cat, v1, collect_stats=False,
                       canon_mode={canon_mode!r}, profile=prof)
sec = time.monotonic() - t0
shutil.rmtree(wh, ignore_errors=True)
print("RESULT " + json.dumps({{
    "cpus": cpus, "sec": round(sec, 2), "n_files": n_files,
    "n_delta_files": stats["n_delta_files"],
    "canon_mode": stats["canon_mode"],
    "profile": prof}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=2)
    ap.add_argument("--files-per-repo", type=int, default=24000)
    ap.add_argument("--mod-every", type=int, default=20)
    ap.add_argument("--canon-mode", default="incremental")
    ap.add_argument("--cluster-buckets", type=int, default=64)
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (repeatable)")
    args = ap.parse_args()

    extra = dict(c.split("=", 1) for c in args.conf)
    code = RUNNER.format(repo=REPO, cpus=args.cpus,
                         files_per_repo=args.files_per_repo,
                         mod_every=args.mod_every,
                         canon_mode=args.canon_mode,
                         cluster_buckets=args.cluster_buckets,
                         extra_conf=extra)
    cmd = ["taskset", "-c", f"0-{args.cpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.replace("\r", "\n").splitlines():
        if line.startswith("RESULT "):
            print(line)
            return
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:] + "\n")
    sys.exit(1)


if __name__ == "__main__":
    main()
