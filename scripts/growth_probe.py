#!/usr/bin/env python
"""Scale-growth probe (VERDICT r4 #7): run the most expensive contract
queries once at sf0.1 and once at a 10x synthetic blow-up of its
documents/events/embeddings tables, and report the wall ratio. The sf0.1
bench cannot see a plan cliff (quadratic pair blow-up, a window that
stops fitting, a broadcast that flips to shuffle); a 10x/1x wall ratio
well above ~12-15x would.

The 10x tables are deterministic and NON-degenerate:

- ``documents``: 10 replicas per row; each replica's text is re-ordered
  by a per-(doc_id, replica) hash sort of its words, so replicas are NOT
  near-duplicates of each other (word-shingle sets diverge) — a naive
  copy would manufacture quadratic LSH buckets that say nothing about
  real growth. Word multiset (and so length/quality stats) is preserved.
- ``events``: 10 replicas with shifted event_id/user_id — 10x users,
  same per-user session shape.
- ``embeddings``: 10 replicas with the vector rotated by replica index —
  same norm, new direction (no artificial exact-dup clusters).

All other tables are byte-copied. Output dir: /tmp/sf_x10 (recreated).

Usage: python scripts/growth_probe.py [--queries q_a,q_b,...] [--cpus 32]
Prints one RESULT json line: {query: {"t1": s, "t10": s, "ratio": r}}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = (
    "q_kg_defines,q_ngram_jaccard_pairs,q_bpe_train,q_stream_sessions,"
    "q_stream_join,q_graph_pagerank,q_cc_components,q_dup_spans,"
    "q_semantic_dedup,q_near_dedup"
)

REPLICAS = 10
SRC_SF = "/root/testdata/sf0.1"
OUT_DIR = "/tmp/sf_x10"


def build_x10(spark) -> None:
    import pyspark.sql.functions as F

    if os.path.isdir(OUT_DIR):
        shutil.rmtree(OUT_DIR)
    os.makedirs(OUT_DIR)
    rep = spark.range(REPLICAS).withColumnRenamed("id", "_rep")

    docs = spark.read.parquet(f"{SRC_SF}/documents.parquet")
    # per-replica deterministic word re-order: sort words by
    # xxhash64(word, position, doc_id, replica) — replica 0 included
    # (the probe compares growth, not byte equality with sf0.1)
    shuffled = (
        docs.crossJoin(F.broadcast(rep))
        .withColumn(
            "text",
            F.array_join(F.expr(
                "transform(array_sort(zip_with("
                "  split(text, ' '), sequence(1, size(split(text, ' '))),"
                "  (w, i) -> struct(xxhash64(w, i, doc_id, _rep) AS h,"
                "                   w AS w))), s -> s.w)"), " "))
        .withColumn("doc_id",
                    F.col("doc_id") + F.col("_rep") * F.lit(10_000_000))
        .withColumn("n_chars", F.length("text"))
        .drop("_rep"))
    shuffled.coalesce(8).write.parquet(f"{OUT_DIR}/documents.parquet")

    ev = spark.read.parquet(f"{SRC_SF}/events.parquet")
    (ev.crossJoin(F.broadcast(rep))
       .withColumn("event_id",
                   F.col("event_id") + F.col("_rep") * F.lit(1_000_000_000))
       .withColumn("user_id",
                   F.col("user_id") + F.col("_rep") * F.lit(10_000_000))
       .drop("_rep")
       .coalesce(8).write.parquet(f"{OUT_DIR}/events.parquet"))

    emb = spark.read.parquet(f"{SRC_SF}/embeddings.parquet")
    (emb.crossJoin(F.broadcast(rep))
        .withColumn(
            "embedding",
            F.expr("transform(sequence(0, size(embedding) - 1),"
                   " i -> embedding[int((i + _rep) % size(embedding))])"))
        .withColumn("vec_id",
                    F.col("vec_id") + F.col("_rep") * F.lit(10_000_000))
        .drop("_rep")
        .coalesce(4).write.parquet(f"{OUT_DIR}/embeddings.parquet"))

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        src = f"{SRC_SF}/{t}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{OUT_DIR}/{t}.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=DEFAULT_QUERIES)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    names = [q.strip() for q in args.queries.split(",") if q.strip()]

    from cosmos_spark.queries import QUERIES
    from cosmos_spark.session import get_spark

    spark = get_spark(app_name="growth_probe",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    build_x10(spark)

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name][0]
        t0 = time.monotonic()
        n1 = fn(spark, SRC_SF).count()
        t1 = time.monotonic() - t0
        spark.catalog.clearCache()
        t0 = time.monotonic()
        n10 = fn(spark, OUT_DIR).count()
        t10 = time.monotonic() - t0
        spark.catalog.clearCache()
        out[name] = {"t1": round(t1, 2), "t10": round(t10, 2),
                     "ratio": round(t10 / t1, 1) if t1 else None,
                     "rows1": n1, "rows10": n10}
        print(f"# {name}: {out[name]}", flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
