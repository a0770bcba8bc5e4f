"""Mergeable cardinality sketches: KMV (k-minimum-values).

At 100 TB you cannot answer "how many distinct tokens / shingles /
entities per group" by shuffling every distinct value to a reducer —
the distinct stream per group is corpus-sized. A KMV sketch keeps only
the k smallest 64-bit hashes of the values seen per group: O(k) state,
mergeable by union-and-truncate, and the classic (k-1)/F(h_k) estimator
(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM 2002) is accurate to ~1/sqrt(k). The reference has no sketch
layer (its corpus statistics are exact Dask aggregations at document
scale, e.g. `cosmos/ingestion/ingest/ingest.py` count paths); this is
one of the operations a training-data pipeline needs beyond it.

Shape (the reason it survives 100 TB) — three levels, each bounded:

1. row-local: when values arrive as an array column
   (`kmv_sketch_arrays`) or raw text (`kmv_sketch_ngrams`), each row
   reduces to its own <= k-hash sketch inside one batched Arrow kernel
   (one md5 per DISTINCT value; SQL HOF lambdas measured ~2x slower —
   interpreted per element) — the value stream never reaches a
   shuffle;
2. partition-local (Arrow): a mapInPandas pass merges the row sketches
   per group present in the partition (numpy union-truncate; state =
   groups-in-partition x k longs, no per-row Python);
3. global: one groupBy whose rows are k-bounded arrays — only sketches
   cross the shuffle, never distinct values. Merge = union + sort +
   truncate, exactly the sketch's mergeability property, so the result
   is independent of partitioning (pinned by test).

Hashing is md5 prefix -> positive 60-bit long (the engine-portable
trick of plans/lineage.py:51); DuckDB reproduces every hash, the k-th
minimum and the fixed IEEE-double estimate bit-for-bit
(q_kmv_distinct).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..portable_hash import HASH_BITS, HASH_SPACE, hash60, hash60_py


def _merge_kmin(k: int, grp_field: str):
    """mapInPandas kernel: merge row-level kmv arrays into one
    <= k-hash sketch per group present in the partition. Accumulates
    across the partition's Arrow batches in a dict of sorted numpy
    arrays (bounded: groups-in-partition x k); vectorized
    np.unique/np.concatenate, no per-row Python in the hash path."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            for grp, sub in pdf.groupby(grp_field, sort=False,
                                        dropna=False):
                arrs = [np.asarray(a, dtype=np.int64)
                        for a in sub["kmv"] if len(a)]
                if not arrs:
                    continue
                h = np.unique(np.concatenate(arrs))
                prev = acc.get(grp)
                if prev is not None:
                    h = np.unique(np.concatenate([prev, h]))
                acc[grp] = h[:k]
        if acc:
            yield pd.DataFrame({
                grp_field: [None if pd.isna(g) else g for g in acc],
                "kmv": [a.tolist() for a in acc.values()],
            })

    return fn


def _finalize(local: DataFrame, group_col: str, k: int) -> DataFrame:
    """Global merge + estimator. Merge state is k-bounded arrays."""
    merged = (local.groupBy(group_col)
              .agg(F.slice(F.array_sort(F.array_distinct(
                  F.flatten(F.collect_list("kmv")))), 1, k).alias("kmv")))
    k_used = F.size("kmv")
    kth = F.element_at(F.col("kmv"), k_used)
    est = (F.when(k_used < k, k_used.cast("double"))
           .otherwise(F.lit(float(k - 1) * HASH_SPACE)
                      / kth.cast("double")))
    return merged.select(
        group_col, "kmv",
        k_used.cast("int").alias("k_used"),
        kth.alias("kth_hash"),
        est.alias("est_distinct"))


def _local(pairs: DataFrame, group_col: str, k: int) -> DataFrame:
    grp_type = pairs.schema[group_col].dataType
    schema = T.StructType([
        T.StructField(group_col, grp_type),
        T.StructField("kmv", T.ArrayType(T.LongType())),
    ])
    return pairs.mapInPandas(_merge_kmin(k, group_col), schema)


def kmv_sketch_arrays(df: DataFrame, group_col: str, values_col: str,
                      k: int = 64) -> DataFrame:
    """Per-group KMV sketch where each row carries an array<string> of
    values (e.g. a document's tokens). The fast path: each row reduces
    to its own <= k-hash sketch inside one batched Arrow UDF, so only
    one small array per input row reaches the partition-merge stage
    instead of the exploded value stream. Batched Arrow UDF with one
    md5 per DISTINCT value per row, not SQL higher-order functions —
    HOF lambdas are interpreted per element (same measured pitfall as
    dedup.minhash_signatures; the HOF formulation of this kernel
    benched ~2x slower than even the exploded JVM path).

    Returns (group_col, kmv array<long>, k_used int, kth_hash long,
    est_distinct double); estimate = exact count while the sketch is
    not full, else (k-1) * 2^60 / h_k. Null array elements are skipped
    (SQL COUNT(DISTINCT) semantics)."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _row_kmv(vals: pd.Series) -> pd.Series:
        out: list[list[int]] = []
        for arr in vals:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            uniq = {v for v in arr if v is not None}
            if not uniq:
                out.append([])
                continue
            hs = np.fromiter(
                (hash60_py(v) for v in uniq),
                dtype=np.int64, count=len(uniq))
            # distinct-HASH semantics (two values may collide in 60 bits)
            hs = np.unique(hs)
            out.append(hs[:k].tolist())
        return pd.Series(out, index=vals.index)

    pairs = df.select(F.col(group_col), _row_kmv(values_col).alias("kmv"))
    return _finalize(_local(pairs, group_col, k), group_col, k)


def kmv_sketch_ngrams(df: DataFrame, group_col: str, text_col: str,
                      ns: dict[str, int] | None = None,
                      k: int = 64) -> DataFrame:
    """Word n-gram KMV sketches over raw text, one sketch per
    (group || '|' || tag) for every requested n-gram order — tokenize,
    n-gram, hash and partition-k-min FUSED into one mapInPandas pass.
    One corpus scan total: no explode, no JVM HOF n-gram construction
    (interpreted per element), no intermediate per-row sketch column;
    per-partition state stays (groups x tags) x k longs. Groups must be
    non-null strings WITHOUT '|' (the composite-key delimiter — a group
    'a|uni' would collide with ('a', 'uni'); enforced in the kernel).
    This is the shape to use for corpus vocabulary statistics;
    `kmv_sketch`/`kmv_sketch_arrays` are the generic building blocks."""
    import re

    from .dedup import TOKEN_RE

    tags = {"uni": 1, "bi": 2} if ns is None else ns
    grp_type = df.schema[group_col].dataType

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            for g, t in zip(pdf[group_col], pdf[text_col]):
                if g is None or "|" in str(g):
                    raise ValueError(
                        "kmv_sketch_ngrams: group values must be "
                        f"non-null and '|'-free, got {g!r}")
                toks = re.findall(TOKEN_RE, (t or "").lower())
                for tag, n in tags.items():
                    grams = (toks if n == 1 else
                             [" ".join(toks[i:i + n])
                              for i in range(len(toks) - n + 1)])
                    if not grams:
                        continue
                    uniq = set(grams)
                    hs = np.fromiter(
                        (hash60_py(v) for v in uniq),
                        dtype=np.int64, count=len(uniq))
                    hs = np.unique(hs)[:k]
                    key = "%s|%s" % (g, tag)
                    prev = acc.get(key)
                    if prev is not None:
                        hs = np.unique(np.concatenate([prev, hs]))[:k]
                    acc[key] = hs
        if acc:
            yield pd.DataFrame({
                group_col: list(acc),
                "kmv": [a.tolist() for a in acc.values()],
            })

    schema = T.StructType([
        T.StructField(group_col, grp_type),
        T.StructField("kmv", T.ArrayType(T.LongType())),
    ])
    local = df.select(group_col, text_col).mapInPandas(fn, schema)
    return _finalize(local, group_col, k)


def kmv_sketch(df: DataFrame, group_col: str, value_col: str,
               k: int = 64) -> DataFrame:
    """Per-group KMV sketch over a string column (one value per row).
    Same result as `kmv_sketch_arrays` on the grouped-up values (pinned
    by test); prefer the array form when values naturally arrive as
    per-row arrays — it keeps the value stream out of Python."""
    pairs = (df.select(F.col(group_col),
                       F.array(hash60(value_col)).alias("kmv"))
             .where(F.element_at("kmv", 1).isNotNull()))
    return _finalize(_local(pairs, group_col, k), group_col, k)


def quantile_sketch(df: DataFrame, group_col: str, value_col: str,
                    id_col: str, qs: tuple = (0.25, 0.5, 0.75, 0.9),
                    k: int = 256) -> DataFrame:
    """Per-group quantile ESTIMATES with O(k) state — the third leg of
    the sketch family (KMV = how many distinct, CMS = how often, this =
    how distributed). An exact per-group percentile shuffles every value
    to its group's reducer (q_percentiles is that contract query — fine
    per group, corpus-sized at 100 TB). Instead keep each group's k
    hash-smallest rows *carrying their values*: the k-minimum rows of a
    uniform hash are a uniform k-subset (the quota_sample argument, made
    value-bearing), so the sample's exact discrete quantile estimates
    the group quantile with the usual order-statistic error
    O(sqrt(q(1-q)/k)); while a group has <= k rows the sample IS the
    group and the estimate is exact.

    Shape — same three bounded levels as the KMV sketch:
    partition-local k-min over (hash, value) pairs in one mapInPandas
    pass (state = groups-in-partition x k pairs), a global merge whose
    shuffle rows are k-bounded struct arrays (union + sort + truncate =
    the sketch's mergeability, partitioning-invariant by test), then
    per-group finalization: sort the <= k sample values, emit
    element_at(ceil(q * m)) per requested q (percentile_disc
    semantics). Everything after the md5 is integer/IEEE-fixed, so
    DuckDB reproduces each estimate bit-for-bit (q_quantile_sketch).

    `value_col` must be integral (exact cross-engine compare; the
    sample mechanics are type-agnostic). Rows with a null value OR a
    null id are skipped (a null id has no hash — letting it through
    would NaN-cast to INT64_MIN in the kernel and hijack every
    k-min)."""
    pairs = df.select(
        F.col(group_col),
        hash60(id_col, salt="qsk").alias("h"),
        F.col(value_col).cast("long").alias("v"),
    ).where(F.col("v").isNotNull() & F.col("h").isNotNull())
    grp_type = df.schema[group_col].dataType
    schema = T.StructType([
        T.StructField(group_col, grp_type),
        T.StructField("hs", T.ArrayType(T.LongType())),
        T.StructField("vs", T.ArrayType(T.LongType())),
    ])

    def _local_kmin(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            for grp, sub in pdf.groupby(group_col, sort=False,
                                        dropna=False):
                h = sub["h"].to_numpy(dtype=np.int64)
                v = sub["v"].to_numpy(dtype=np.int64)
                prev = acc.get(grp)
                if prev is not None:
                    h = np.concatenate([prev[0], h])
                    v = np.concatenate([prev[1], v])
                order = np.lexsort((v, h))[:k]
                acc[grp] = (h[order], v[order])
        if acc:
            yield pd.DataFrame({
                group_col: [None if pd.isna(g) else g for g in acc],
                "hs": [hv[0].tolist() for hv in acc.values()],
                "vs": [hv[1].tolist() for hv in acc.values()],
            })

    local = pairs.mapInPandas(_local_kmin, schema)
    # global merge: k-bounded struct arrays; array_sort over
    # struct<h, v> orders by h (ties by v), exactly the local lexsort
    merged = (local.select(
        group_col, F.arrays_zip(F.col("hs").alias("h"),
                                F.col("vs").alias("v")).alias("sample"))
        .groupBy(group_col)
        .agg(F.slice(F.array_sort(F.flatten(F.collect_list("sample"))),
                     1, k).alias("sample")))
    vals = F.array_sort(F.transform("sample", lambda s: s["v"]))
    m = F.size("sample")
    out = merged.select(
        group_col, vals.alias("vals"), m.alias("m_sample"),
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"))
    idx = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("m_sample"))
                     .cast("int"))
    return out.select(
        group_col, "q",
        F.col("m_sample").cast("int").alias("m_sample"),
        F.element_at("vals", idx).alias("est_q"))


def _cms_bucket(value, i: int, width: int):
    """Depth-i count-min bucket of a string column: engine-portable
    60-bit hash of 'i|value' (portable_hash.hash60), mod width."""
    return F.pmod(hash60(value, salt=str(i)), F.lit(width))


def cms_build(df: DataFrame, value_col: str, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Count-min sketch over a string column — the frequency twin of
    the KMV cardinality sketch: estimate how often any value occurs
    (heavy hitters, stopword discovery, hot-key detection before a
    join) without a per-value groupBy whose result is
    distinct-value-sized. Returns the sketch TABLE (depth, bucket,
    cnt): at most depth x width rows regardless of input size.

    Shape: each row contributes `depth` (depth, bucket) pairs via one
    inline array explode; the groupBy's partial aggregation collapses
    them map-side, so the shuffle carries at most depth x width rows
    per task — bounded state, exactly the sketch's guarantee. Estimates
    (`cms_estimate`) are upper bounds: overcounts only, by < total/width
    w.h.p. per depth row, and taking the min over depth rows drives the
    error toward the true count."""
    # null values hash to a null bucket — one phantom (depth, NULL) row
    # per depth that no estimate can ever probe, silently breaking the
    # depth*width row bound; exclude them like every other sketch leg
    pairs = df.where(F.col(value_col).isNotNull()).select(
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("depth"),
                     _cms_bucket(F.col(value_col), i, width)
                     .alias("bucket"))
            for i in range(depth)])).alias("db"))
    return (pairs.groupBy(F.col("db.depth").alias("depth"),
                          F.col("db.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(cms: DataFrame, probes: DataFrame, value_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-frequency estimates for a probe relation against a built
    sketch: min over depth rows of the probe's bucket counters (0 when
    a bucket was never touched — values absent from the corpus estimate
    0 unless they collide everywhere). The sketch side is depth x width
    rows, so the join broadcasts; the probe side never rescans the
    corpus."""
    pb = probes.select(F.col(value_col), F.explode(F.array(*[
        F.struct(F.lit(i).alias("depth"),
                 _cms_bucket(F.col(value_col), i, width).alias("bucket"))
        for i in range(depth)])).alias("db")).select(
        value_col, "db.depth", "db.bucket")
    joined = pb.join(F.broadcast(cms), ["depth", "bucket"], "left")
    return (joined.groupBy(value_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_count")))


HLL_P = 8                      # 2^8 = 256 registers per group
HLL_M = 1 << HLL_P
HLL_W = HASH_BITS - HLL_P      # 52 low bits feed the rank
# alpha_m * m^2 * 2^(w+1), the raw-estimator numerator, as ONE double
# literal shared verbatim with the DuckDB oracle: est = NUM / sum_scaled
# where sum_scaled = sum_j 2^(w+1-M_j) is an exact BIGINT (registers are
# 0..w+1, so each term is 2^0..2^(w+1) and the sum is < m * 2^(w+1) <
# 2^61). One IEEE division of exacts -> bit-identical across engines.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W + 1))


def hll_registers(df: DataFrame, group_col: str,
                  value_col: str) -> DataFrame:
    """Per-group HyperLogLog register RELATION (group, bucket, m_reg) —
    the sketch's mergeable state in sparse form: at most 256 rows per
    group regardless of input size, and merging any number of register
    relations (across corpora, partitions, snapshots, days) is just
    ``unionByName`` — :func:`hll_finalize` re-maxes duplicate buckets,
    which IS the HLL merge operation. Bucket = top 8 bits of the
    portable 60-bit hash; rank = 52-bit-width leading-zero count
    computed as ``53 - length(bin(low52))`` (integer/string ops — no
    float log2 whose boundary rounding could differ across engines);
    one partially aggregated groupBy, shuffle bounded by
    partitions x groups x 256 rows. Null values are skipped
    (COUNT(DISTINCT) semantics)."""
    h = hash60(value_col)
    low = h.bitwiseAND(F.lit((1 << HLL_W) - 1))
    rho = (F.when(low == 0, F.lit(HLL_W + 1))
           .otherwise(F.lit(HLL_W + 1) - F.length(F.bin(low))))
    return (df.where(F.col(value_col).isNotNull())
            .select(F.col(group_col),
                    F.shiftright(h, HLL_W).alias("bucket"),
                    rho.alias("rho"))
            .groupBy(group_col, "bucket")
            .agg(F.max("rho").alias("m_reg")))


def hll_finalize(regs: DataFrame, group_col: str) -> DataFrame:
    """Estimate from a register relation (merging duplicate buckets
    first, so a bare union of register relations is a valid input). The
    raw estimate divides the fixed double numerator ``HLL_NUM`` by the
    exact integer ``sum_scaled`` — one IEEE division of exacts,
    bit-identical across engines; the standard small-range
    linear-counting correction ``m * ln(m / n_zero)`` is left to the
    caller (``ln`` is transcendental — engines' libm may differ in the
    last ulp, the same hazard the bigram-LM oracle avoids; ``n_zero``
    and the constant m = 256 are emitted so the correction is one
    client-side expression).

    Returns (group_col, n_zero int, sum_scaled bigint, est_raw
    double)."""
    merged = (regs.groupBy(group_col, "bucket")
              .agg(F.max("m_reg").alias("m_reg")))
    per_grp = merged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("m_used"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {HLL_W + 1} - m_reg)"))
        .alias("sum_present"))
    n_zero = F.lit(HLL_M) - F.col("m_used")
    sum_scaled = (F.col("sum_present")
                  + n_zero * F.lit(1 << (HLL_W + 1)))
    return per_grp.select(
        group_col,
        n_zero.cast("int").alias("n_zero"),
        sum_scaled.cast("long").alias("sum_scaled"),
        (F.lit(HLL_NUM) / sum_scaled.cast("double")).alias("est_raw"))


def hll_sketch(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group HyperLogLog cardinality estimate (Flajolet et al.
    2007) — the O(m)-state leg beside KMV: a KMV sketch answers set ops
    too (kmv_pair_overlap), HLL holds 256 byte-sized registers per
    group and merges by element-wise max, the shape engines keep per
    partition/file for streaming distinct counts. Composition of
    :func:`hll_registers` (the mergeable state) and
    :func:`hll_finalize` (the estimator); merge-associativity — union
    of per-part register relations finalizes identically to one
    whole-corpus sketch — is pinned by pytest. Entirely JVM-side and
    engine-portably exact (q_hll_distinct)."""
    return hll_finalize(hll_registers(df, group_col, value_col), group_col)


def kmv_pair_overlap(sk: DataFrame, group_col: str, k: int) -> DataFrame:
    """Pairwise set-operation ESTIMATES between finalized KMV sketches
    (theta-sketch style) — how two corpora overlap without ever
    comparing the corpora: union the two k-min lists and re-truncate
    (that IS the union sketch), take theta = its k-th minimum, and
    count the common hashes below theta; then

        jaccard_est      = n_common / k_union
        est_union        = (k-1) * 2^60 / theta   (exact when not full)
        est_intersection = jaccard_est * est_union (ditto)

    All inputs to the double arithmetic are integers + one fixed
    expression, so the estimates stay engine-portable bit-for-bit.
    Pairs every (grp_a < grp_b) combination — sketches are k-bounded
    rows, so the self-join is over group-count-squared tiny arrays,
    never data. Callers pair like with like (e.g. same n-gram order)."""
    a = sk.select(F.col(group_col).alias("grp_a"),
                  F.col("kmv").alias("kmv_a"))
    b = sk.select(F.col(group_col).alias("grp_b"),
                  F.col("kmv").alias("kmv_b"))
    pairs = a.join(b, F.col("grp_a") < F.col("grp_b"))
    merged = F.slice(F.array_sort(F.array_distinct(
        F.concat("kmv_a", "kmv_b"))), 1, k)
    out = (pairs.withColumn("mg", merged)
           .withColumn("k_union", F.size("mg"))
           .withColumn("theta", F.element_at("mg", F.col("k_union"))))
    n_common = F.size(F.filter(
        F.array_intersect("kmv_a", "kmv_b"),
        lambda h: h <= F.col("theta")))
    out = out.withColumn("n_common", n_common)
    est_union = (F.when(F.col("k_union") < k,
                        F.col("k_union").cast("double"))
                 .otherwise(F.lit(float(k - 1) * HASH_SPACE)
                            / F.col("theta").cast("double")))
    jac = F.col("n_common").cast("double") / F.col("k_union").cast("double")
    out = (out.withColumn("est_union", est_union)
           .withColumn("jaccard_est", jac)
           .withColumn("est_intersection",
                       F.when(F.col("k_union") < k,
                              F.col("n_common").cast("double"))
                       .otherwise(F.col("jaccard_est")
                                  * F.col("est_union"))))
    return out.select(
        "grp_a", "grp_b", F.col("k_union").cast("int").alias("k_union"),
        "theta", F.col("n_common").cast("int").alias("n_common"),
        "est_union", "jaccard_est", "est_intersection")
