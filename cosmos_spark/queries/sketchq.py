"""Sketch family: KMV distinct-count + set ops, count-min frequency, k-min-sample quantiles — bounded-state, engine-portable, bit-exact under the DuckDB oracles."""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ._shared import (  # noqa: F401
    _t,
    _memo_scope,
)

_KMV_MEMO: dict[tuple[str, str], object] = {}


def _lang_ngram_sketch(spark, sf_dir):
    """The (lang x gram-order) KMV sketch shared by q_kmv_distinct and
    q_kmv_set_ops — memoized per Spark application (the kg-trio
    pattern) so the fused full-corpus tokenize+hash scan runs once per
    bench/driver pass; the sketch itself is groups x k, tiny, so the
    eager localCheckpoint is free."""
    from ..operators import sketch
    key = (spark.sparkContext.applicationId, sf_dir)
    _memo_scope(_KMV_MEMO, spark)
    if key not in _KMV_MEMO:
        docs = _t(spark, sf_dir, "documents")
        _KMV_MEMO[key] = sketch.kmv_sketch_ngrams(
            docs.select("lang", "text"), "lang", "text",
            ns={"uni": 1, "bi": 2}, k=64).localCheckpoint()
    return _KMV_MEMO[key]


def q_kmv_distinct(spark, sf_dir):
    """Distinct n-gram cardinality per (language, gram order) via a KMV
    sketch (operators/sketch.py): one fused mapInPandas scan (tokenize
    + n-gram + hash + partition k-min) -> one merge groupBy over
    k-bounded arrays; only sketches cross the shuffle. The hash, the
    k-th minimum and the IEEE-double estimate are all engine-portable,
    so the oracle checks the sketch bit-for-bit. Unigram groups (small
    shared vocabulary, < k distinct) exercise the exact-count branch;
    bigram groups (~900 distinct) the (k-1)/F(h_k) estimator branch."""
    sk = _lang_ngram_sketch(spark, sf_dir)
    return sk.select(F.col("lang").alias("grp"), "k_used", "kth_hash",
                     "est_distinct")


SQL_KMV_DISTINCT = """
WITH t AS (SELECT lang, regexp_extract_all(lower(text), '\\S+') AS toks
           FROM documents),
vals AS (
  SELECT lang || '|uni' AS grp, unnest(toks) AS tok FROM t
  UNION ALL
  SELECT lang || '|bi' AS grp,
         unnest(list_transform(range(1, greatest(len(toks), 1)),
                i -> array_to_string(list_slice(toks, i, i + 1), ' ')))
           AS tok
  FROM t WHERE len(toks) >= 2),
h AS (SELECT DISTINCT grp,
             ('0x' || substr(md5(tok), 1, 15))::UBIGINT::BIGINT AS h
      FROM vals),
r AS (SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY grp) AS nd
      FROM h)
SELECT grp,
       CAST(least(nd, 64) AS INT) AS k_used,
       h AS kth_hash,
       CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
            ELSE (63.0 * 1152921504606846976.0) / CAST(h AS DOUBLE)
       END AS est_distinct
FROM r WHERE rn = least(nd, 64)
"""


def q_kmv_set_ops(spark, sf_dir):
    """Cross-corpus overlap WITHOUT comparing corpora: pairwise
    union / intersection / Jaccard estimates between per-language
    n-gram KMV sketches (theta-sketch set operations, the
    contamination-screening primitive at 100 TB — only k-bounded
    sketch rows are joined). Same-gram-order pairs only; unigram pairs
    (not-full sketches) exercise the exact branch, bigram pairs the
    estimator branch. Bit-exact vs the DuckDB oracle."""
    from ..operators import sketch
    sk = _lang_ngram_sketch(spark, sf_dir)
    out = sketch.kmv_pair_overlap(sk, "lang", k=64)
    same_tag = (F.substring_index("grp_a", "|", -1)
                == F.substring_index("grp_b", "|", -1))
    return out.where(same_tag)


SQL_KMV_SET_OPS = """
WITH t AS (SELECT lang, regexp_extract_all(lower(text), '\\S+') AS toks
           FROM documents),
vals AS (
  SELECT lang || '|uni' AS grp, unnest(toks) AS tok FROM t
  UNION ALL
  SELECT lang || '|bi' AS grp,
         unnest(list_transform(range(1, greatest(len(toks), 1)),
                i -> array_to_string(list_slice(toks, i, i + 1), ' ')))
           AS tok
  FROM t WHERE len(toks) >= 2),
h AS (SELECT DISTINCT grp,
             ('0x' || substr(md5(tok), 1, 15))::UBIGINT::BIGINT AS h
      FROM vals),
sk AS (SELECT grp, list_slice(list_sort(list(h)), 1, 64) AS kmv
       FROM h GROUP BY grp),
p AS (SELECT a.grp AS grp_a, a.kmv AS ka, b.grp AS grp_b, b.kmv AS kb
      FROM sk a, sk b
      WHERE a.grp < b.grp
        AND split_part(a.grp, '|', 2) = split_part(b.grp, '|', 2)),
m AS (SELECT grp_a, grp_b, ka, kb,
             list_slice(list_sort(list_distinct(list_concat(ka, kb))),
                        1, 64) AS mg
      FROM p),
s AS (SELECT grp_a, grp_b,
             len(mg) AS k_union, mg[len(mg)] AS theta,
             len(list_filter(list_intersect(ka, kb),
                             x -> x <= mg[len(mg)])) AS n_common
      FROM m)
SELECT grp_a, grp_b,
       CAST(k_union AS INT) AS k_union, theta,
       CAST(n_common AS INT) AS n_common,
       CASE WHEN k_union < 64 THEN CAST(k_union AS DOUBLE)
            ELSE (63.0 * 1152921504606846976.0) / CAST(theta AS DOUBLE)
       END AS est_union,
       CAST(n_common AS DOUBLE) / CAST(k_union AS DOUBLE) AS jaccard_est,
       CASE WHEN k_union < 64 THEN CAST(n_common AS DOUBLE)
            ELSE (CAST(n_common AS DOUBLE) / CAST(k_union AS DOUBLE))
                 * ((63.0 * 1152921504606846976.0)
                    / CAST(theta AS DOUBLE))
       END AS est_intersection
FROM s
"""

_CMS_PROBES = ["scan", "column", "window", "join", "merge", "value",
               "zzz_absent"]


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch frequency estimates (operators/sketch.py): the
    frequency twin of the KMV cardinality sketch — token frequencies
    from a depth x width counter table (bounded shuffle regardless of
    corpus size), probed for a fixed token set incl. one absent token
    (estimates are upper bounds; absent values read 0 unless they
    collide in every depth row). Hashing and min-over-depth arithmetic
    are engine-portable, so the oracle reproduces every counter and
    estimate bit-for-bit."""
    from ..operators import sketch
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.expr(
        r"regexp_extract_all(lower(text), '\\S+', 0)")).alias("tok"))
    cms = sketch.cms_build(toks, "tok", depth=4, width=1024)
    probes = spark.createDataFrame([(p,) for p in _CMS_PROBES], "tok string")
    return sketch.cms_estimate(cms, probes, "tok", depth=4, width=1024)


SQL_CMS_HEAVY_HITTERS = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
  FROM documents),
cms AS (
  SELECT d.range AS depth,
         CAST(('0x' || substr(md5(d.range || '|' || tok), 1, 15))::UBIGINT
              % 1024 AS BIGINT) AS bucket,
         count(*) AS cnt
  FROM toks, range(4) d GROUP BY 1, 2),
probes AS (SELECT unnest(['scan', 'column', 'window', 'join', 'merge',
                          'value', 'zzz_absent']) AS tok),
pb AS (
  SELECT tok, d.range AS depth,
         CAST(('0x' || substr(md5(d.range || '|' || tok), 1, 15))::UBIGINT
              % 1024 AS BIGINT) AS bucket
  FROM probes, range(4) d)
SELECT pb.tok, min(coalesce(cms.cnt, 0)) AS est_count
FROM pb LEFT JOIN cms USING (depth, bucket)
GROUP BY pb.tok
"""

def q_quantile_sketch(spark, sf_dir):
    """Per-language document-length quantiles from a bounded-state
    sample sketch (operators/sketch.quantile_sketch) — the quantile leg
    of the sketch family (KMV = distinct, CMS = frequency). k = 64 <
    group sizes at every sf, so the k-min truncation + order-statistic
    estimator path is exercised (not the trivially-exact small-group
    branch); the hash, the sampled row set, and the ceil(q*m) pick are
    all engine-portable, so the oracle reproduces every estimate
    bit-for-bit."""
    from ..operators.sketch import quantile_sketch
    docs = _t(spark, sf_dir, "documents")
    return quantile_sketch(docs, "lang", "n_chars", "doc_id",
                           qs=(0.25, 0.5, 0.75, 0.9), k=64)


SQL_QUANTILE_SKETCH = """
WITH h AS (
  SELECT lang, n_chars AS v,
         ('0x' || substr(md5('qsk|' || doc_id), 1, 15))::UBIGINT::BIGINT
           AS hh
  FROM documents WHERE n_chars IS NOT NULL
),
topk AS (
  SELECT lang, v FROM (
    SELECT lang, v,
           row_number() OVER (PARTITION BY lang ORDER BY hh, v) AS rn
    FROM h) WHERE rn <= 64
),
ranked AS (
  SELECT lang, v,
         row_number() OVER (PARTITION BY lang ORDER BY v) AS vr,
         count(*) OVER (PARTITION BY lang) AS m
  FROM topk
)
SELECT lang, q, CAST(m AS INT) AS m_sample, v AS est_q
FROM ranked,
     (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
             (CAST(0.75 AS DOUBLE)), (CAST(0.9 AS DOUBLE))) AS qv(q)
WHERE vr = greatest(1, CAST(ceil(q * m) AS INT))
"""


def q_hll_distinct(spark, sf_dir):
    """Per-(language x gram-order) distinct n-gram cardinality via a
    HyperLogLog register file (operators/sketch.hll_sketch) — the
    O(m)-state leg beside the KMV sketch over the SAME corpus statistic
    (q_kmv_distinct), so the two estimators cross-check each other.
    Entirely JVM-side: explode + md5 + bit ops + two partially
    aggregated groupBys (shuffle rows bounded by groups x 256
    registers, never the value stream). The light per-element HOF here
    only concatenates adjacent tokens (no hashing/regex in the lambda —
    that stays in codegen'd md5 post-explode; the fused-kernel form in
    kmv_sketch_ngrams is the 100 TB fast path, this is the composable
    one). Registers, zero counts and the raw-estimator division are
    integer/IEEE-exact, so DuckDB reproduces every row bit-for-bit;
    the ln-based small-range correction is intentionally left
    client-side (transcendental — the bigram-LM ulp hazard).

    The corpus is deliberately split by doc_id parity into TWO register
    relations that are unioned before `hll_finalize` — semantically a
    no-op (HLL merge = element-wise register max), but it routes the
    driver oracle through the MERGE path, so cross-engine parity covers
    the mergeable-state semantics (per-partition/per-snapshot register
    files rolled up later), not just the single-corpus composition.
    Merge associativity itself is pinned by
    `test_hll_merge_associativity`."""
    from ..operators import sketch
    docs = _t(spark, sf_dir, "documents")

    def grams(part):
        base = part.select(
            "lang",
            F.expr(r"regexp_extract_all(lower(text), '\\S+', 0)")
            .alias("toks"))
        uni = base.select(
            F.concat("lang", F.lit("|uni")).alias("grp"),
            F.explode("toks").alias("tok"))
        bi = (base.where(F.size("toks") >= 2)
              .select(F.concat("lang", F.lit("|bi")).alias("grp"),
                      F.explode(F.expr(
                          "transform(sequence(1, size(toks) - 1), "
                          "i -> concat(toks[i - 1], ' ', toks[i]))"))
                      .alias("tok")))
        return uni.unionByName(bi)

    halves = [sketch.hll_registers(grams(docs.where(
        F.col("doc_id") % 2 == par)), "grp", "tok") for par in (0, 1)]
    return sketch.hll_finalize(halves[0].unionByName(halves[1]), "grp")


SQL_HLL_DISTINCT = """
WITH t AS (SELECT lang, regexp_extract_all(lower(text), '\\S+') AS toks
           FROM documents),
vals AS (
  SELECT lang || '|uni' AS grp, unnest(toks) AS tok FROM t
  UNION ALL
  SELECT lang || '|bi' AS grp,
         unnest(list_transform(range(1, greatest(len(toks), 1)),
                i -> array_to_string(list_slice(toks, i, i + 1), ' ')))
           AS tok
  FROM t WHERE len(toks) >= 2),
h AS (SELECT grp, ('0x' || substr(md5(tok), 1, 15))::UBIGINT::BIGINT AS h
      FROM vals),
r AS (SELECT grp, h >> 52 AS bucket,
             CASE WHEN (h & 4503599627370495) = 0 THEN 53
                  ELSE 53 - length(printf('%b', h & 4503599627370495))
             END AS rho
      FROM h),
regs AS (SELECT grp, bucket, max(rho) AS m_reg FROM r GROUP BY 1, 2),
agg AS (SELECT grp, count(*) AS m_used,
               sum(1::BIGINT << (53 - m_reg)) AS sum_present
        FROM regs GROUP BY 1)
SELECT grp, CAST(256 - m_used AS INT) AS n_zero,
       CAST(sum_present + (256 - m_used) * (1::BIGINT << 53) AS BIGINT)
         AS sum_scaled,
       4.2399330249068963e+20
         / CAST(sum_present + (256 - m_used) * (1::BIGINT << 53) AS DOUBLE)
         AS est_raw
FROM agg
"""
