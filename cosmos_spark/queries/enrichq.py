"""Enrichment and model-adjacent stages: context windows, detection P/R/F1 + summary, table extraction, nested class methods, reading order, rerank/QA model hooks, rules/recalibration postprocess, JSON export, multimodal features/frames."""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ._shared import (  # noqa: F401
    _t,
)

def q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payload column -> mapInPandas feature
    extraction (stub decoder); byte length / sha / fake dims are
    SQL-replicable so the Arrow binary round-trip is verified."""
    from ..operators import multimodal
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.media_from_documents(docs)
    feats = multimodal.extract_media_features(media, fake=True)
    return feats.select("media_id", "n_bytes", "payload_sha256",
                        "width", "height")


SQL_MEDIA_FEATURES = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha256,
       CAST(64 + ('0x'||substr(sha256(text),1,2))::INT % 64 AS INT) AS width,
       CAST(64 + ('0x'||substr(sha256(text),3,2))::INT % 64 AS INT) AS height
FROM documents
"""


def q_media_frames(spark, sf_dir):
    """Multimodal frame sampling: payload split into 16-byte frame
    records, every 2nd kept — real binary slicing through Arrow,
    value-checked frame-for-frame (sha of each sampled frame)."""
    from ..operators import multimodal
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.media_from_documents(docs)
    frames = multimodal.sample_frames(media, frame_size=16, every=2)
    return frames.select("media_id", "frame_idx", "n_bytes", "frame_sha256")


# DuckDB has no BLOB substring; the synthetic documents are pure ASCII at
# every SF (verified octet_length(encode(text)) == length(text)), so
# character slicing on the VARCHAR is byte-identical to the Spark side's
# payload-byte slicing and sha256(varchar) hashes the same UTF-8 bytes.
SQL_MEDIA_FRAMES = """
WITH m AS (SELECT CAST(doc_id AS VARCHAR) AS media_id, text AS s
           FROM documents),
f AS (SELECT media_id, s, frame_idx FROM (
        SELECT media_id, s,
               CAST(unnest(range(0, CAST(ceil(length(s) / 16.0) AS BIGINT)))
                    AS INT) AS frame_idx
        FROM m)
      WHERE frame_idx % 2 = 0)
SELECT media_id, frame_idx,
       CAST(length(substring(s, frame_idx * 16 + 1, 16)) AS INT)
         AS n_bytes,
       sha256(substring(s, frame_idx * 16 + 1, 16)) AS frame_sha256
FROM f
"""

def q_rules_postprocess(spark, sf_dir):
    """M5 analog (`pp_rules.py:7-35`): regex rule overrides the model class
    and pins score := 1.0 on change — pure column expressions. Here: docs
    whose text matches a caption-ish label pattern get reclassified."""
    docs = _t(spark, sf_dir, "documents")
    pat = r"(?i)^(table|figure|fig)\b"
    return docs.select(
        "doc_id",
        F.when(F.col("text").rlike(pat), F.lit("caption"))
        .otherwise(F.lit("body")).alias("cls"),
        F.when(F.col("text").rlike(pat), F.lit(1.0))
        .otherwise(F.lit(0.5)).alias("pp_score"),
    )


SQL_RULES_POSTPROCESS = """
SELECT doc_id,
       CASE WHEN regexp_matches(text, '^(table|figure|fig)\\b', 'i')
            THEN 'caption' ELSE 'body' END AS cls,
       CASE WHEN regexp_matches(text, '^(table|figure|fig)\\b', 'i')
            THEN 1.0 ELSE 0.5 END AS pp_score
FROM documents
"""


def q_score_recalibrate(spark, sf_dir):
    """M4 analog (xgboost postprocess, `featurizer.py:84-125` +
    `xgboost_model/inference.py:12-26`): a deterministic feature vector per
    row scored by a fixed linear+sigmoid model inside a batched Arrow UDF
    (numpy-vectorized — the Spark form of 'xgboost predicts on a matrix').
    Rounded so the cross-engine float compare is stable."""
    import numpy as np
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def _recal(n_chars: "pd.Series", n_toks: "pd.Series") -> "pd.Series":
        x = (-1.5 + 0.35 * np.log1p(n_chars.to_numpy(dtype="float64"))
             + 0.05 * n_toks.to_numpy(dtype="float64"))
        return pd.Series(1.0 / (1.0 + np.exp(-x)), index=n_chars.index)

    docs = _t(spark, sf_dir, "documents")
    toks = F.expr(r"size(regexp_extract_all(text, '\\S+', 0))")
    return docs.select(
        "doc_id",
        F.round(_recal(F.col("n_chars").cast("double"),
                       toks.cast("double")), 6).alias("recal_score"))


SQL_SCORE_RECALIBRATE = """
SELECT doc_id,
       round(1.0 / (1.0 + exp(-(-1.5 + 0.35 * ln(1 + n_chars)
             + 0.05 * len(regexp_extract_all(text, '\\S+'))))), 6)
         AS recal_score
FROM documents
"""


def q_json_export(spark, sf_dir):
    """S7 analog (`parquet_to_json.py:12-104`): rows in deterministic
    reading order, serialized to JSON — a bucketed distributed rank +
    `to_json` replaces the reference's driver-side re-order + json.dump
    loop (full-corpus exports never funnel through one reducer; see
    operators.ranks.bucketed_rank). Fields are non-null (Spark's to_json
    drops null fields; DuckDB keeps them)."""
    docs = _t(spark, sf_dir, "documents")
    from ..operators import ranks
    ranked = ranks.bucketed_rank(
        docs.select("doc_id", "lang", "n_chars"), "doc_id", rank_col="ord",
        bucket=F.floor(F.col("doc_id") / 1024))
    return ranked.select(
        "doc_id", "ord",
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("doc_json"))


SQL_JSON_EXPORT = """
SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS ord,
       to_json(struct_pack(doc_id := doc_id, lang := lang,
                           n_chars := n_chars))::VARCHAR AS doc_json
FROM documents
"""

# ---------------------------------------------------------------------------
# round 2: context enrichment (F5/A4/S11), verification joins, LSH ANN,
# retrieval graph join, representation learning
# ---------------------------------------------------------------------------

def q_context_windows(spark, sf_dir):
    """F5 (`context_enrichment.py:329-366`): prefix/suffix token windows
    around each 'table' label hit — prefix = words[i-20:i], suffix =
    words[i+2:i+22]. Pure JVM slice expressions."""
    from ..operators import enrich
    docs = _t(spark, sf_dir, "documents")
    return enrich.context_windows(docs, "doc_id", "text", label="table")


SQL_CONTEXT_WINDOWS = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
           FROM documents),
u AS (SELECT doc_id, toks, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS i
      FROM t),
h AS (SELECT doc_id, toks, CAST(i - 1 AS INT) AS pos
      FROM u WHERE tok = 'table')
SELECT doc_id, pos,
       coalesce(array_to_string(
         list_slice(toks, greatest(pos - 20, 0) + 1, pos), ' '), '')
         AS prefix,
       coalesce(array_to_string(
         list_slice(toks, pos + 3, pos + 22), ' '), '') AS suffix
FROM h
"""


def q_detection_stats(spark, sf_dir):
    """A4 (`context_enrichment.py:282-312`): per-doc tp/fp/fn ->
    precision/recall/F1 between a deterministic 'detected' label relation
    (vocab tokens at even positions) and a 'referenced' relation (vocab
    tokens at positions divisible by 3) — one full-outer join + one agg."""
    from ..operators import enrich
    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.posexplode(F.expr(r"regexp_extract_all(lower(text), '\\S+', 0)"))
        .alias("pos", "tok"))
    base = u.filter(F.col("tok").isin("table", "scan", "join", "window"))
    detected = (base.filter(F.col("pos") % 2 == 0)
                .select("doc_id", F.col("tok").alias("label")))
    truth = (base.filter(F.col("pos") % 3 == 0)
             .select("doc_id", F.col("tok").alias("label")))
    return enrich.detection_stats(detected, truth, key="doc_id",
                                  item="label")


SQL_DETECTION_STATS = r"""
WITH u AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '\S+')) AS tok,
                  generate_subscripts(regexp_extract_all(lower(text), '\S+'), 1)
                    - 1 AS pos
           FROM documents),
b AS (SELECT * FROM u WHERE tok IN ('table', 'scan', 'join', 'window')),
d AS (SELECT DISTINCT doc_id, tok FROM b WHERE pos % 2 = 0),
t AS (SELECT DISTINCT doc_id, tok FROM b WHERE pos % 3 = 0),
j AS (SELECT coalesce(d.doc_id, t.doc_id) AS doc_id,
             CASE WHEN d.doc_id IS NOT NULL AND t.doc_id IS NOT NULL
                  THEN 1 ELSE 0 END AS tp_,
             CASE WHEN d.doc_id IS NOT NULL AND t.doc_id IS NULL
                  THEN 1 ELSE 0 END AS fp_,
             CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END AS fn_
      FROM d FULL OUTER JOIN t ON d.doc_id = t.doc_id AND d.tok = t.tok),
per AS (SELECT doc_id, CAST(sum(tp_) AS BIGINT) AS tp,
               CAST(sum(fp_) AS BIGINT) AS fp,
               CAST(sum(fn_) AS BIGINT) AS fn
        FROM j GROUP BY doc_id),
pr AS (SELECT doc_id, tp, fp, fn,
              round(CASE WHEN tp + fp > 0
                    THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0 END, 6)
                AS precision,
              round(CASE WHEN tp + fn > 0
                    THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0 END, 6)
                AS recall
       FROM per)
SELECT doc_id, tp, fp, fn, precision, recall,
       round(CASE WHEN precision + recall > 0
             THEN 2 * precision * recall / (precision + recall)
             ELSE 0 END, 6) AS f1
FROM pr
"""


def _csv_source(spark, sf_dir):
    """Deterministic CSV-blob corpus built from documents: one blob per
    source with a non-table prologue line, a 'doc_id,lang,n_chars' header
    row, then one data row per doc in doc_id order."""
    docs = _t(spark, sf_dir, "documents")
    line = F.concat_ws(",", F.col("doc_id").cast("string"), F.col("lang"),
                       F.col("n_chars").cast("string"))
    return (
        docs.select("source", F.struct("doc_id", line.alias("l")).alias("s"))
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .select(F.col("source").alias("id"),
                F.concat(F.lit("# table dump\ndoc_id,lang,n_chars\n"),
                         F.array_join(F.expr("transform(ss, x -> x.l)"),
                                      "\n")).alias("content"))
    )


def q_table_extract(spark, sf_dir):
    """S11 analog (`table_extraction.py:131-169,172-307`): parse delimited
    table blocks inside text blobs into the DataFrame-per-table shape —
    per-blob table runs, variable-width array cells, inferred header row
    attached to every data row. Arrays are '|'-joined for the
    cross-engine value compare."""
    from ..operators import enrich
    rows = enrich.extract_table_rows(_csv_source(spark, sf_dir),
                                     "id", "content")
    return rows.select(
        "id", "table_idx", "row_idx", "n_cols",
        F.array_join("cells", "|").alias("cells_str"),
        F.array_join("header", "|").alias("header_str"))


SQL_TABLE_EXTRACT = """
SELECT source AS id, 0 AS table_idx,
       CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
            AS INT) AS row_idx,
       3 AS n_cols,
       CAST(doc_id AS VARCHAR) || '|' || lang || '|'
         || CAST(n_chars AS VARCHAR) AS cells_str,
       'doc_id|lang|n_chars' AS header_str
FROM documents
"""

def q_rerank_top1(spark, sf_dir):
    """M7 (`bert_reranker/inference.py:22-44` +
    `elastic_reranking_retriever.py:43-49`): batched cross-encoder-shaped
    rerank (Iterator pandas UDF, model-singleton hook) + per-doc top-1
    diversity window — score-exact vs the oracle's set-Jaccard."""
    from .. import retrieval
    docs = _t(spark, sf_dir, "documents").select("source", "doc_id", "text")
    scored = retrieval.rerank(docs, query="table scan join")
    w = Window.partitionBy("source").orderBy(
        F.desc("rerank_score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "doc_id", "rerank_score")
    )


SQL_RERANK_TOP1 = r"""
WITH s AS (
  SELECT source, doc_id,
         round(CAST(len(list_intersect(
                 list_distinct(regexp_extract_all(lower(text), '\S+')),
                 ['table', 'scan', 'join'])) AS DOUBLE)
               / len(list_distinct(list_concat(
                   regexp_extract_all(lower(text), '\S+'),
                   ['table', 'scan', 'join']))), 6) AS rerank_score
  FROM documents)
SELECT source, doc_id, rerank_score FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY rerank_score DESC, doc_id) AS rn
  FROM s) WHERE rn = 1
"""


def q_qa_extract(spark, sf_dir):
    """M8 (`extraction/extraction/qa_extractor.py:30-47`): span extraction
    over contexts — answer = the token window after the question keyword,
    scored by a position prior (the deterministic stand-in for start/end
    logits) in the Iterator-pandas-UDF model-hook shape."""
    from .. import retrieval
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = retrieval.qa_extract(docs, question="find the table", span_len=5)
    return (out.filter(F.col("span_start").isNotNull())
            .select("doc_id", "answer", "qa_score", "span_start"))


SQL_QA_EXTRACT = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
           FROM documents),
h AS (SELECT doc_id, toks, list_position(toks, 'table') AS p
      FROM t WHERE coalesce(list_position(toks, 'table'), 0) > 0)
SELECT doc_id,
       coalesce(array_to_string(list_slice(toks, p + 1, p + 5), ' '), '')
         AS answer,
       round(1.0 / CAST(p AS DOUBLE), 6) AS qa_score,
       CAST(p - 1 AS INT) AS span_start
FROM h
"""

def q_class_methods(spark, sf_dir):
    """G6 (`reaggregate_equations.py:122-135`): nested segmentation inside
    class segments — each indented def opens a method sub-segment with
    absolute line spans, value-checked per constructed class file."""
    from .. import pipeline as P
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    src = docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("c"), did, F.lit(".py")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("python").alias("lang"),
        F.concat(F.lit("class C"), did,
                 F.lit(":\n    def m0(self):\n        return 0\n"
                       "    def m1(self):\n        return 1")).alias("content"),
    )
    subs = P.subsegments_of(P.segments_of(src))
    return subs.select("repo", "path", "method",
                       "sub_line_start", "sub_line_end")


SQL_CLASS_METHODS = """
SELECT source AS repo, 'c' || doc_id || '.py' AS path, 'm0' AS method,
       2 AS sub_line_start, 3 AS sub_line_end
FROM documents
UNION ALL
SELECT source AS repo, 'c' || doc_id || '.py' AS path, 'm1' AS method,
       4 AS sub_line_start, 5 AS sub_line_end
FROM documents
"""


def q_reading_order(spark, sf_dir):
    """W1/W2 (`aggregate.py:115-156`, `parquet_to_json.py:42-94`): the
    reading-order operator over a constructed page of non-overlapping
    boxes (one per doc, stacked by doc_id, alternating columns, no
    >=800px spanning blocks) — bands degrade to y-order and the repair is
    a no-op, making the greedy kernels' output relationally decidable.
    Non-degenerate band/repair cases are pinned by pytest fixtures
    (tests/test_operators.py)."""
    from ..operators import order
    docs = _t(spark, sf_dir, "documents")
    boxes = docs.select(
        F.col("source").alias("repo"),
        F.lit("page.py").alias("path"),
        F.lit(1).cast("int").alias("page"),
        F.col("doc_id").cast("string").alias("seg_id"),
        ((F.col("doc_id") % 2) * 600).cast("double").alias("x1"),
        (F.col("doc_id") * 100).cast("double").alias("y1"),
        ((F.col("doc_id") % 2) * 600 + 300).cast("double").alias("x2"),
        (F.col("doc_id") * 100 + 50).cast("double").alias("y2"),
    )
    out = order.order_pages(boxes)
    return out.select("repo", "seg_id", "ord")


SQL_READING_ORDER = """
SELECT source AS repo, CAST(doc_id AS VARCHAR) AS seg_id,
       CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
            AS INT) AS ord
FROM documents
"""

def q_detection_summary(spark, sf_dir):
    """A4 corpus roll-up (`context_enrichment.py:110-115`
    describe().round(3) analog): one-row summary over the per-doc
    detection stats."""
    from ..operators import enrich
    return enrich.stats_summary(q_detection_stats(spark, sf_dir))


SQL_DETECTION_SUMMARY = f"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(precision), 3) AS avg_precision,
       round(avg(recall), 3) AS avg_recall,
       round(avg(f1), 3) AS avg_f1,
       CAST(sum(tp) AS BIGINT) AS sum_tp,
       CAST(sum(fp) AS BIGINT) AS sum_fp,
       CAST(sum(fn) AS BIGINT) AS sum_fn
FROM ({SQL_DETECTION_STATS})
"""
