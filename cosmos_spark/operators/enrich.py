"""Context-enrichment operator family — the Spark restatement of the
reference's table/caption context miner and its in-pipeline QA stats
(`cosmos/ingestion/ingest/process/enrich/context_enrichment.py`) plus the
table-structure extraction utility (`.../utils/table_extraction.py`).

- :func:`context_windows`  — F5: prefix/suffix token windows around label
  hits (`context_enrichment.py:329-366`: label hit at word index i ->
  prefix = words[i-20:i], suffix = words[i+2:i+22]). Pure JVM expressions
  (regexp token array + posexplode + slice) — runs on every ingest row, so
  it must stay inside whole-stage codegen.
- :func:`detection_stats`  — A4: per-doc tp/fp/fn -> precision/recall/F1
  from a detected-labels relation vs a text-referenced relation
  (`context_enrichment.py:282-312`), one full-outer join + one agg.
- :func:`stats_summary`    — the corpus ``describe().round(3)`` roll-up
  (`context_enrichment.py:110-115`).
- :func:`extract_table_rows` — S11 analog: parse delimited table blocks
  inside a text blob into typed rows (camelot/pdfplumber DataFrame-per-
  table, `table_extraction.py:131-169,172-307`) as a mapInPandas
  enrichment (imperative per-blob parse, vectorized per batch).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def context_windows(df: DataFrame, id_col: str, text_col: str,
                    label: str = "table", prefix_len: int = 20,
                    suffix_len: int = 20, skip: int = 2) -> DataFrame:
    """(id, pos, prefix, suffix) — one row per occurrence of ``label`` in
    the whitespace token stream; pos is the 0-based token index. ``skip``
    mirrors the reference's ``words[i+2:]`` (label + its number slot)."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '\\\\S+', 0)")
    hits = (
        df.select(F.col(id_col), toks.alias("toks"))
        .select(id_col, "toks", F.posexplode("toks").alias("pos", "tok"))
        .filter(F.col("tok") == label)
    )
    pre_start = f"greatest(pos - {prefix_len}, 0) + 1"
    return hits.select(
        id_col, "pos",
        F.expr(f"concat_ws(' ', slice(toks, {pre_start}, "
               f"pos - greatest(pos - {prefix_len}, 0)))").alias("prefix"),
        F.expr(f"concat_ws(' ', slice(toks, pos + {skip} + 1, "
               f"{suffix_len}))").alias("suffix"),
    )


def detection_stats(detected: DataFrame, truth: DataFrame,
                    key: str = "doc_id", item: str = "label") -> DataFrame:
    """(key, tp, fp, fn, precision, recall, f1) per key.

    Both inputs are (key, item) relations; set semantics (distinct). The
    join is a full outer on (key, item) — at scale both sides hash-shuffle
    once on the same key, no broadcast needed."""
    d = detected.select(key, item).distinct().withColumn("_d", F.lit(1))
    t = truth.select(key, item).distinct().withColumn("_t", F.lit(1))
    j = d.join(t, [key, item], "full_outer")
    per = j.groupBy(key).agg(
        F.sum(F.when(F.col("_d").isNotNull() & F.col("_t").isNotNull(), 1)
              .otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_d").isNotNull() & F.col("_t").isNull(), 1)
              .otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("_d").isNull() & F.col("_t").isNotNull(), 1)
              .otherwise(0)).alias("fn"),
    )
    p = F.when(F.col("tp") + F.col("fp") > 0,
               F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    r = F.when(F.col("tp") + F.col("fn") > 0,
               F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    per = (per.withColumn("precision", F.round(p, 6))
           .withColumn("recall", F.round(r, 6)))
    f1 = F.when(
        F.col("precision") + F.col("recall") > 0,
        2 * F.col("precision") * F.col("recall")
        / (F.col("precision") + F.col("recall"))).otherwise(F.lit(0.0))
    return per.withColumn("f1", F.round(f1, 6))


def stats_summary(per: DataFrame) -> DataFrame:
    """Corpus summary of a detection_stats frame — the reference's
    ``describe().round(3)`` (`context_enrichment.py:110-115`)."""
    return per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("precision"), 3).alias("avg_precision"),
        F.round(F.avg("recall"), 3).alias("avg_recall"),
        F.round(F.avg("f1"), 3).alias("avg_f1"),
        F.sum("tp").alias("sum_tp"),
        F.sum("fp").alias("sum_fp"),
        F.sum("fn").alias("sum_fn"),
    )


TABLE_ROW_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("row_idx", T.IntegerType()),
    T.StructField("n_cols", T.IntegerType()),
    T.StructField("c0", T.StringType()),
    T.StructField("c1", T.StringType()),
    T.StructField("c2", T.StringType()),
])

_CSV_LINE = re.compile(r"^[^,\n]+(?:,[^,\n]+)+$")


def extract_table_rows(df: DataFrame, id_col: str,
                       text_col: str) -> DataFrame:
    """Parse comma-delimited table lines out of a text blob into typed rows
    (id, row_idx, n_cols, c0..c2). Lines that do not look like table rows
    are skipped; row_idx counts surviving rows per blob in line order.

    The per-blob parse is imperative (the camelot analog) but batch-
    vectorized: one pandas explode + regex filter per Arrow batch inside
    ``mapInPandas`` — blobs never leave the executor."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            lines = pdf[text_col].fillna("").str.split("\n")
            ex = lines.explode()
            keep = ex.str.match(_CSV_LINE.pattern, na=False)
            ex = ex[keep]
            if ex.empty:
                continue
            ids = pdf.loc[ex.index, id_col].astype(str).reset_index(drop=True)
            cells = ex.str.split(",").reset_index(drop=True)
            out = pd.DataFrame({
                "id": ids,
                "row_idx": ids.groupby(ids).cumcount().astype("int32"),
                "n_cols": cells.map(len).astype("int32"),
                "c0": cells.str[0],
                "c1": cells.str[1],
                "c2": cells.str[2],
            })
            yield out

    return df.mapInPandas(fn, TABLE_ROW_SCHEMA)
