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
    mirrors the reference's ``words[i+2:]`` (label + its number slot).
    Matching is case-insensitive: the token stream is lowercased, so the
    label is compared lowercased too (a cased label used to silently
    match nothing)."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '\\\\S+', 0)")
    hits = (
        df.select(F.col(id_col), toks.alias("toks"))
        .select(id_col, "toks", F.posexplode("toks").alias("pos", "tok"))
        .filter(F.col("tok") == label.lower())
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
    T.StructField("table_idx", T.IntegerType()),
    T.StructField("row_idx", T.IntegerType()),
    T.StructField("n_cols", T.IntegerType()),
    T.StructField("cells", T.ArrayType(T.StringType())),
    T.StructField("header", T.ArrayType(T.StringType())),
])

_CSV_LINE = re.compile(r"^[^,\n]+(?:,[^,\n]+)+$")
_NUMERIC_CELL = re.compile(r"^\s*-?\d+(?:\.\d+)?\s*$")


def extract_table_rows(df: DataFrame, id_col: str,
                       text_col: str) -> DataFrame:
    """Parse comma-delimited table blocks out of a text blob into the
    DataFrame-per-table shape of the reference's camelot path
    (`table_extraction.py:172-307`: each detected table becomes a pandas
    DataFrame with inferred column headers).

    - A *table* is a maximal run of consecutive delimited lines;
      ``table_idx`` numbers tables per blob in line order.
    - Column count is variable: ``cells`` is the full ``array<string>``
      split (``n_cols`` its length); ragged rows keep their own width.
    - *Header inference*: a table's first line is its header iff the
      table has >= 2 lines and none of the first line's cells parse as a
      number — the camelot-style heuristic, deterministic and
      SQL-replicable. The header row is not emitted as data; its cells
      ride along on every data row of that table (null when no header).
    - ``row_idx`` counts DATA rows per table.

    The per-blob parse is imperative (the camelot analog) but batch-
    vectorized: one pandas explode + vectorized run/group ops per Arrow
    batch inside ``mapInPandas`` — blobs never leave the executor."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            lines = pdf[text_col].fillna("").str.split("\n")
            ex = lines.explode()
            d = pd.DataFrame({
                "bi": ex.index.to_numpy(),
                "line": ex.to_numpy(dtype=object),
            })
            d["line"] = d["line"].fillna("")
            d["is_t"] = d["line"].str.match(_CSV_LINE.pattern, na=False)
            prev_t = (d["is_t"].shift(fill_value=False)
                      & (d["bi"] == d["bi"].shift()))
            d["tid"] = (d["is_t"] & ~prev_t).cumsum()
            d = d[d["is_t"]]
            if d.empty:
                continue
            d = d.copy()
            d["table_idx"] = (d.groupby("bi")["tid"]
                              .rank(method="dense").astype("int32") - 1)
            d["cells"] = d["line"].str.split(",")
            d["pos"] = d.groupby("tid").cumcount()
            size = d.groupby("tid")["tid"].transform("size")
            # only pos==0 rows can be headers — run the numeric-cell
            # regex on one row per table, not every cell of every row
            head_idx = d.index[d["pos"] == 0]
            is_hdr = pd.Series(False, index=d.index)
            is_hdr.loc[head_idx] = (
                (size.loc[head_idx] >= 2)
                & d.loc[head_idx, "cells"].map(
                    lambda cs: not any(_NUMERIC_CELL.match(c)
                                       for c in cs)))
            d["is_header"] = is_hdr
            hdr_map = (d.loc[d["is_header"]]
                       .set_index("tid")["cells"].to_dict())
            d["header"] = d["tid"].map(lambda t: hdr_map.get(t))
            out = d[~d["is_header"]].copy()
            if out.empty:
                continue
            out["id"] = pdf.loc[out["bi"], id_col].astype(str).to_numpy()
            out["row_idx"] = out.groupby("tid").cumcount().astype("int32")
            out["n_cols"] = out["cells"].map(len).astype("int32")
            yield out[["id", "table_idx", "row_idx", "n_cols", "cells",
                       "header"]]

    return df.mapInPandas(fn, TABLE_ROW_SCHEMA)
