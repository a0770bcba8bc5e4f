"""Distributed BPE tokenizer TRAINING (the merge-table learner).

`q_bpe_token_count` estimates tokenizer cost with a GPT-2-style
pretokenizer; this module learns the merge table itself — the other
half of bringing up a tokenizer on a new corpus, and an operation a
training-data pipeline owns because it must run over the full corpus.

Scale shape (why this survives 100 TB):

- the corpus collapses FIRST: training operates on the word-frequency
  dim (`word_freq_table`: pretokenize -> explode -> count, one
  map-side-combined shuffle). 100 TB of text is tens of millions of
  distinct pretokens, not trillions of rows — every later step is
  dim-sized, never corpus-sized.
- each merge round is: adjacent-pair explode over the dim -> one
  combiner-friendly groupBy -> a LIMIT-1 argmax collect (the single
  winning pair is the only thing the driver sees) -> one narrow Arrow
  kernel rewriting symbol arrays. The dim is localCheckpoint-ed per
  round so the iteration's plan stays flat (same lineage-cut rule as
  the CC loop in operators/graph.py).
- sequential rounds match the REFERENCE BPE semantics exactly
  (greedy left-to-right, one merge per round, deterministic
  (freq desc, left, right) tie-break — pinned against an independent
  driver-side reference implementation in pytest). Production trainers
  batch non-overlapping merges per pass to cut rounds; the semantics
  pinned here are the ground truth such batching must preserve.

SQL oracle: the K argmax rounds unroll into one DuckDB statement via
the boundary-string replace trick (queries/textpipe.py
`_sql_bpe_train`), so `q_bpe_train` is value-exact at the driver;
pytest additionally pins parity against an independent driver-side
reference implementation.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: GPT-2-style pretokenizer — THE engine pretokenizer: queries.py
#: imports this as _BPE_PAT so counting and training share one
#: token universe.
DEFAULT_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                   r"| ?[^\sA-Za-z0-9]+|\s+")

_PAIRS = ("case when size(syms) >= 2 then "
          "transform(sequence(1, size(syms) - 1), "
          "i -> struct(syms[i - 1] as l, syms[i] as r)) "
          "else array() end")


def word_freq_table(df: DataFrame, text_col: str,
                    pattern: str = DEFAULT_PATTERN) -> DataFrame:
    """(word, freq) pretoken frequency dim — the corpus collapse."""
    toks = F.regexp_extract_all(text_col, F.lit(pattern), 0)
    return (df.select(F.explode(toks).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _merge_round(l: str, r: str):
    """Arrow kernel: greedy left-to-right merge of adjacent (l, r)."""
    lr = l + r

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def fn(syms: pd.Series) -> pd.Series:
        out = []
        for arr in syms:
            a = list(arr)
            res, i, n = [], 0, len(a)
            while i < n:
                if i < n - 1 and a[i] == l and a[i + 1] == r:
                    res.append(lr)
                    i += 2
                else:
                    res.append(a[i])
                    i += 1
            out.append(res)
        return pd.Series(out, index=syms.index)

    return fn


def train_bpe(spark: SparkSession, df: DataFrame, text_col: str,
              num_merges: int = 16,
              pattern: str = DEFAULT_PATTERN) -> DataFrame:
    """Learn the first ``num_merges`` BPE merges from a text column.
    Returns DataFrame[rank int, left string, right string, freq long] —
    the merge table in learned order."""
    words = word_freq_table(df, text_col, pattern)
    cur = (words.select("freq", F.split("word", "").alias("syms"))
           .localCheckpoint())
    merges: list[tuple] = []
    for rank in range(num_merges):
        best = (cur.select("freq", F.explode(F.expr(_PAIRS)).alias("p"))
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "l", "r").limit(1).collect())
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        merges.append((rank, l, r, int(cnt)))
        cur = (cur.withColumn("syms", _merge_round(l, r)(F.col("syms")))
               .localCheckpoint())
    return spark.createDataFrame(
        merges, "rank int, left string, right string, freq long")


def bpe_tokenize(df: DataFrame, merges, text_col: str = "text",
                 id_col: str = "doc_id",
                 pattern: str = DEFAULT_PATTERN) -> DataFrame:
    """Apply a learned merge table — the tokenizer-APPLICATION half that
    completes the story (count -> train -> apply -> pack): per document,
    pretoken and BPE token counts plus tokens-per-pretoken, the number a
    data pipeline feeds to budget accounting and
    ``sampling.pack_sequences`` (its ``token_count_col``).

    Contract: SEQUENTIAL rank-order application (one greedy
    left-to-right pass per merge) — exactly the transformation
    :func:`train_bpe` applied to its dim while learning, so encoding the
    training corpus reproduces the training-time segmentation and the
    SQL oracle is the train oracle's replace() chain extended one CTE.
    (Priority-queue encoders are an optimization of this contract for
    causally-ordered tables, not a different semantics.)

    ``merges``: list[(left, right)] in rank order, or the
    DataFrame[rank, left, right, ...] ``train_bpe`` returns — collected
    once, bounded by ``num_merges``: the merge table IS the model
    artifact, shipped in the kernel closure (same discipline as
    ``retrieval._load_model``).

    Scale shape: each DISTINCT pretoken is encoded once (the
    vocabulary dim, one Arrow kernel pass), then token counts join back
    to the exploded corpus — vocabulary-sized, so a plain hash join
    (AQE broadcasts it when it fits; no unconditional hint) — and
    per-doc sums are map-side-combinable. 100 TB of text pays one
    explode + one join + one partial agg."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()  # the model: bounded
        merges = [(r["left"], r["right"]) for r in rows]
    mlist = [tuple(m) for m in merges]

    @F.pandas_udf(T.IntegerType())
    def _ntok(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            syms = list(w)
            for l, r in mlist:
                lr = l + r
                res, i, n = [], 0, len(syms)
                while i < n:
                    if i < n - 1 and syms[i] == l and syms[i + 1] == r:
                        res.append(lr)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            out.append(len(syms))
        return pd.Series(out, index=words.index)

    toks = F.regexp_extract_all(text_col, F.lit(pattern), 0)
    ex = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("word"))
    wt = ex.select("word").distinct().withColumn("n_tok", _ntok("word"))
    agg = (ex.join(wt, "word")
           .groupBy("id")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_pretokens"),
                F.sum("n_tok").cast("bigint").alias("n_tokens")))
    return (df.select(F.col(id_col).alias("id")).join(agg, "id", "left")
            .select("id",
                    F.coalesce("n_pretokens", F.lit(0)).cast("bigint")
                    .alias("n_pretokens"),
                    F.coalesce("n_tokens", F.lit(0)).cast("bigint")
                    .alias("n_tokens"),
                    F.round(F.coalesce("n_tokens", F.lit(0)).cast("double")
                            / F.greatest(F.coalesce("n_pretokens",
                                                    F.lit(0)), F.lit(1)),
                            6).alias("tokens_per_pretoken")))
