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


def _greedy_merge(syms: list, l: str, r: str, lr: str) -> list:
    """ONE greedy left-to-right pass merging adjacent (l, r) -> lr — THE
    rewrite contract shared bit-identically by the distributed Arrow
    round (:func:`_merge_round`), the driver merge loop
    (:func:`_driver_bpe_loop`) and the tokenizer application
    (:func:`bpe_tokenize`); keeping it in one place keeps the
    driver/distributed/apply parity the pytests pin."""
    res, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == l and syms[i + 1] == r:
            res.append(lr)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return res


def _merge_round(l: str, r: str):
    """Arrow kernel: greedy left-to-right merge of adjacent (l, r)."""
    lr = l + r

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def fn(syms: pd.Series) -> pd.Series:
        out = [_greedy_merge(list(arr), l, r, lr) for arr in syms]
        return pd.Series(out, index=syms.index)

    return fn


#: dim-size cutover for the driver-side merge loop: 200k distinct
#: pretokens of short symbol arrays is tens of MB collected — the same
#: bounded-probe discipline as pipeline.canonicalize's
#: CANON_DRIVER_DIM_MAX cascade.
BPE_DRIVER_DIM_MAX = 200_000


def _driver_bpe_loop(rows: list, num_merges: int) -> list[tuple]:
    """In-memory greedy merge loop over a collected (freq, syms) dim —
    bit-identical semantics to the distributed round: the SAME positional
    adjacent-pair counts (every adjacent index, overlaps included, freq-
    weighted), the SAME (cnt desc, left asc, right asc) argmax total
    order (python tuple order == Spark's orderBy: UTF-8 byte order and
    code-point order agree for valid strings), and the SAME greedy
    left-to-right rewrite as :func:`_merge_round`.

    Incremental bookkeeping (pair->count, pair->word-index, lazy-deletion
    heap for the argmax) makes a production-sized vocabulary (30-50k
    merges) a driver loop over the dim, not 50k Spark jobs — each round
    touches only the words containing the winning pair."""
    import heapq
    from collections import Counter, defaultdict

    words = [list(r["syms"]) for r in rows]
    freqs = [int(r["freq"]) for r in rows]
    pc: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for idx, syms in enumerate(words):
        f = freqs[idx]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pc[p] += f
            where[p].add(idx)
    heap = [(-c, p[0], p[1]) for p, c in pc.items()]
    heapq.heapify(heap)
    merges: list[tuple] = []
    for rank in range(num_merges):
        # lazy-deletion argmax: a heap entry is live iff it matches the
        # CURRENT count (every count change pushed a fresh entry)
        while heap:
            nc, l, r = heap[0]
            if pc.get((l, r), 0) == -nc and -nc > 0:
                break
            heapq.heappop(heap)
        if not heap:
            break
        cnt = -heap[0][0]
        merges.append((rank, l, r, int(cnt)))
        lr = l + r
        for idx in where.pop((l, r), set()):
            syms = words[idx]
            if not any(syms[i] == l and syms[i + 1] == r
                       for i in range(len(syms) - 1)):
                continue  # stale index entry (word rewritten since)
            f = freqs[idx]
            changed = set()
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] -= f
                changed.add(p)
            res = _greedy_merge(syms, l, r, lr)
            words[idx] = res
            for i in range(len(res) - 1):
                p = (res[i], res[i + 1])
                pc[p] += f
                where[p].add(idx)
                changed.add(p)
            for p in changed:
                if pc[p] <= 0:
                    del pc[p]
                    where.pop(p, None)
                else:
                    heapq.heappush(heap, (-pc[p], p[0], p[1]))
        pc.pop((l, r), None)
    return merges


def train_bpe(spark: SparkSession, df: DataFrame, text_col: str,
              num_merges: int = 16,
              pattern: str = DEFAULT_PATTERN,
              driver_dim_max: int = BPE_DRIVER_DIM_MAX) -> DataFrame:
    """Learn the first ``num_merges`` BPE merges from a text column.
    Returns DataFrame[rank int, left string, right string, freq long] —
    the merge table in learned order.

    Adaptive cascade (the canonicalize discipline, pipeline.py:504):
    the word-frequency dim is probed with ``limit(dim_max+1)``; when it
    fits the driver (default 200k distinct pretokens) the ENTIRE merge
    loop runs in-memory over the one collected relation — bit-identical
    greedy semantics (:func:`_driver_bpe_loop`), zero per-merge Spark
    jobs, so a 30-50k-merge production vocabulary is feasible. Oversized
    dims keep the distributed per-round loop (argmax LIMIT-1 collect +
    Arrow rewrite kernel, localCheckpoint per round). The collected dim
    is the SPARK-split symbol relation, so the char-split convention is
    identical in both branches."""
    words = word_freq_table(df, text_col, pattern)
    cur = (words.select("freq", F.split("word", "").alias("syms"))
           .localCheckpoint())
    # count-only probe first: collecting the probe rows themselves would
    # ship up to dim_max full symbol arrays to the driver just to be
    # discarded whenever the distributed branch wins (the at-scale path)
    n_dim = cur.limit(driver_dim_max + 1).count()
    if n_dim <= driver_dim_max:
        merges = _driver_bpe_loop(cur.collect(), num_merges)
        return spark.createDataFrame(
            merges, "rank int, left string, right string, freq long")
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
                syms = _greedy_merge(syms, l, r, l + r)
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
