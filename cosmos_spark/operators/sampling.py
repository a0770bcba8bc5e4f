"""Deterministic sampling operators for training-data mixtures.

An LLM training set is rarely "all the data": sources are re-weighted
(oversample curated corpora, downsample crawl), and the sample must be
REPRODUCIBLE — a re-run over 100 TB has to pick exactly the same rows
without storing any RNG state, and adding/removing other rows must not
flip a given row's fate (stability under corpus growth; seeded
`df.sample` gives neither guarantee since it is partitioning-
dependent). Hash-threshold Bernoulli gives both: a row is kept iff
h(id) < weight * 2^60, where h is the engine-portable md5-prefix hash
(plans/lineage.py trick) — a pure per-row function, so the sample is a
deterministic subset ANY engine reproduces (DuckDB oracle,
q_training_mix), and per-row weights express the whole mixture policy
as a column.

Scale shape: one row-local filter — no shuffle, no state, pushed
wherever the scan is.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..portable_hash import HASH_SPACE, hash60


def sample_hash(id_col, salt: str = "mix") -> Column:
    """The sampling hash as a fraction in [0, 1): deterministic,
    engine-portable (portable_hash.hash60), independent per salt (two
    different salts give independent samples of the same rows — e.g. a
    sampling decision and a train/valid assignment that must not
    correlate)."""
    return hash60(id_col, salt=salt).cast("double") / F.lit(HASH_SPACE)


def quota_sample(df: DataFrame, group_col: str, id_col: str, k: int,
                 salt: str = "quota") -> DataFrame:
    """Cap each group at its k hash-smallest rows — the quota half of
    mixture building ("at most N docs per source/domain"), and a
    deterministic uniform-without-replacement sample per group (the
    k-minimum rows of a uniform hash ARE a uniform k-subset). Same
    guarantees as `mixture_sample`: engine-portable, partition-
    invariant, and STABLE in the selection ORDER under growth — a row
    ranked within k stays selected unless a new row hashes below it,
    which is exactly reservoir-sampling semantics without the state.

    Shape: one window ranked per GROUP (partitioned — never a global
    single-reducer sort); groups are the mixture's sources, so
    parallelism is source-count-wide and each partition sort spills at
    worst. For group-cardinality stats without materializing rows, use
    the KMV sketch instead (same k-minimum idea, O(k) state)."""
    from pyspark.sql import Window
    # null ids hash to null and Spark's ascending sort puts nulls FIRST,
    # so they would permanently occupy quota slots; drop them up front —
    # the same treatment mixture_sample gives them (null hash < any
    # weight is false), keeping null handling uniform across the family
    w = Window.partitionBy(group_col).orderBy(
        sample_hash(id_col, salt), id_col)
    return (df.where(F.col(id_col).isNotNull())
            .withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k).drop("__rk"))


def mixture_sample(df: DataFrame, id_col: str, weight_col,
                   salt: str = "mix") -> DataFrame:
    """Keep each row with probability = its weight (a column or column
    name; >= 1.0 keeps always, 0 drops always). The weight column IS
    the mixture policy — derive it from source/quality/language however
    the recipe demands; this operator only guarantees the keep decision
    is deterministic, engine-portable, and stable under corpus growth."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return df.where(sample_hash(id_col, salt) < w)


def pack_sequences(df: DataFrame, ctx_len: int,
                   id_col: str = "doc_id", group_col: str = "source",
                   token_count_col=None) -> DataFrame:
    """Assign documents to fixed-length training examples — the
    GPT-style "concatenate the corpus, chunk every ``ctx_len`` tokens"
    packing, computed WITHOUT materializing the concatenation: within
    each group (stream shard), documents are laid end to end in
    ``id_col`` order and each doc's example/offset fall out of the
    running token total. Returns the input keys plus
    ``(n_tokens, example_id, start_offset)`` where ``example_id`` is the
    ctx-block the doc STARTS in and ``start_offset`` its position inside
    it (docs may straddle block boundaries — that is the contract of
    concat-and-chunk packing; a doc longer than ``ctx_len`` spans
    several).

    ``token_count_col`` defaults to the whitespace token count over
    ``text`` (the q_token_count stat); pass a column for real tokenizer
    lengths (e.g. bpe_tokenize output size).

    Scale shape: ONE per-group window cumsum (partition = the stream
    shard, so parallelism is shard-wide and no global single-reducer
    sort exists) over an otherwise row-local plan. Deterministic and
    growth-stable per shard: appending new docs with higher ids never
    moves an existing doc's example."""
    from pyspark.sql import Window
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    n_tok = (F.expr(r"size(regexp_extract_all(text, '\\S+', 0))")
             .cast("bigint")
             if token_count_col is None
             else (F.col(token_count_col)
                   if isinstance(token_count_col, str)
                   else token_count_col).cast("bigint"))
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    with_cum = (df.select(id_col, group_col, n_tok.alias("n_tokens"))
                .withColumn("__cum", F.sum("n_tokens").over(w)))
    # integer `div`, not floor(double /): exact at any cumulative total
    return (with_cum
            .withColumn("__start", F.col("__cum") - F.col("n_tokens"))
            .select(id_col, group_col, "n_tokens",
                    F.expr(f"__start div {ctx_len}").alias("example_id"),
                    (F.col("__start") % ctx_len).alias("start_offset")))
