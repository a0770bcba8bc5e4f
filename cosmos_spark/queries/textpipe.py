"""Training-data text pipeline: exact dedup, token counting (whitespace + BPE pretokenizer), quality/language gates, decontamination, BM25, train split, PII scrub, mixture/quota sampling, BPE training."""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ._shared import (  # noqa: F401
    _t,
)

# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / text stats / similarity)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content, keep the smallest doc_id
    (S10/F10 analog: job dedup by content hash)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("text_hash", F.md5(F.col("text")))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count(F.lit(1)).alias("n_dups"))
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
       count(*) AS n_dups
FROM documents GROUP BY 1
"""


def q_token_count(spark, sf_dir):
    """Token counting (whitespace tokens) — training-data text stat."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(r"size(regexp_extract_all(text, '\\S+', 0))").cast("bigint")
        .alias("n_tokens"),
        F.length("text").cast("bigint").alias("len_chars"),
    )


SQL_TOKEN_COUNT = """
SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS len_chars
FROM documents
"""

# GPT-2-style pretokenizer, minus the trailing-space lookahead (`\s+(?!\S)`)
# that RE2 cannot express — contractions, space-prefixed letter/digit runs,
# space-prefixed punctuation runs, whitespace runs. Alternation is
# leftmost-first in Java regex AND RE2, so Spark and DuckDB tokenize
# identically (verified on contraction/punct/whitespace edge cases).
# one pretokenizer for the whole tokenizer story: counting here,
# merge-table training in operators/bpe.py
from ..operators.bpe import DEFAULT_PATTERN as _BPE_PAT  # noqa: E402


def q_bpe_token_count(spark, sf_dir):
    """BPE-ish token counting: a byte-pair-encoding pretokenizer regex
    (the training-cost estimator real pipelines run before the actual
    BPE merge table) — total tokens, distinct tokens, and the
    whitespace-token ratio per document. Pure JVM regex, no UDF."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.round(
            F.size(toks).cast("double") /
            F.greatest(F.expr(r"size(regexp_extract_all(text, '\\S+', 0))"),
                       F.lit(1)).cast("double"), 6).alias("bpe_per_word"),
    )


SQL_BPE_TOKEN_COUNT = """
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+')
           AS toks,
         len(regexp_extract_all(text, '\\S+')) AS n_words
  FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       round(CAST(len(toks) AS DOUBLE) / greatest(n_words, 1), 6)
         AS bpe_per_word
FROM t
"""


_STOPWORDS = ("the", "a", "of", "to", "and")


def q_quality_score(spark, sf_dir):
    """Quality scoring: stopword ratio + mean token length, rounded."""
    docs = _t(spark, sf_dir, "documents")
    sw = ", ".join(f"'{w}'" for w in _STOPWORDS)
    toks = r"regexp_extract_all(lower(text), '\\S+', 0)"
    return docs.select(
        "doc_id",
        F.expr(
            f"size(filter({toks}, x -> x in ({sw}))) /"
            f" greatest(size({toks}), 1)").alias("stopword_ratio"),
        F.expr(
            f"aggregate({toks}, 0L, (acc, x) -> acc + length(x)) /"
            f" greatest(size({toks}), 1)").alias("mean_token_len"),
    )


SQL_QUALITY_SCORE = f"""
SELECT doc_id,
  len(list_filter(regexp_extract_all(lower(text), '\\S+'),
            x -> x IN ({", ".join("'" + w + "'" for w in _STOPWORDS)})))
        / greatest(len(regexp_extract_all(lower(text), '\\S+')), 1)
    AS stopword_ratio,
  list_sum(list_transform(regexp_extract_all(lower(text), '\\S+'),
            x -> length(x)))
        / greatest(len(regexp_extract_all(lower(text), '\\S+')), 1)
    AS mean_token_len
FROM documents
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination — the training-data hygiene op every LLM
    pipeline runs before pretraining: flag every corpus document sharing
    at least one word 4-gram with the (deterministic) eval set
    (doc_id % 97 == 0), the n-gram-overlap rule of GPT-3/PaLM-style
    dataset reports (production uses 8-13-grams; 4 is the demonstrative
    n at which this synthetic vocabulary produces cross-document
    overlap, and n is a constant in the gram expression).

    Scale shape: the eval set is SMALL BY DEFINITION, so its distinct
    8-grams aggregate to one broadcastable row (collect_set) and the
    corpus side is a single row-local ``arrays_overlap`` projection — no
    corpus explode, no shuffle, no UDF; 100 TB of training text streams
    through map-side only. (A giant eval set would swap the collected
    array for a broadcast bloom filter; the join shape is unchanged.)"""
    docs = _t(spark, sf_dir, "documents")
    grams = F.expr(r"""
        CASE WHEN size(regexp_extract_all(lower(text), '\\S+', 0)) >= 4
             THEN transform(
                 sequence(1, size(regexp_extract_all(lower(text),
                                                     '\\S+', 0)) - 3),
                 i -> array_join(slice(regexp_extract_all(lower(text),
                                                          '\\S+', 0),
                                       i, 4), ' '))
             ELSE array() END""")
    bench_set = (docs.filter(F.col("doc_id") % 97 == 0)
                 .select(F.explode(grams).alias("g"))
                 .agg(F.collect_set("g").alias("bench_grams")))
    return (docs.crossJoin(F.broadcast(bench_set))
            .select("doc_id", "source",
                    F.arrays_overlap(grams, F.col("bench_grams"))
                    .cast("int").alias("contaminated")))


SQL_DECONTAMINATE = r"""
WITH g AS (
  SELECT doc_id, source,
         list_transform(
             range(1, greatest(len(regexp_extract_all(lower(text),
                                                      '\S+')) - 2, 1)),
             i -> array_to_string(
                 list_slice(regexp_extract_all(lower(text), '\S+'),
                            i, i + 3), ' ')) AS grams
  FROM documents),
b AS (SELECT flatten(list(grams)) AS bg FROM g WHERE doc_id % 97 = 0)
SELECT doc_id, source,
       CAST(len(list_intersect(grams, bg)) > 0 AS INT) AS contaminated
FROM g, b
"""


def q_bm25(spark, sf_dir):
    """Corpus-statistics relevance scoring: Okapi BM25 (k1=1.2, b=0.75)
    of every document for the fixed query {table, scan, join}. The corpus
    stats (N, avgdl, per-term df) reduce to ONE broadcast row; per-doc tf
    is a row-local array filter — so the whole scorer is a map-side
    projection behind one tiny aggregate, the shape that lets BM25 run
    over 100 TB without a per-term inverted-index shuffle. avgdl is
    rounded to 6dp in both engines so the norm input is a shared exact
    rational; the final score rounds the one transcendental (ln)."""
    docs = _t(spark, sf_dir, "documents")
    toks = r"regexp_extract_all(lower(text), '\\S+', 0)"
    terms = ("table", "scan", "join")
    tf = {t: F.expr(f"size(filter({toks}, x -> x = '{t}'))")
          for t in terms}
    base = docs.select(
        "doc_id", F.expr(f"size({toks})").cast("double").alias("dl"),
        *[tf[t].cast("double").alias(f"tf_{t}") for t in terms])
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("double"))
          .alias(f"df_{t}") for t in terms])
    k1, b = 1.2, 0.75
    parts = [
        F.log(F.lit(1.0) + (F.col("n_docs") - F.col(f"df_{t}") + 0.5)
              / (F.col(f"df_{t}") + 0.5))
        * (F.col(f"tf_{t}") * (k1 + 1))
        / (F.col(f"tf_{t}")
           + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        for t in terms]
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    return (base.crossJoin(F.broadcast(stats))
            .select("doc_id", F.round(score, 6).alias("bm25")))


SQL_BM25 = r"""
WITH base AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '\S+')) AS DOUBLE)
           AS dl,
         CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
                              x -> x = 'table')) AS DOUBLE) AS tf_table,
         CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
                              x -> x = 'scan')) AS DOUBLE) AS tf_scan,
         CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
                              x -> x = 'join')) AS DOUBLE) AS tf_join
  FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, round(avg(dl), 6) AS avgdl,
         sum(CAST(tf_table > 0 AS DOUBLE)) AS df_table,
         sum(CAST(tf_scan > 0 AS DOUBLE)) AS df_scan,
         sum(CAST(tf_join > 0 AS DOUBLE)) AS df_join
  FROM base)
SELECT doc_id,
       round(  ln(1.0 + (n_docs - df_table + 0.5) / (df_table + 0.5))
                 * (tf_table * 2.2)
                 / (tf_table + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1.0 + (n_docs - df_scan + 0.5) / (df_scan + 0.5))
                 * (tf_scan * 2.2)
                 / (tf_scan + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1.0 + (n_docs - df_join + 0.5) / (df_join + 0.5))
                 * (tf_join * 2.2)
                 / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
         AS bm25
FROM base, stats
"""


def q_train_split(spark, sf_dir):
    """Deterministic content-hash train/valid/test assignment — the
    training-data-curation split every LLM pipeline needs. Bucketing on
    the first hex nibble of sha256(source|doc_id) gives a stable,
    engine-portable 12/2/2 (75%/12.5%/12.5%) split: no RNG, no state,
    reproducible under any re-partitioning or re-run, and a pure
    projection at any corpus scale (no shuffle at all — the split
    column is row-local)."""
    docs = _t(spark, sf_dir, "documents")
    nib = F.substring(
        F.sha2(F.concat_ws("|", F.col("source"),
                           F.col("doc_id").cast("string")), 256), 1, 1)
    return docs.select(
        "doc_id", "source",
        F.when(nib < "c", "train").when(nib < "e", "valid")
        .otherwise("test").alias("split"),
    )


SQL_TRAIN_SPLIT = """
SELECT doc_id, source,
       CASE WHEN substr(sha256(source || '|' || doc_id), 1, 1) < 'c'
              THEN 'train'
            WHEN substr(sha256(source || '|' || doc_id), 1, 1) < 'e'
              THEN 'valid'
            ELSE 'test' END AS split
FROM documents
"""

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_PII_HEXKEY = r"\b[0-9a-f]{32,}\b"


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing — the redaction pass a training corpus gets before
    anything else: emails, IPv4 addresses, and long hex secrets
    replaced by typed placeholder tags, with per-doc hit counts for
    audit. Patterns are RE2-safe (no lookaround) so redaction is pure
    JVM regexp_replace AND bit-identical under the DuckDB oracle. The
    synthetic docs carry no PII, so deterministic PII is planted per
    doc first — the oracle must reproduce plant + scrub exactly."""
    docs = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"), F.lit(" contact u"), F.col("doc_id"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" token "), F.md5(F.col("doc_id").cast("string")))
    scrubbed = planted
    for pat, tag in ((_PII_EMAIL, "<EMAIL>"), (_PII_IPV4, "<IP>"),
                     (_PII_HEXKEY, "<KEY>")):
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    n = lambda pat: F.size(F.regexp_extract_all(planted, F.lit(pat), 0))
    return docs.select(
        "doc_id", scrubbed.alias("clean_text"),
        n(_PII_EMAIL).cast("bigint").alias("n_emails"),
        n(_PII_IPV4).cast("bigint").alias("n_ips"),
        n(_PII_HEXKEY).cast("bigint").alias("n_keys"))


SQL_PII_SCRUB = r"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact u' || doc_id || '@example.com from 10.0.'
              || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
              || ' token ' || md5(CAST(doc_id AS VARCHAR)) AS t
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
           'g'),
           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
           '\b[0-9a-f]{32,}\b', '<KEY>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(t,
           '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t,
           '\b[0-9a-f]{32,}\b')) AS BIGINT) AS n_keys
FROM planted
"""


def q_training_mix(spark, sf_dir):
    """The capstone training-data recipe, end to end in one plan:
    language gate (stopword heuristic) -> quality gate (min tokens) ->
    exact dedup (keep lowest doc_id per content hash) -> deterministic
    weighted mixture sampling (sources 0-9 kept at 1.0, the rest
    downsampled to 0.25 via hash-threshold Bernoulli,
    operators/sampling.py) -> per-source doc/token accounting. Every
    step is a pure function of the data, so the whole recipe is
    value-exact under the DuckDB oracle — including which individual
    documents the sampler kept."""
    from ..operators import sampling
    docs = _t(spark, sf_dir, "documents")
    toks = r"regexp_extract_all(lower(text), '\\S+', 0)"
    en_hits = f"size(filter({toks}, x -> x in ('the', 'a', 'of', 'and')))"
    base = (docs.where(F.expr(f"{en_hits} > 0"))
            .where(F.expr(f"size({toks}) >= 20")))
    keep = (base.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("doc_id")))
    dd = base.join(keep.select("doc_id"), "doc_id", "left_semi")
    weight = (F.when(F.expr("cast(substring(source, 4, 8) as int)") < 10,
                     F.lit(1.0)).otherwise(F.lit(0.25)))
    sampled = sampling.mixture_sample(dd.withColumn("w", weight),
                                      "doc_id", "w")
    return (sampled.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.expr(f"size({toks})")).alias("n_tokens")))


SQL_TRAINING_MIX = """
WITH t AS (SELECT doc_id, source, text,
                  regexp_extract_all(lower(text), '\\S+') AS toks
           FROM documents),
base AS (SELECT * FROM t
         WHERE len(list_filter(toks,
                   x -> x IN ('the', 'a', 'of', 'and'))) > 0
           AND len(toks) >= 20),
dd AS (SELECT * FROM base
       WHERE doc_id IN (SELECT min(doc_id) FROM base GROUP BY md5(text))),
s AS (SELECT * FROM dd
      WHERE CAST(('0x' || substr(md5('mix|' || doc_id), 1, 15))::UBIGINT
                 AS DOUBLE) / 1152921504606846976.0
            < CAST(CASE WHEN CAST(substr(source, 4) AS INT) < 10
                        THEN 1.0 ELSE 0.25 END AS DOUBLE))
SELECT source, count(*) AS n_docs,
       CAST(sum(len(toks)) AS BIGINT) AS n_tokens
FROM s GROUP BY source
"""


_BPE_MERGES_MEMO: dict = {}


def _trained_merges(spark, sf_dir):
    """One 10-merge training pass per (application, sf_dir), shared by
    q_bpe_train and q_bpe_tokenize (training is 10 sequential argmax
    jobs — the expensive half; re-deriving it per consumer would double
    the bench wall for no coverage)."""
    from ..operators import bpe
    from ._shared import _memo_scope
    key = (spark.sparkContext.applicationId, sf_dir)
    _memo_scope(_BPE_MERGES_MEMO, spark)
    if key not in _BPE_MERGES_MEMO:
        docs = _t(spark, sf_dir, "documents")
        _BPE_MERGES_MEMO[key] = bpe.train_bpe(spark, docs, "text",
                                              num_merges=10)
    return _BPE_MERGES_MEMO[key]


def q_bpe_train(spark, sf_dir):
    """BPE tokenizer training (operators/bpe.py): learn the first 10
    merges from the documents corpus. The corpus collapses to the
    word-frequency dim first; each round is one combiner-friendly pair
    count + a LIMIT-1 argmax + one narrow Arrow rewrite. Value-exact at
    the driver since r4: the oracle unrolls the 10 rounds as DuckDB
    CTEs (see :func:`_sql_bpe_train`); pytest additionally pins parity
    against an independent driver-side reference implementation."""
    return _trained_merges(spark, sf_dir)


def q_bpe_tokenize(spark, sf_dir):
    """Tokenizer APPLICATION (operators/bpe.py bpe_tokenize): encode the
    corpus with the learned 10-merge table — per-doc pretoken/BPE-token
    counts and tokens-per-pretoken, the accounting a data pipeline feeds
    to budgeting and sequence packing. Each distinct pretoken is encoded
    once; counts hash-join back to the exploded corpus; per-doc sums are
    map-side-combinable. The oracle extends the training replace() chain
    with one per-word token-count CTE and a per-doc join."""
    from ..operators.bpe import bpe_tokenize
    docs = _t(spark, sf_dir, "documents")
    return (bpe_tokenize(docs, _trained_merges(spark, sf_dir))
            .withColumnRenamed("id", "doc_id"))


_BPE_SQL_PAT = ("'''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                "| ?[^\\sA-Za-z0-9]+|\\s+'")


def _bpe_chain(k: int) -> list:
    """The shared K-round unrolled CTE chain both BPE oracles assemble
    from (ONE definition, so the train and tokenize oracles can never
    learn different merges).

    Boundary-string trick: each symbol is wrapped in its OWN pair of
    \\x01 separators (sym -> SEP+sym+SEP; word = concat of wrapped
    symbols). Merging pair (l, r) is then a plain
    ``replace(enc, SEP l SEP SEP r SEP, SEP l r SEP)``: every symbol
    carries both its boundaries, so a consumed match never steals the
    next occurrence's leading separator — DuckDB's left-to-right
    non-overlapping ``replace`` is exactly the greedy LTR merge kernel
    (adversarially checked on 'aaaa', 'abababab', unicode, and the
    real corpus). Pair counts come from zipped unnests of the
    double-SEP split, overlaps counted, matching the kernel's
    all-adjacent-pairs explode.

    ``AS MATERIALIZED`` on every CTE is load-bearing: w{i} references
    w{i-1} three times (directly + via two scalar subqueries over
    b{i}), so DuckDB's default CTE inlining would expand ~3^K plans.
    ``coalesce(..., chr(2))`` keeps replace() a no-op instead of
    NULLing the corpus if merges ever exhaust before round K, matching
    the Spark loop's early break. ``word`` rides through the w-CTEs so
    the tokenize oracle can map encodings back to the vocabulary (the
    train oracle simply never references it)."""
    pat = _BPE_SQL_PAT
    parts = [f"""WITH wf AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(regexp_extract_all(text, {pat})) AS word
    FROM documents) GROUP BY word),
w0 AS MATERIALIZED (
  SELECT word, freq,
         regexp_replace(word, '([\\s\\S])', chr(1) || '\\1' || chr(1), 'g')
           AS enc
  FROM wf)"""]
    for i in range(1, k + 1):
        parts.append(f"""s{i} AS MATERIALIZED (
  SELECT freq, string_split(trim(enc, chr(1)), chr(1) || chr(1)) AS syms
  FROM w{i - 1}),
p{i} AS MATERIALIZED (
  SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(syms[1:len(syms) - 1]) AS l,
           unnest(syms[2:len(syms)]) AS r
    FROM s{i} WHERE len(syms) >= 2)
  GROUP BY l, r),
b{i} AS MATERIALIZED (SELECT l, r, cnt FROM p{i}
                      ORDER BY cnt DESC, l, r LIMIT 1),
w{i} AS MATERIALIZED (
  SELECT word, freq, replace(enc,
    coalesce((SELECT chr(1) || l || chr(1) || chr(1) || r || chr(1)
              FROM b{i}), chr(2)),
    coalesce((SELECT chr(1) || l || r || chr(1) FROM b{i}), chr(2)))
    AS enc
  FROM w{i - 1})""")
    return parts


def _sql_bpe_train(k: int = 10) -> str:
    """DuckDB oracle for ``q_bpe_train``: the K argmax rounds of
    :func:`_bpe_chain`, each round's winning pair unioned out."""
    unions = [f'SELECT {i - 1} AS "rank", l AS "left", r AS "right", '
              f"cnt AS freq FROM b{i}" for i in range(1, k + 1)]
    return ",\n".join(_bpe_chain(k)) + "\n" + "\nUNION ALL ".join(unions)


SQL_BPE_TRAIN = _sql_bpe_train(10)


def _sql_bpe_tokenize(k: int = 10) -> str:
    """DuckDB oracle for ``q_bpe_tokenize``: the SAME :func:`_bpe_chain`
    plus one per-word token-count CTE ((#separators)//2 — ``//``
    because DuckDB integer ``/`` is float division) and the per-doc
    join/sum."""
    parts = _bpe_chain(k)
    parts.append(f"""wt AS MATERIALIZED (
  SELECT word,
         (len(enc) - len(replace(enc, chr(1), ''))) // 2 AS n_tok
  FROM w{k}),
d AS (
  SELECT doc_id, unnest(regexp_extract_all(text, {_BPE_SQL_PAT})) AS word
  FROM documents),
pd AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pretokens,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM d JOIN wt USING (word) GROUP BY doc_id)""")
    return (",\n".join(parts) + """
SELECT dd.doc_id,
       coalesce(pd.n_pretokens, 0) AS n_pretokens,
       coalesce(pd.n_tokens, 0) AS n_tokens,
       round(CAST(coalesce(pd.n_tokens, 0) AS DOUBLE)
             / greatest(coalesce(pd.n_pretokens, 0), 1), 6)
         AS tokens_per_pretoken
FROM documents dd LEFT JOIN pd USING (doc_id)""")


SQL_BPE_TOKENIZE = _sql_bpe_tokenize(10)


def q_quota_sample(spark, sf_dir):
    """Per-source quota capping (operators/sampling.py): at most 8
    docs per source, selected as the hash-smallest ids — a
    deterministic uniform-without-replacement sample per group with
    reservoir semantics and no state. The oracle reproduces the hash
    ranking bit-for-bit, so it checks WHICH docs were selected, not
    just how many."""
    from ..operators import sampling
    docs = _t(spark, sf_dir, "documents")
    return (sampling.quota_sample(docs, "source", "doc_id", k=8)
            .select("source", "doc_id", "n_chars"))


SQL_QUOTA_SAMPLE = """
WITH r AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substr(md5('quota|' || doc_id), 1, 15))
                         ::UBIGINT AS DOUBLE) / 1152921504606846976.0,
                    doc_id) AS rk
  FROM documents)
SELECT source, doc_id, n_chars FROM r WHERE rk <= 8
"""

def q_lang_stopword_id(spark, sf_dir):
    """Language-ID heuristic: stopword-hit scoring with deterministic
    fallback (n-gram-heuristic analog). The synthetic docs share one
    vocabulary, so the heuristic output is a deterministic function, which
    is exactly what the oracle checks."""
    docs = _t(spark, sf_dir, "documents")
    toks = r"regexp_extract_all(lower(text), '\\S+', 0)"
    en = "size(filter(%s, x -> x in ('the', 'a', 'of', 'and')))" % toks
    return docs.select(
        "doc_id", "lang",
        F.expr(f"case when {en} > 0 then 'en' else 'und' end")
        .alias("lang_guess"),
        F.expr(f"cast({en} as bigint)").alias("en_hits"),
    )


SQL_LANG_STOPWORD_ID = """
SELECT doc_id, lang,
  CASE WHEN len(list_filter(regexp_extract_all(lower(text), '\\S+'),
       x -> x IN ('the', 'a', 'of', 'and'))) > 0
       THEN 'en' ELSE 'und' END AS lang_guess,
  CAST(len(list_filter(regexp_extract_all(lower(text), '\\S+'),
       x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS en_hits
FROM documents
"""


def q_pack_sequences(spark, sf_dir):
    """Sequence packing for training examples (operators/sampling.py
    pack_sequences — GPT-style concat-and-chunk): documents laid end to
    end per source shard in doc_id order, each assigned the ctx-256
    block it starts in plus its offset, via ONE per-shard window cumsum;
    exact integer arithmetic end to end."""
    from ..operators import sampling
    docs = _t(spark, sf_dir, "documents")
    return sampling.pack_sequences(docs, ctx_len=256)


SQL_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS s
  FROM t)
SELECT doc_id, source, n_tokens,
       CAST(s // 256 AS BIGINT) AS example_id,
       CAST(s % 256 AS BIGINT) AS start_offset
FROM c
"""


def q_gopher_quality(spark, sf_dir):
    """Gopher/FineWeb-style repetition filters — the quality gates real
    pretraining recipes run beside stopword/length stats
    (q_quality_score): per-doc duplicate-bigram fraction (1 - distinct/
    total bigrams) and top-word fraction (most frequent word / words),
    plus the keep decision at the recipe thresholds. A doc stuck in a
    loop ("batch batch batch ...") fails both.

    Scale shape: two exploded relations, each collapsed by map-side-
    combinable aggs keyed by doc (bigram side: count + count_distinct;
    word side: (doc, word) partial counts then per-doc max/sum), joined
    back to the doc spine. No windows, no UDFs; the ratios are exact
    rationals so the oracle matches bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    ws = docs.select(
        "doc_id",
        F.expr(r"regexp_extract_all(lower(text), '\\S+', 0)").alias("w"))
    bi = (ws.filter(F.size("w") >= 2)
          .select("doc_id",
                  F.expr("explode(transform(sequence(0, size(w)-2), "
                         "i -> concat(w[i], ' ', w[i+1])))").alias("b")))
    bi_agg = bi.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bi"),
        F.count_distinct("b").alias("n_bi_distinct"))
    wx = (ws.select("doc_id", F.explode("w").alias("word"))
          .groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
          .groupBy("doc_id").agg(F.max("c").alias("mx"),
                                 F.sum("c").alias("tot")))
    dup = F.round(F.coalesce(
        F.lit(1.0) - F.col("n_bi_distinct").cast("double") / F.col("n_bi"),
        F.lit(0.0)), 6)
    twf = F.round(F.coalesce(
        F.col("mx").cast("double") / F.col("tot"), F.lit(0.0)), 6)
    # greatest(coalesce(size, 0), 0): size() is NULL for NULL text under
    # the default conf but -1 under spark.sql.legacy.sizeOfNull — clamp
    # both to 0 so the relation is conf-independent (same hazard fixed in
    # ngram_jaccard_pairs; the oracle mirrors with coalesce(len, 0)).
    return (docs.select("doc_id", F.greatest(F.coalesce(F.size(
                F.expr(r"regexp_extract_all(lower(text), '\\S+', 0)")),
                F.lit(0)), F.lit(0))
                .cast("bigint").alias("n_words"))
            .join(bi_agg, "doc_id", "left")
            .join(wx, "doc_id", "left")
            .select("doc_id", "n_words",
                    dup.alias("dup_bigram_frac"),
                    twf.alias("top_word_frac"),
                    ((dup <= 0.05) & (twf <= 0.12)).cast("int")
                    .alias("keep")))


SQL_GOPHER_QUALITY = r"""
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents),
bi AS (
  SELECT doc_id,
         count(*) AS n_bi,
         count(DISTINCT b) AS n_bi_distinct
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                                     i -> w[i] || ' ' || w[i+1])) AS b
        FROM ws WHERE len(w) >= 2) x
  GROUP BY doc_id),
wx AS (
  SELECT doc_id, max(c) AS mx, sum(c) AS tot
  FROM (SELECT doc_id, word, count(*) AS c
        FROM (SELECT doc_id, unnest(w) AS word FROM ws) u
        GROUP BY 1, 2) y
  GROUP BY doc_id),
base AS (
  SELECT s.doc_id, CAST(coalesce(len(s.w), 0) AS BIGINT) AS n_words,
         round(coalesce(1.0 - CAST(b.n_bi_distinct AS DOUBLE) / b.n_bi,
                        0.0), 6) AS dup_bigram_frac,
         round(coalesce(CAST(w2.mx AS DOUBLE) / w2.tot, 0.0), 6)
           AS top_word_frac
  FROM ws s LEFT JOIN bi b USING (doc_id) LEFT JOIN wx w2 USING (doc_id))
SELECT doc_id, n_words, dup_bigram_frac, top_word_frac,
       CASE WHEN dup_bigram_frac <= CAST(0.05 AS DOUBLE)
             AND top_word_frac <= CAST(0.12 AS DOUBLE)
            THEN 1 ELSE 0 END AS keep
FROM base
"""
