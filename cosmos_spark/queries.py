"""Driver-contract queries: one entry per SURVEY §2 operator family, plus
the training-data-pipeline operator set (dedup / similarity / text stats),
each runnable on the TPC-H-ish tables in /root/testdata/sf*/.

Registry shape: ``QUERIES[name] = (spark_fn, oracle_sql)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is ANSI SQL that
DuckDB runs against the same parquet files (views pre-registered by the
driver). Column names and types are aligned on both sides because the
driver's compare hashes values after sorting columns by name.

Every Spark implementation is declarative DataFrame API (Catalyst handles
pushdown/pruning/join selection); floats that cross engines are rounded to
a stable precision before they become sort keys or output.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# relational operator families (SURVEY §2.2-2.8)
# ---------------------------------------------------------------------------

def q_filter_project(spark, sf_dir):
    """P1/P2/P6/P7 + F-scalars: predicate pushdown + column pruning."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 30) & (F.col("l_discount") >= 0.05))
        .select(
            "l_orderkey", "l_linenumber", "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue"))
    )


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem WHERE l_quantity > 30 AND l_discount >= 0.05
"""


def q_groupby_agg(spark, sf_dir):
    """A1/A3/A8 + TPC-H Q1 shape: partial+final hash aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .cast("double").alias("sum_qty"),
             F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
             .cast("double").alias("sum_base_price"),
             (F.sum(F.col("l_discount").cast("decimal(18,6)"))
              .cast("double") / F.count(F.lit(1))).alias("avg_disc"),
             F.count(F.lit(1)).alias("count_order"))
    )


SQL_GROUPBY_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_broadcast_join(spark, sf_dir):
    """J4/J5 analog: small dims broadcast into the fact scan."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust),
                    orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").alias("total_revenue"),
             F.count(F.lit(1)).alias("order_count"))
    )


SQL_BROADCAST_JOIN = """
SELECT n_name,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       count(*) AS order_count
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_semi_join(spark, sf_dir):
    """P8/J7: left-semi join (doc-subset filter analog)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"],
                  "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
"""


def q_anti_join(spark, sf_dir):
    """J9/U3: left-anti join (missed-refs analog)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"],
                  "left_anti")
        .select("c_custkey", "c_name")
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_topk_per_group(spark, sf_dir):
    """W5/L3: row_number window, top-3 per group, deterministic tiebreak."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


SQL_TOPK_PER_GROUP = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


def q_interval_join(spark, sf_dir):
    """J1/J2: equi + range predicate (text-pooling spatial join analog) —
    lineitems shipped within 60 days of their order's date."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    joined = li.join(
        orders,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (F.col("l_shipdate").cast("date") >= F.col("o_orderdate").cast("date"))
        & (F.col("l_shipdate").cast("date")
           <= F.date_add(F.col("o_orderdate").cast("date"), 60)),
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_fast"),
             F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
             .cast("double").alias("fast_price"))
    )


SQL_INTERVAL_JOIN = """
SELECT l_returnflag, count(*) AS n_fast,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS fast_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
 AND CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
 AND CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
GROUP BY l_returnflag
"""


def q_section_window(spark, sf_dir):
    """G3: section assembly — running count of 'signup' markers per user
    splits the event stream into sections; aggregate per section."""
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        ev.withColumn(
            "section",
            F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            .over(w))
        .groupBy("user_id", "section")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)"))
             .cast("double").alias("section_value"))
    )


SQL_SECTION_WINDOW = """
SELECT user_id, CAST(section AS BIGINT) AS section, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS section_value
FROM (
  SELECT user_id, value,
         sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS section
  FROM events)
GROUP BY user_id, section
"""


def q_union_distinct(spark, sf_dir):
    """U1/A8: union + distinct."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp).distinct()


SQL_UNION_DISTINCT = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_set_except(spark, sf_dir):
    """U3: set difference — nations with customers but no suppliers."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")).distinct()
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")).distinct()
    return cust.exceptAll(supp)


SQL_SET_EXCEPT = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
"""


def q_pagination(spark, sf_dir):
    """L1: deterministic page 2 (rows 31-60) of the order list.
    TakeOrderedAndProject shape (orderBy + limit(hi), rank over the <= 60
    retained rows) — never a single-reducer window over the full table."""
    from .operators import ranks
    orders = _t(spark, sf_dir, "orders")
    return ranks.paginate(
        orders, [F.desc("o_totalprice"), F.asc("o_orderkey")],
        page=1, per_page=30, rank_col="rn",
    ).select("o_orderkey", "o_totalprice", "rn")


SQL_PAGINATION = """
SELECT o_orderkey, o_totalprice, rn FROM (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn > 30 AND rn <= 60
"""


def q_asof_join(spark, sf_dir):
    """J3/J10 analog (nearest-neighbor/as-of): for each error event, the
    most recent prior signup ts of the same user."""
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("err_ts"))
    sign = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"))
    return (
        err.join(sign, (err["user_id"] == sign["s_user"])
                 & (sign["s_ts"] <= err["err_ts"]), "left")
        .groupBy("event_id", "user_id")
        .agg(F.max("s_ts").alias("last_signup_ts"))
    )


SQL_ASOF_JOIN = """
SELECT e.event_id, e.user_id, max(s.ts) AS last_signup_ts
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND s.ts <= e.ts
GROUP BY e.event_id, e.user_id
"""


def q_regex_extract(spark, sf_dir):
    """F3/F4: regex scalars — first token of part names, cleaned + counted."""
    part = _t(spark, sf_dir, "part")
    return (
        part.withColumn("first_word",
                        F.regexp_extract(F.lower(F.trim(F.col("p_name"))),
                                         r"^(\w+)", 1))
        .groupBy("first_word")
        .agg(F.count(F.lit(1)).alias("n_parts"),
             (F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
              .cast("double") / F.count(F.lit(1))).alias("avg_price"))
    )


SQL_REGEX_EXTRACT = """
SELECT regexp_extract(lower(trim(p_name)), '^(\\w+)', 1) AS first_word,
       count(*) AS n_parts,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
FROM part GROUP BY 1
"""


def q_sha256_hash(spark, sf_dir):
    """F10: content-hash ids (the per-row sha256 invariant)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha"))


SQL_SHA256_HASH = """
SELECT doc_id, sha256(text) AS text_sha FROM documents
"""


def q_json_extract(spark, sf_dir):
    """F11: JSON round-trip — pull props.k out of the events props blob."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_id",
                  F.get_json_object(F.col("props"), "$.k").cast("bigint")
                  .alias("k_val"))
        .filter(F.col("k_val") > 50)
    )


SQL_JSON_EXTRACT = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
"""


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
from .operators.bpe import DEFAULT_PATTERN as _BPE_PAT  # noqa: E402


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


def q_ngram_fingerprint(spark, sf_dir):
    """Document fingerprint: min over word 3-gram shingles of md5(shingle)
    (portable hash), the MinHash building block — batched Arrow UDF
    (the SQL-HOF formulation is interpreted per element, ~15x slower)."""
    from .operators import dedup
    docs = _t(spark, sf_dir, "documents")
    fp = dedup.shingle_fingerprint(docs, "doc_id", "text")
    return (fp.select(F.col("id").alias("doc_id"), "fingerprint")
            .filter(F.col("fingerprint").isNotNull()))


SQL_NGRAM_FINGERPRINT = """
WITH sh AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(len(regexp_extract_all(lower(text), '\\S+')) - 1, 1)),
           i -> md5(array_to_string(
                  list_slice(regexp_extract_all(lower(text), '\\S+'), i, i + 2),
                  ' '))) AS hashes
  FROM documents)
SELECT doc_id, list_min(hashes) AS fingerprint
FROM sh WHERE len(hashes) > 0
"""


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) local fingerprints: char-5-gram md5s, window-4
    min selection — guarantees any shared substring of length >= 8 chars
    between two docs shares a fingerprint, at ~2/(w+1) selection density.
    Complements whole-doc MinHash for local-overlap detection."""
    from .operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return (dedup.winnow_fingerprints(docs, "doc_id", "text")
            .select(F.col("id").alias("doc_id"), "fp"))


SQL_WINNOW_FP = """
WITH hs AS (
  SELECT doc_id,
         list_transform(range(1, len(text) - 5 + 2),
                        i -> md5(substr(text, i, 5))) AS h
  FROM documents WHERE len(text) >= 5),
w AS (
  SELECT doc_id,
         CASE WHEN len(h) <= 4 THEN [list_min(h)]
              ELSE list_transform(range(1, len(h) - 2),
                                  j -> list_min(list_slice(h, j, j + 3)))
         END AS mins FROM hs)
SELECT DISTINCT doc_id, unnest(mins) AS fp FROM w
"""



def _memo_scope(memo: dict, spark) -> None:
    """Evict entries of OTHER Spark applications before use: app-keyed
    memos otherwise accumulate dead DataFrames (pinning stopped
    sessions' plans) in long-lived processes that restart Spark."""
    app = spark.sparkContext.applicationId
    for k in [k for k in memo if k[0] != app]:
        del memo[k]

_KMV_MEMO: dict[tuple[str, str], object] = {}


def _lang_ngram_sketch(spark, sf_dir):
    """The (lang x gram-order) KMV sketch shared by q_kmv_distinct and
    q_kmv_set_ops — memoized per Spark application (the kg-trio
    pattern) so the fused full-corpus tokenize+hash scan runs once per
    bench/driver pass; the sketch itself is groups x k, tiny, so the
    eager localCheckpoint is free."""
    from .operators import sketch
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
    from .operators import sketch
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
    from .operators import sampling
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


def q_bpe_train(spark, sf_dir):
    """BPE tokenizer training (operators/bpe.py): learn the first 10
    merges from the documents corpus. The corpus collapses to the
    word-frequency dim first; each round is one combiner-friendly pair
    count + a LIMIT-1 argmax + one narrow Arrow rewrite. Rows-only at
    the driver (the K-round argmax loop is not one SQL statement); the
    value gate is pytest parity against an independent driver-side
    reference implementation."""
    from .operators import bpe
    docs = _t(spark, sf_dir, "documents")
    return bpe.train_bpe(spark, docs, "text", num_merges=10)


def q_quota_sample(spark, sf_dir):
    """Per-source quota capping (operators/sampling.py): at most 8
    docs per source, selected as the hash-smallest ids — a
    deterministic uniform-without-replacement sample per group with
    reservoir semantics and no state. The oracle reproduces the hash
    ranking bit-for-bit, so it checks WHICH docs were selected, not
    just how many."""
    from .operators import sampling
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
    from .operators import sketch
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


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: the ANN baseline. Query = vector 0; rounded
    before ranking so the cross-engine float comparison is stable."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q"))
    joined = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qvec))
    dot = "aggregate(zip_with(cast(embedding as array<double>), cast(q as array<double>), (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
    na = "sqrt(aggregate(cast(embedding as array<double>), 0.0D, (acc, v) -> acc + v * v))"
    nb = "sqrt(aggregate(cast(q as array<double>), 0.0D, (acc, v) -> acc + v * v))"
    scored = joined.select(
        "vec_id",
        F.expr(f"round(({dot}) / (({na}) * ({nb})), 4)").alias("cos_sim"))
    # distributed top-k: orderBy+limit plans as TakeOrderedAndProject
    # (per-partition take, driver merge of k rows) — no global-window
    # single-reducer Exchange ever forms; rn is a window over just k rows.
    top = scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        top.withColumn("rn", F.row_number().over(w))
        .select("vec_id", "cos_sim", "rn")
    )


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))), 4)
           AS cos_sim
  FROM embeddings, q WHERE vec_id <> 0)
SELECT vec_id, cos_sim, rn FROM (
  SELECT vec_id, cos_sim,
         row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored) WHERE rn <= 10
"""


def q_embedding_norms(spark, sf_dir):
    """Array math (F8 analog): per-vector L2 norm + dimension, grouped by
    label — the embedding-stat scan an ANN index build starts with."""
    emb = _t(spark, sf_dir, "embeddings")
    norm = ("sqrt(aggregate(cast(embedding as array<double>), 0.0D,"
            " (acc, v) -> acc + v * v))")
    return (
        emb.select("label", F.expr(f"round({norm}, 4)").alias("l2"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             (F.sum(F.col("l2").cast("decimal(18,4)")).cast("double")
              / F.count(F.lit(1))).alias("avg_l2"))
    )


SQL_EMBEDDING_NORMS = """
SELECT label, count(*) AS n_vecs,
       CAST(sum(CAST(l2 AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_l2
FROM (SELECT label,
             round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))), 4) AS l2
      FROM embeddings)
GROUP BY label
"""


# ---------------------------------------------------------------------------
# KG pipeline stages over `documents` mapped to the source shape
# ---------------------------------------------------------------------------

def _docs_as_source(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def q_kg_segments(spark, sf_dir):
    """The segmentation stage on the stand-in corpus. The synthetic docs are
    single-line, so each non-blank doc yields exactly one 'other' segment —
    which makes the content-hash seg_id SQL-replicable (the determinism
    check for F10-style ids)."""
    from . import pipeline as P
    segs = P.segments_of(_docs_as_source(spark, sf_dir))
    return segs.select("repo", "path", "seg_id", "kind",
                       "line_start", "line_end", "content_sha256")


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

SQL_KG_SEGMENTS = rf"""
SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path,
       substr(sha256(source || '|' || CAST(doc_id AS VARCHAR) || '|1|1|' || text), 1, 16) AS seg_id,
       {_SQL_KIND_CASE} AS kind,
       1 AS line_start, 1 AS line_end,
       sha256(text) AS content_sha256
FROM documents WHERE regexp_matches(text, '\S')
"""


def q_kg_member_triples(spark, sf_dir):
    """The member_of triple family end-to-end on the stand-in corpus."""
    from . import pipeline as P
    segs = P.segments_of(_docs_as_source(spark, sf_dir))
    return segs.select(
        F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"),
                    F.lit("#"), F.col("seg_id")).alias("subj"),
        F.lit("member_of").alias("pred"),
        F.concat_ws("/", "repo", "path").alias("obj"),
    )


SQL_KG_MEMBER_TRIPLES = r"""
SELECT source || '/' || CAST(doc_id AS VARCHAR) || '#'
       || substr(sha256(source || '|' || CAST(doc_id AS VARCHAR) || '|1|1|' || text), 1, 16) AS subj,
       'member_of' AS pred,
       source || '/' || CAST(doc_id AS VARCHAR) AS obj
FROM documents WHERE regexp_matches(text, '\S')
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (the classic clickstream rollup): per
    user, a >30-minute silence starts a new session; emit one row per
    session with its bounds and event count. Both windows partition by
    user_id — work distributes across users, no global ordering ever
    forms (scale-safe by construction; per-user event counts are
    bounded by retention, and AQE absorbs residual hot users)."""
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    # interval arithmetic: ts is TIMESTAMP_NTZ (unix_micros rejects it)
    # and intervals are timezone-proof in both engines
    gap = F.col("ts") - F.lag("ts").over(w)
    new_sess = F.when(gap.isNull() |
                      (gap > F.expr("INTERVAL '30' MINUTE")), 1) \
        .otherwise(0)
    sess = (ev.withColumn("session_idx",
                          F.sum(new_sess).over(
                              w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end")))


SQL_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM numbered GROUP BY user_id, session_idx
"""


def q_rollup_agg(spark, sf_dir):
    """Hierarchical GROUPING SETS (ROLLUP) — per (status, priority),
    per status, and grand total in one pass; Spark plans a single
    Expand + hash aggregate, the multi-level rollup shape warehouse
    reporting uses instead of N separate scans."""
    orders = _t(spark, sf_dir, "orders")
    return (orders.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("total_price")))


SQL_ROLLUP_AGG = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def q_pivot_agg(spark, sf_dir):
    """PIVOT (long -> wide conditional aggregation): order counts and
    revenue per status, one column pair per priority class. Explicit
    pivot values keep the plan a single pass (no extra distinct-values
    job) — the shape to insist on at scale."""
    orders = _t(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pivoted = (orders.groupBy("o_orderstatus")
               .pivot("o_orderpriority", prios)
               .agg(F.count(F.lit(1))))
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"n_p{i + 1}")
        for i, p in enumerate(prios)]
    return pivoted.select(*cols)


SQL_PIVOT_AGG = """
SELECT o_orderstatus,
       count(*) FILTER (o_orderpriority = '1-URGENT')        AS n_p1,
       count(*) FILTER (o_orderpriority = '2-HIGH')          AS n_p2,
       count(*) FILTER (o_orderpriority = '3-MEDIUM')        AS n_p3,
       count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS n_p4,
       count(*) FILTER (o_orderpriority = '5-LOW')           AS n_p5
FROM orders GROUP BY o_orderstatus
"""


def q_percentiles(spark, sf_dir):
    """Exact percentiles (linear interpolation) of order totals per
    status. `percentile` is the exact aggregate — at true scale swap in
    `approx_percentile` (t-digest) for one-pass bounded memory; the
    driver gate needs the exact one because approximation is
    engine-specific."""
    orders = _t(spark, sf_dir, "orders")
    pr = F.col("o_totalprice").cast("double")
    return (orders.groupBy("o_orderstatus")
            .agg(F.expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5)")
                 .alias("p50"),
                 F.expr("percentile(CAST(o_totalprice AS DOUBLE), 0.9)")
                 .alias("p90"),
                 F.min(pr).alias("lo"), F.max(pr).alias("hi")))


SQL_PERCENTILES = """
SELECT o_orderstatus,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS p50,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) AS p90,
       min(CAST(o_totalprice AS DOUBLE)) AS lo,
       max(CAST(o_totalprice AS DOUBLE)) AS hi
FROM orders GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, tuple[Callable, str | None]] = {
    "q_filter_project": (q_filter_project, SQL_FILTER_PROJECT),
    "q_groupby_agg": (q_groupby_agg, SQL_GROUPBY_AGG),
    "q_broadcast_join": (q_broadcast_join, SQL_BROADCAST_JOIN),
    "q_semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "q_anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "q_topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "q_interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "q_section_window": (q_section_window, SQL_SECTION_WINDOW),
    "q_union_distinct": (q_union_distinct, SQL_UNION_DISTINCT),
    "q_set_except": (q_set_except, SQL_SET_EXCEPT),
    "q_pagination": (q_pagination, SQL_PAGINATION),
    "q_asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "q_sessionize": (q_sessionize, SQL_SESSIONIZE),
    "q_rollup_agg": (q_rollup_agg, SQL_ROLLUP_AGG),
    "q_pivot_agg": (q_pivot_agg, SQL_PIVOT_AGG),
    "q_percentiles": (q_percentiles, SQL_PERCENTILES),
    "q_regex_extract": (q_regex_extract, SQL_REGEX_EXTRACT),
    "q_sha256_hash": (q_sha256_hash, SQL_SHA256_HASH),
    "q_json_extract": (q_json_extract, SQL_JSON_EXTRACT),
    "q_dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "q_token_count": (q_token_count, SQL_TOKEN_COUNT),
    "q_bpe_token_count": (q_bpe_token_count, SQL_BPE_TOKEN_COUNT),
    "q_quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "q_ngram_fingerprint": (q_ngram_fingerprint, SQL_NGRAM_FINGERPRINT),
    "q_winnow_fingerprints": (q_winnow_fingerprints, SQL_WINNOW_FP),
    "q_kmv_distinct": (q_kmv_distinct, SQL_KMV_DISTINCT),
    "q_kmv_set_ops": (q_kmv_set_ops, SQL_KMV_SET_OPS),
    "q_cms_heavy_hitters": (q_cms_heavy_hitters, SQL_CMS_HEAVY_HITTERS),
    "q_training_mix": (q_training_mix, SQL_TRAINING_MIX),
    "q_quota_sample": (q_quota_sample, SQL_QUOTA_SAMPLE),
    "q_pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "q_bpe_train": (q_bpe_train, None),
    "q_train_split": (q_train_split, SQL_TRAIN_SPLIT),
    "q_decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "q_bm25": (q_bm25, SQL_BM25),
    "q_lang_stopword_id": (q_lang_stopword_id, SQL_LANG_STOPWORD_ID),
    "q_ann_cosine_topk": (q_ann_cosine_topk, SQL_ANN_COSINE_TOPK),
    "q_embedding_norms": (q_embedding_norms, SQL_EMBEDDING_NORMS),
    "q_kg_segments": (q_kg_segments, SQL_KG_SEGMENTS),
    "q_kg_member_triples": (q_kg_member_triples, SQL_KG_MEMBER_TRIPLES),
}


# ---------------------------------------------------------------------------
# dedup / similarity operator queries (cross-checked signatures)
# ---------------------------------------------------------------------------

def q_simhash_bands(spark, sf_dir):
    """SimHash: 64-bit signature split into 4 x 16-bit LSH bands (the
    near-dup banding key). Cross-engine check of the full bit pipeline."""
    from .operators import dedup
    docs = _t(spark, sf_dir, "documents").filter(
        F.expr(r"size(regexp_extract_all(text, '\\S+', 0)) > 0"))
    sigs = dedup.simhash_signatures(docs, "doc_id", "text")
    return sigs.select(
        F.col("id").alias("doc_id"),
        F.explode(F.expr(
            "transform(sequence(0, 3), b -> struct(cast(b as int) as band, "
            "shiftright(simhash, b * 16) & 65535L as bval))")).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bval")


SQL_SIMHASH_BANDS = r"""
WITH tok AS (
  SELECT doc_id,
         ('0x'||substr(md5(t),1,8))::BIGINT AS hi,
         ('0x'||substr(md5(t),9,8))::BIGINT AS lo
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS t
        FROM documents)
),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (CASE WHEN b < 32 THEN (lo >> b) & 1
                        ELSE (hi >> (b - 32)) & 1 END) = 1
             THEN 1 ELSE -1 END) AS v
  FROM tok, range(64) r(b)
  GROUP BY doc_id, b
)
SELECT doc_id, CAST(b // 16 AS INT) AS band,
       CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << (b % 16)) ELSE 0 END)
            AS BIGINT) AS bval
FROM bits GROUP BY doc_id, b // 16
"""


def q_minhash_sig(spark, sf_dir):
    """MinHash signature rows (doc_id, hash_idx, minhash) — the LSH
    building block, one row per (doc, hash function)."""
    from .operators import dedup
    docs = _t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=16)
    return sigs.select(
        F.col("id").alias("doc_id"),
        F.posexplode("sig").alias("h", "mh"))


SQL_MINHASH_SIG = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
           FROM documents),
sh AS (SELECT doc_id,
              unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                     i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                AS s
       FROM t WHERE len(toks) >= 3),
hs AS (SELECT doc_id,
              ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h1,
              ('0x' || substr(md5(s), 17, 16))::UBIGINT AS h2
       FROM sh),
mh AS (SELECT doc_id, h,
              min(CAST((h1::UHUGEINT + h::UHUGEINT * h2::UHUGEINT)
                       % 18446744073709551616::UHUGEINT AS UBIGINT)) AS u
       FROM hs, range(16) r(h) GROUP BY doc_id, h)
SELECT doc_id, CAST(h AS INT) AS h,
       CASE WHEN u >= 9223372036854775808::UBIGINT
            THEN (u::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT
            ELSE u::BIGINT END AS mh
FROM mh
"""


def q_lsh_bucket(spark, sf_dir):
    """Random-hyperplane LSH bucket ids over the embeddings table — the
    ANN index build, cross-checked bit-for-bit (hyperplanes derived from
    md5, no RNG)."""
    from .operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.rhp_lsh_buckets(emb, n_planes=8, dim=64)


SQL_LSH_BUCKET = r"""
WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) - 1 AS d
           FROM embeddings),
proj AS (SELECT vec_id, p,
                sum(x * (('0x'||substr(md5(p::VARCHAR||'|'||d::VARCHAR),1,4))::BIGINT
                         - 32767.5)) AS dot
         FROM e, range(8) r(p) GROUP BY vec_id, p)
SELECT vec_id,
       CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS INT)
         AS bucket
FROM proj GROUP BY vec_id
"""


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payload column -> mapInPandas feature
    extraction (stub decoder); byte length / sha / fake dims are
    SQL-replicable so the Arrow binary round-trip is verified."""
    from .operators import multimodal
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
    from .operators import multimodal
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


QUERIES.update({
    "q_simhash_bands": (q_simhash_bands, SQL_SIMHASH_BANDS),
    "q_minhash_sig": (q_minhash_sig, SQL_MINHASH_SIG),
    "q_lsh_bucket": (q_lsh_bucket, SQL_LSH_BUCKET),
    "q_media_features": (q_media_features, SQL_MEDIA_FEATURES),
    "q_media_frames": (q_media_frames, SQL_MEDIA_FRAMES),
})


# ---------------------------------------------------------------------------
# iterative CC / LSH pairs / greedy association / retrieval / streaming
# ---------------------------------------------------------------------------

def q_cc_components(spark, sf_dir):
    """General iterative connected components (operators.graph — the
    min-label-propagation loop, SURVEY §2.4 G1/G5 scale path) over star
    edges linking docs that share a fingerprint; component = min doc_id,
    which the oracle reproduces relationally."""
    from .operators import graph
    docs = _t(spark, sf_dir, "documents")
    from .operators import dedup as _dd
    fp = (_dd.shingle_fingerprint(docs, "doc_id", "text")
          .select(F.col("id").alias("doc_id"),
                  F.col("fingerprint").alias("fp"))
          .filter(F.col("fp").isNotNull())
          .persist())  # feeds the window AND the node list
    w = Window.partitionBy("fp")
    star = fp.withColumn("head", F.min("doc_id").over(w))
    edges = (star.filter(F.col("doc_id") != F.col("head"))
             .select(F.col("head").alias("src"),
                     F.col("doc_id").alias("dst")))
    nodes = fp.select(F.col("doc_id").alias("node"))
    cc = graph.connected_components(nodes, edges)
    # cc is eagerly materialized (localCheckpoint) by the loop above, so the
    # fingerprint cache can be released before the result is consumed.
    fp.unpersist()
    return cc.select(F.col("node").alias("doc_id"),
                     F.col("component").alias("component_id"))


SQL_CC_COMPONENTS = r"""
WITH sh AS (
  SELECT doc_id,
         list_min(list_transform(
           range(1, greatest(len(regexp_extract_all(lower(text), '\S+')) - 1, 1)),
           i -> md5(array_to_string(
                  list_slice(regexp_extract_all(lower(text), '\S+'), i, i + 2),
                  ' ')))) AS fp
  FROM documents
  WHERE len(regexp_extract_all(lower(text), '\S+')) >= 3)
SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS component_id FROM sh
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    """Full MinHash+LSH near-dup candidate pairs (shingle -> minhash ->
    band -> bucket-join), cross-checked hash-for-hash."""
    from .operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=16,
                                   bands=4, max_bucket=50)


SQL_MINHASH_LSH_PAIRS = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
           FROM documents),
sh AS (SELECT doc_id,
              unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                     i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                AS s
       FROM t WHERE len(toks) >= 3),
hs AS (SELECT doc_id,
              ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h1,
              ('0x' || substr(md5(s), 17, 16))::UBIGINT AS h2
       FROM sh),
mhu AS (SELECT doc_id, h,
               min(CAST((h1::UHUGEINT + h::UHUGEINT * h2::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT)) AS u
        FROM hs, range(16) r(h) GROUP BY doc_id, h),
mh AS (SELECT doc_id, h,
              CASE WHEN u >= 9223372036854775808::UBIGINT
                   THEN (u::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT
                   ELSE u::BIGINT END AS mh
       FROM mhu),
banded AS (SELECT doc_id, h // 4 AS band,
                  md5(string_agg(mh::VARCHAR, '|' ORDER BY h)) AS bhash
           FROM mh GROUP BY doc_id, h // 4),
buckets AS (SELECT band, bhash, count(*) AS c FROM banded GROUP BY 1, 2)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a
JOIN banded b ON a.band = b.band AND a.bhash = b.bhash
             AND a.doc_id < b.doc_id
JOIN buckets k ON k.band = a.band AND k.bhash = a.bhash
WHERE k.c <= 50
"""


def _assoc_source(spark, sf_dir):
    """Deterministic multi-block files built from the documents table: per
    source, one python file of '# c<id>' comment + 'def f<id>' function
    blocks in doc_id order — each comment's nearest object is its own
    function (own=2 lines away, neighbors >=3), so the greedy outcome is
    relationally decidable while still running the real pool-pop kernel."""
    docs = _t(spark, sf_dir, "documents")
    block = F.concat(
        F.lit("# c"), F.col("doc_id").cast("string"),
        F.lit("\n\ndef f"), F.col("doc_id").cast("string"),
        F.lit("(x):\n    return x"))
    per_src = (
        docs.select("source", F.struct(F.col("doc_id"), block.alias("b"))
                    .alias("s"))
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .select(
            F.col("source").alias("repo"),
            F.lit("assoc.py").alias("path"),
            F.lit("0" * 40).alias("commit"),
            F.lit("python").alias("lang"),
            F.array_join(F.expr("transform(ss, x -> x.b)"), "\n\n")
            .alias("content"))
    )
    return per_src


def q_greedy_assoc(spark, sf_dir):
    """Greedy nearest-neighbor association (J3/J10 pool-pop kernel via
    applyInPandas) on the constructed corpus."""
    from . import pipeline as P
    from .operators import assoc
    segs = P.segments_of(_assoc_source(spark, sf_dir))
    return assoc.associate_comments(segs)


SQL_GREEDY_ASSOC = """
WITH d AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS p
  FROM documents)
SELECT source AS repo, 'assoc.py' AS path,
       substr(sha256(source || '|assoc.py|' || (5 * p + 1) || '|' || (5 * p + 1)
              || '|# c' || doc_id), 1, 16) AS comment_seg_id,
       substr(sha256(source || '|assoc.py|' || (5 * p + 3) || '|' || (5 * p + 4)
              || '|def f' || doc_id || '(x):' || chr(10) || '    return x'),
              1, 16) AS object_seg_id,
       'function' AS object_kind,
       2 AS line_distance
FROM d
"""


def q_search_pagination(spark, sf_dir):
    """Query-path retrieval (SURVEY §3.3): term search + class filter +
    deterministic pagination over KG segments (L1/J7 analog)."""
    from . import pipeline as P
    from . import retrieval
    segs = P.segments_of(_docs_as_source(spark, sf_dir))
    page = retrieval.search_segments(segs, terms=["value"], kinds=["other"],
                                     page=1, per_page=25)
    return page.select("seg_id", "kind", "line_start", "score")


SQL_SEARCH_PAGINATION = r"""
WITH segs AS (
  SELECT substr(sha256(source || '|' || CAST(doc_id AS VARCHAR)
                || '|1|1|' || text), 1, 16) AS seg_id,
         'other' AS kind, 1 AS line_start, 0.5 AS score
  FROM documents
  WHERE regexp_matches(text, '\S') AND contains(text, 'value')
        AND NOT regexp_matches(text, '(?m)^[ \t]*[^#/\-\s]') = false)
SELECT seg_id, kind, line_start, score FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, seg_id) AS rn FROM segs)
WHERE rn > 25 AND rn <= 50
"""


_STREAM_SEQ = [0]


def _tmpdir(prefix: str) -> str:
    """Process-lifetime temp dir, reclaimed at exit via the pipeline's
    tracked-cleanup list (the r1 ADVICE temp-leak fix, applied to the
    streaming queries' source/checkpoint dirs too)."""
    import tempfile

    from . import pipeline as P
    d = tempfile.mkdtemp(prefix=prefix)
    P._TEMP_DIRS.append(d)
    return d


def q_stream_kind_counts(spark, sf_dir):
    """Structured Streaming: file-source stream of the documents table ->
    the same segmentation mapInPandas kernel -> stateful per-kind counts,
    drained with availableNow into a memory sink. Non-SQL-expressible
    (streaming lifecycle) -> rows-only driver check; determinism of the
    counts themselves is covered by q_kg_segments."""
    import os

    from pyspark.sql import types as T

    from . import pipeline as P

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    # the streaming file source wants a directory: stage the single table
    # file into one via symlink (zero copy)
    stream_dir = _tmpdir("stream_src_")
    os.symlink(os.path.abspath(f"{sf_dir}/documents.parquet"),
               os.path.join(stream_dir, "documents.parquet"))
    src = (
        spark.readStream.schema(schema)
        .parquet(stream_dir)
        .select(F.col("source").alias("repo"),
                F.col("doc_id").cast("string").alias("path"),
                F.lit("0" * 40).alias("commit"),
                F.col("lang"),
                F.col("text").alias("content"))
    )
    segs = P.segments_of(src)
    counts = segs.groupBy("kind").agg(F.count(F.lit(1)).alias("n_segments"))
    _STREAM_SEQ[0] += 1
    name = f"stream_kind_counts_{_STREAM_SEQ[0]}"
    q = (
        counts.writeStream.outputMode("complete").format("memory")
        .queryName(name)
        .option("checkpointLocation", _tmpdir("ck_stream_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def q_stream_first_seen(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): per-repo
    first-seen/duplicate counters with group state carried across
    micro-batches — streaming lifecycle, rows-only driver check (state
    semantics are pytest-asserted in tests/test_streaming.py)."""
    from .streaming.ingest import stream_first_seen

    src_dir = _tmpdir("stream_fs_src_")
    _docs_as_source(spark, sf_dir).write.mode("overwrite").parquet(src_dir)
    out = stream_first_seen(spark, src_dir)
    _STREAM_SEQ[0] += 1
    name = f"stream_first_seen_{_STREAM_SEQ[0]}"
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName(name)
        .option("checkpointLocation", _tmpdir("ck_fs_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def q_stream_triples(spark, sf_dir):
    """Continuous KG construction end-to-end, VALUE-exact: the linking
    corpus streamed through `streaming.ingest.stream_triples` (fused
    kernel -> stateless triple families + stream-static broadcast
    linking + zero-state keep-max mentions dedup), drained with
    availableNow into a parquet sink and read back. Unlike the other two
    streaming queries (rows-only by protocol), every emitted family here
    is SQL-decidable on the constructed corpus, so the oracle checks the
    full (subj, pred, obj, repo, score) relation."""
    from .streaming.ingest import stream_triples

    src_dir = _tmpdir("stream_kg_src_")
    (_linking_source(spark, sf_dir)
     .withColumn("ingested_at",
                 F.to_timestamp(F.lit("2026-01-01 00:00:00")))
     .write.mode("overwrite").parquet(src_dir))
    aliases = _linking_pipeline(spark, sf_dir)["aliases"]
    out_dir = _tmpdir("stream_kg_out_")
    q = (
        stream_triples(spark, src_dir, aliases=aliases)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", _tmpdir("ck_kg_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).select(
        "subj", "pred", "obj", "repo", "score")


def q_stream_join(spark, sf_dir):
    """Watermarked stream-stream inner join, VALUE-exact: the linking
    corpus is fed as TWO streams with deterministic event times —
    definitions stamped T + (doc_id % 7) minutes, call sites
    T + (doc_id % 4) minutes — and `stream_mention_joins` resolves each
    call to a definition of the same (repo, name) within ±2 minutes.
    A match exists exactly when |doc_id%7 - doc_id%4| <= 2, so the
    full (repo, name, def_time, call_time) relation is SQL-decidable."""
    from .streaming.ingest import stream_mention_joins

    did = r"cast(regexp_extract(path, 'd(\\d+)\\.py', 1) as int)"
    # half corpus: join-state cost scales with input and the doc_id%7
    # vs %4 lattice is fully exercised by either parity class
    base = _linking_source(spark, sf_dir).where(F.expr(f"{did} % 2 = 0"))

    def _stamped(mod: int, out: str) -> str:
        d = _tmpdir(out)
        (base.withColumn(
            "ingested_at",
            F.expr(f"timestamp'2026-01-01 00:00:00' + "
                   f"make_interval(0, 0, 0, 0, 0, {did} % {mod}, 0)"))
         .write.mode("overwrite").parquet(d))
        return d

    defs_dir = _stamped(7, "stream_join_defs_")
    calls_dir = _stamped(4, "stream_join_calls_")
    out_dir = _tmpdir("stream_join_out_")
    q = (stream_mention_joins(spark, defs_dir, calls_dir,
                              watermark="10 minutes", lag_minutes=2)
         .writeStream.outputMode("append").format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", _tmpdir("ck_join_"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(out_dir)


SQL_STREAM_JOIN = """
SELECT source AS repo, 'f' || doc_id AS name,
       TIMESTAMP '2026-01-01 00:00:00'
         + INTERVAL (doc_id % 7) MINUTE AS def_time,
       TIMESTAMP '2026-01-01 00:00:00'
         + INTERVAL (doc_id % 4) MINUTE AS call_time
FROM documents
WHERE doc_id % 2 = 0 AND abs((doc_id % 7) - (doc_id % 4)) <= 2
"""


def q_sql_surface(spark, sf_dir):
    """The pure-SQL consumer route end-to-end: the pipeline's triples
    as a temp view + the engine's scalar kernels registered as
    Arrow-vectorized SQL functions (sqlapi.py), queried with one
    spark.sql statement — kg_defuzz strips the planted _v2 suffix and
    kg_entity_id reproduces the entity-id derivation, both value-exact
    under the DuckDB oracle."""
    from . import sqlapi
    run = _linking_pipeline(spark, sf_dir)
    run["triples"].createOrReplaceTempView("kg_triples_view")
    sqlapi.register_functions(spark)
    return spark.sql("""
        SELECT subj, obj,
               kg_defuzz(concat(obj, '_v2')) AS obj_defuzz,
               kg_entity_id(obj) AS obj_entity
        FROM kg_triples_view WHERE pred = 'defines'
    """)


def q_search_bool(spark, sf_dir):
    """§3.3 boolean search tree (`elastic_retriever.py:279-310`): one
    compiled predicate — (value OR data) AND NOT slow AND kind filter —
    plus deterministic pagination, over the KG segments."""
    from . import pipeline as P
    from . import retrieval
    segs = P.segments_of(_docs_as_source(spark, sf_dir))
    query = {"and": [
        {"or": [{"term": "value"}, {"term": "data"}]},
        {"not": {"term": "slow"}},
        {"kind": ["other"]},
    ]}
    page = retrieval.search(segs, query, page=0, per_page=30)
    return page.select("seg_id", "kind", "line_start", "score")


SQL_SEARCH_BOOL = r"""
WITH segs AS (
  SELECT substr(sha256(source || '|' || CAST(doc_id AS VARCHAR)
                || '|1|1|' || text), 1, 16) AS seg_id,
         'other' AS kind, 1 AS line_start, 0.5 AS score
  FROM documents
  WHERE regexp_matches(text, '\S')
        AND (contains(text, 'value') OR contains(text, 'data'))
        AND NOT contains(text, 'slow'))
SELECT seg_id, kind, line_start, score FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, seg_id) AS rn FROM segs)
WHERE rn <= 30
"""


QUERIES.update({
    "q_search_bool": (q_search_bool, SQL_SEARCH_BOOL),
    "q_cc_components": (q_cc_components, SQL_CC_COMPONENTS),
    "q_minhash_lsh_pairs": (q_minhash_lsh_pairs, SQL_MINHASH_LSH_PAIRS),
    "q_greedy_assoc": (q_greedy_assoc, SQL_GREEDY_ASSOC),
    "q_search_pagination": (q_search_pagination, SQL_SEARCH_PAGINATION),
    "q_stream_kind_counts": (q_stream_kind_counts, None),
    "q_stream_first_seen": (q_stream_first_seen, None),
})


def q_neighbor_self_join(spark, sf_dir):
    """J8 analog (postprocess neighborhood spatial self-join): per event,
    how many other events of the same user fall within +-60s. Equi key
    (user) + interval residual — the same shape as the bbox-expansion
    overlap join, with the equi part keeping the join off a cross
    product."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = ev.alias("a")
    b = ev.alias("b")
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") >= F.col("a.ts") - F.expr("INTERVAL 60 SECONDS"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 60 SECONDS"))
        & (F.col("a.event_id") != F.col("b.event_id")),
        "left",
    )
    return (
        joined.groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count(F.col("b.event_id")).alias("n_neighbors"))
    )


SQL_NEIGHBOR_SELF_JOIN = """
SELECT a.event_id, count(b.event_id) AS n_neighbors
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts BETWEEN a.ts - INTERVAL 60 SECOND AND a.ts + INTERVAL 60 SECOND
 AND a.event_id <> b.event_id
GROUP BY a.event_id
"""


def q_lead_lag(spark, sf_dir):
    """W2/W6 analog: per-user event sequencing with lag — gap seconds since
    the previous event (the reading-order / page-order window family)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ with sub-second precision: exact integer millis
    # (session tz pinned UTC), so no truncate-vs-round drift across engines
    epoch = F.unix_millis(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id", "user_id",
        (epoch - F.lag(epoch).over(w)).alias("gap_ms"),
    )


SQL_LEAD_LAG = """
SELECT event_id, user_id,
       epoch_ms(ts)::BIGINT - lag(epoch_ms(ts)::BIGINT)
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
FROM events
"""


def q_summary_stats(spark, sf_dir):
    """A4 analog (describe().round(3) corpus summary): per-lang doc stats."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("n_chars").alias("min_chars"),
             F.max("n_chars").alias("max_chars"),
             F.round(F.sum(F.col("n_chars").cast("decimal(18,2)"))
                     .cast("double") / F.count(F.lit(1)), 3).alias("avg_chars"),
             F.round(F.stddev_pop(F.col("n_chars").cast("double")), 3)
             .alias("sd_chars"))
    )


SQL_SUMMARY_STATS = """
SELECT lang, count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       round(CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / count(*), 3)
         AS avg_chars,
       round(stddev_pop(CAST(n_chars AS DOUBLE)), 3) AS sd_chars
FROM documents GROUP BY lang
"""


def q_embedding_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs: RHP-LSH bucket -> bounded in-bucket
    pairing -> cosine threshold (the embedding twin of MinHash LSH),
    cross-checked pair-for-pair."""
    from .operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_cosine_dup_pairs(
        emb, threshold=0.3, n_planes=6, dim=64, max_bucket=200)
    return pairs.select(
        F.col("id_a").alias("vec_a"), F.col("id_b").alias("vec_b"),
        F.round("cos_sim", 4).alias("cos_sim"))


SQL_EMBEDDING_DUP_PAIRS = r"""
WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) - 1 AS d
           FROM embeddings),
proj AS (SELECT vec_id, p,
                sum(x * (('0x'||substr(md5(p::VARCHAR||'|'||d::VARCHAR),1,4))::BIGINT
                         - 32767.5)) AS dot
         FROM e, range(6) r(p) GROUP BY vec_id, p),
b AS (SELECT vec_id,
             CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS INT)
               AS bucket
      FROM proj GROUP BY vec_id),
sized AS (SELECT bucket, count(*) AS c FROM b GROUP BY bucket)
SELECT a.vec_id AS vec_a, bb.vec_id AS vec_b,
       round(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))),
             4) AS cos_sim
FROM b a
JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
JOIN sized s ON s.bucket = a.bucket AND s.c > 1 AND s.c <= 200
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = bb.vec_id
WHERE list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))))
      >= 0.3
"""


QUERIES.update({
    "q_neighbor_self_join": (q_neighbor_self_join, SQL_NEIGHBOR_SELF_JOIN),
    "q_lead_lag": (q_lead_lag, SQL_LEAD_LAG),
    "q_summary_stats": (q_summary_stats, SQL_SUMMARY_STATS),
    "q_embedding_dup_pairs": (q_embedding_dup_pairs, SQL_EMBEDDING_DUP_PAIRS),
})


# ---------------------------------------------------------------------------
# KG spine with full value-level oracles: def extraction -> entities -> links
# ---------------------------------------------------------------------------

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
        from . import pipeline as P
        _PIPELINE_MEMO[key] = P.run_pipeline(
            spark, _linking_source(spark, sf_dir))
    return _PIPELINE_MEMO[key]


def q_kg_defines(spark, sf_dir):
    """M3 def-extraction + the defines triple family, value-checked: each
    constructed file yields exactly two function segments and two defines
    triples."""
    res = _linking_pipeline(spark, sf_dir)
    return (res["triples"].filter(F.col("pred") == "defines")
            .select("subj", "pred", "obj", "repo", "score"))


# segment layout per file: f-block lines 1-2, g-block lines 4-5
_SQL_FSEG = ("substr(sha256(source || '|d' || doc_id || '.py|1|2|'"
             " || 'def f' || doc_id || '(x):' || chr(10) || '    return x'),"
             " 1, 16)")
_SQL_GSEG = ("substr(sha256(source || '|d' || doc_id || '.py|4|5|'"
             " || 'def g' || doc_id || '(y):' || chr(10) || '    return f'"
             " || doc_id || '(y)'), 1, 16)")


SQL_SQL_SURFACE = f"""
SELECT source || '/d' || doc_id || '.py#' || {_SQL_FSEG} AS subj,
       'f' || doc_id AS obj, 'f' || doc_id AS obj_defuzz,
       'ent_' || substr(sha256('ent|f' || doc_id), 1, 16) AS obj_entity
FROM documents
UNION ALL
SELECT source || '/d' || doc_id || '.py#' || {_SQL_GSEG} AS subj,
       'g' || doc_id AS obj, 'g' || doc_id AS obj_defuzz,
       'ent_' || substr(sha256('ent|g' || doc_id), 1, 16) AS obj_entity
FROM documents
"""


SQL_KG_DEFINES = f"""
SELECT source || '/d' || doc_id || '.py#' || {_SQL_FSEG} AS subj,
       'defines' AS pred, 'f' || doc_id AS obj, source AS repo,
       0.99 AS score
FROM documents
UNION ALL
SELECT source || '/d' || doc_id || '.py#' || {_SQL_GSEG} AS subj,
       'defines' AS pred, 'g' || doc_id AS obj, source AS repo,
       0.99 AS score
FROM documents
"""


def q_kg_entities(spark, sf_dir):
    """Entity formation (G5/J5): one entity per normalized def name, with
    the content-hash entity id (F10) value-checked."""
    res = _linking_pipeline(spark, sf_dir)
    return res["entities"].select("entity_id", "canonical_name")


SQL_KG_ENTITIES = """
SELECT 'ent_' || substr(sha256('ent|f' || doc_id), 1, 16) AS entity_id,
       'f' || doc_id AS canonical_name
FROM documents
UNION ALL
SELECT 'ent_' || substr(sha256('ent|g' || doc_id), 1, 16) AS entity_id,
       'g' || doc_id AS canonical_name
FROM documents
"""


def q_kg_mention_links(spark, sf_dir):
    """End-to-end linking (J4/J6): the call ``f<id>(y)`` inside ``g<id>``
    exact-links to entity f<id> with score 1.0; the mentions triple joins
    segment subj to entity id — fully value-checked."""
    res = _linking_pipeline(spark, sf_dir)
    return (res["triples"].filter(F.col("pred") == "mentions")
            .select("subj", "obj", "repo", "score"))


SQL_KG_MENTION_LINKS = f"""
SELECT source || '/d' || doc_id || '.py#' || {_SQL_GSEG} AS subj,
       'ent_' || substr(sha256('ent|f' || doc_id), 1, 16) AS obj,
       source AS repo, 1.0 AS score
FROM documents
"""


def q_incremental_kg(spark, sf_dir):
    """Incremental KG maintenance, driver-value-checked end to end: build
    the graph from a perturbed corpus V0 (every 5th file missing, every
    7th carrying an extra def the final corpus lacks, plus two files that
    don't belong — one competing on a fuzzy alias key so link winners
    must be re-derived), then absorb one delta that lands the corpus on
    exactly the canonical linking source. The merged merge-on-read view's
    defines family must equal the from-scratch oracle
    (:data:`SQL_INCREMENTAL_KG`) — i.e. the incremental path is
    indistinguishable from a rebuild. Runs on the doc_id%4==0 quarter of
    the corpus: the delta machinery it exercises is density-independent,
    and the full-corpus extraction kernel is already the kg_pipeline
    headline — re-paying it here would double-count bench time."""
    from .plans import incremental as I
    from .sources import Catalog
    # try_cast: the predicate constraint-propagates across update_graph's
    # (repo, path) equi-joins onto manifest rows whose paths don't match
    # the regex — an ANSI cast of '' would throw there
    fid = F.regexp_extract("path", r"d(\d+)\.py", 1).try_cast("long")
    v1 = _linking_source(spark, sf_dir).filter(fid % 4 == 0)
    v0 = (v1.filter(fid % 5 != 0)
          .withColumn("content",
                      F.when(fid % 7 == 0,
                             F.concat("content",
                                      F.lit("\ndef qq_extra(z):"
                                            "\n    return z\n")))
                      .otherwise(F.col("content"))))
    extras = spark.createDataFrame(
        [("xorg/dead", "a.py", "f" * 40, "python",
          "def f0_v9(x):\n    return x\n"),
         ("xorg/dead", "b.py", "f" * 40, "python",
          "def qq_dead(a):\n    return qq_dead(a)\n")],
        "repo string, path string, commit string, lang string, "
        "content string")
    cat = Catalog(spark, _tmpdir("cosmos_incwh_"))
    I.build_graph(spark, v0.unionByName(extras), cat)
    # canon_mode="incremental" forces the delta-surgery canonicalization
    # (bucket recompute + affected-component CC) so the driver's oracle
    # gate covers the at-scale path, not just the small-dim wholesale one
    I.update_graph(spark, cat, v1,
                   deleted=[("xorg/dead", "a.py"), ("xorg/dead", "b.py")],
                   collect_stats=False, canon_mode="incremental")
    return (I.triples_view(cat).filter(F.col("pred") == "defines")
            .select("subj", "pred", "obj", "repo", "score"))


SQL_INCREMENTAL_KG = f"""
SELECT source || '/d' || doc_id || '.py#' || {_SQL_FSEG} AS subj,
       'defines' AS pred, 'f' || doc_id AS obj, source AS repo,
       0.99 AS score
FROM documents WHERE doc_id % 4 = 0
UNION ALL
SELECT source || '/d' || doc_id || '.py#' || {_SQL_GSEG} AS subj,
       'defines' AS pred, 'g' || doc_id AS obj, source AS repo,
       0.99 AS score
FROM documents WHERE doc_id % 4 = 0
"""


_VERSIONED_MEMO: dict[tuple[str, str], tuple] = {}


def _versioned_demo(spark, sf_dir):
    """One versioned table shared by q_time_travel / q_snapshot_changes:
    three appends splitting ``documents`` by doc_id%3 (snap ids 1/2/3).
    Memoized per Spark application so the two queries pay the three tiny
    commits once per bench/driver pass (the kg-trio pattern)."""
    from .sources import Catalog
    key = (spark.sparkContext.applicationId, sf_dir)
    _memo_scope(_VERSIONED_MEMO, spark)
    if key not in _VERSIONED_MEMO:
        cat = Catalog(spark, _tmpdir("cosmos_verwh_"))
        docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
        snaps = [cat.append(docs.filter(F.col("doc_id") % 3 == r), "v.docs")
                 for r in (0, 1, 2)]
        _VERSIONED_MEMO[key] = (cat, snaps)
    return _VERSIONED_MEMO[key]


def q_merge_upsert(spark, sf_dir):
    """MERGE INTO (copy-on-write upsert, Catalog.merge): target = the
    o_orderkey%4==0 slice of orders; source doubles the price of the
    %8==0 rows (matched -> update) and brings the %4==1 rows (not
    matched -> insert); untouched target rows (%4==0, %8!=0) survive
    unchanged. One full-outer join + one overwrite snapshot; oracle is
    the equivalent set arithmetic."""
    from .sources import Catalog
    cat = Catalog(spark, _tmpdir("cosmos_mergewh_"))
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    cat.append(orders.filter(F.col("o_orderkey") % 4 == 0), "m.orders")
    source = (orders.filter((F.col("o_orderkey") % 8 == 0)
                            | (F.col("o_orderkey") % 4 == 1))
              .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    cat.merge(source, "m.orders", on=("o_orderkey",))
    return cat.read_at("m.orders")


SQL_MERGE_UPSERT = """
SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
FROM orders WHERE o_orderkey % 8 = 0 OR o_orderkey % 4 = 1
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 8 <> 0
"""


def q_time_travel(spark, sf_dir):
    """Snapshot-scoped read (Iceberg ``VERSION AS OF`` analog): reading
    the versioned table as of its second commit must see exactly the
    first two appends and nothing from the third."""
    cat, snaps = _versioned_demo(spark, sf_dir)
    return cat.read_at("v.docs", snapshot=snaps[1])


SQL_TIME_TRAVEL = """
SELECT doc_id, source FROM documents WHERE doc_id % 3 IN (0, 1)
"""


def q_snapshot_changes(spark, sf_dir):
    """Incremental (CDC) read: ``changes(since=first commit)`` must
    return exactly the rows the later two appends committed — the poll
    primitive downstream consumers use instead of rescanning the table."""
    cat, snaps = _versioned_demo(spark, sf_dir)
    return cat.changes("v.docs", since=snaps[0])


SQL_SNAPSHOT_CHANGES = """
SELECT doc_id, source FROM documents WHERE doc_id % 3 IN (1, 2)
"""


SQL_STREAM_TRIPLES = f"""
SELECT source || '/d' || doc_id || '.py#' || {_SQL_FSEG} AS subj,
       'defines' AS pred, 'f' || doc_id AS obj, source AS repo,
       CAST(0.99 AS DOUBLE) AS score
FROM documents
UNION ALL
SELECT source || '/d' || doc_id || '.py#' || {_SQL_GSEG} AS subj,
       'defines' AS pred, 'g' || doc_id AS obj, source AS repo,
       CAST(0.99 AS DOUBLE) AS score
FROM documents
UNION ALL
SELECT source || '/d' || doc_id || '.py#' || {_SQL_GSEG} AS subj,
       'calls' AS pred, 'f' || doc_id AS obj, source AS repo,
       CAST(0.85 AS DOUBLE) AS score
FROM documents
UNION ALL
SELECT source || '/d' || doc_id || '.py#' || {_SQL_GSEG} AS subj,
       'mentions' AS pred,
       'ent_' || substr(sha256('ent|f' || doc_id), 1, 16) AS obj,
       source AS repo, CAST(1.0 AS DOUBLE) AS score
FROM documents
UNION ALL
SELECT source || '/d' || doc_id || '.py#' || {_SQL_FSEG} AS subj,
       'member_of' AS pred, source || '/d' || doc_id || '.py' AS obj,
       source AS repo, CAST(1.0 AS DOUBLE) AS score
FROM documents
UNION ALL
SELECT source || '/d' || doc_id || '.py#' || {_SQL_GSEG} AS subj,
       'member_of' AS pred, source || '/d' || doc_id || '.py' AS obj,
       source AS repo, CAST(1.0 AS DOUBLE) AS score
FROM documents
"""


QUERIES.update({
    "q_kg_defines": (q_kg_defines, SQL_KG_DEFINES),
    "q_kg_entities": (q_kg_entities, SQL_KG_ENTITIES),
    "q_kg_mention_links": (q_kg_mention_links, SQL_KG_MENTION_LINKS),
    "q_incremental_kg": (q_incremental_kg, SQL_INCREMENTAL_KG),
    "q_merge_upsert": (q_merge_upsert, SQL_MERGE_UPSERT),
    "q_stream_join": (q_stream_join, SQL_STREAM_JOIN),
    "q_sql_surface": (q_sql_surface, SQL_SQL_SURFACE),
    "q_time_travel": (q_time_travel, SQL_TIME_TRAVEL),
    "q_snapshot_changes": (q_snapshot_changes, SQL_SNAPSHOT_CHANGES),
    "q_stream_triples": (q_stream_triples, SQL_STREAM_TRIPLES),
})


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
    from .operators import ranks
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


QUERIES.update({
    "q_rules_postprocess": (q_rules_postprocess, SQL_RULES_POSTPROCESS),
    "q_score_recalibrate": (q_score_recalibrate, SQL_SCORE_RECALIBRATE),
    "q_json_export": (q_json_export, SQL_JSON_EXPORT),
})


# ---------------------------------------------------------------------------
# round 2: context enrichment (F5/A4/S11), verification joins, LSH ANN,
# retrieval graph join, representation learning
# ---------------------------------------------------------------------------

def q_context_windows(spark, sf_dir):
    """F5 (`context_enrichment.py:329-366`): prefix/suffix token windows
    around each 'table' label hit — prefix = words[i-20:i], suffix =
    words[i+2:i+22]. Pure JVM slice expressions."""
    from .operators import enrich
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
    from .operators import enrich
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
    from .operators import enrich
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


_DUP_PAIRS_MEMO: dict[tuple[str, str], "object"] = {}


def _verified_dup_pairs(spark, sf_dir):
    """The MinHash-LSH -> exact-Jaccard verified pair relation, shared by
    q_ngram_jaccard_pairs and q_near_dedup (VERDICT r2 #9: each used to
    recompute the full signature scan). Lazily localCheckpointed — the
    first consumer materializes it, the second reuses the saved blocks.
    Keyed by Spark application id so a new session never reuses stale
    frames."""
    key = (spark.sparkContext.applicationId, sf_dir)
    _memo_scope(_DUP_PAIRS_MEMO, spark)
    if key not in _DUP_PAIRS_MEMO:
        from .operators import dedup
        docs = _t(spark, sf_dir, "documents")
        cands = dedup.minhash_lsh_pairs(docs, "doc_id", "text",
                                        num_hashes=16, bands=4,
                                        max_bucket=50)
        pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", cands,
                                          threshold=0.5)
        _DUP_PAIRS_MEMO[key] = pairs.localCheckpoint(eager=False)
    return _DUP_PAIRS_MEMO[key]


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard verification of the MinHash-LSH candidate pairs
    (the rerank stage after LSH recall) — cross-checked value-for-value."""
    pairs = _verified_dup_pairs(spark, sf_dir)
    return pairs.select("id_a", "id_b",
                        F.round("jaccard", 6).alias("jaccard"))


SQL_NGRAM_JACCARD_PAIRS = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
           FROM documents),
sh AS (SELECT doc_id,
              unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                     i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                AS s
       FROM t WHERE len(toks) >= 3),
hs AS (SELECT doc_id,
              ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h1,
              ('0x' || substr(md5(s), 17, 16))::UBIGINT AS h2
       FROM sh),
mhu AS (SELECT doc_id, h,
               min(CAST((h1::UHUGEINT + h::UHUGEINT * h2::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT)) AS u
        FROM hs, range(16) r(h) GROUP BY doc_id, h),
mh AS (SELECT doc_id, h,
              CASE WHEN u >= 9223372036854775808::UBIGINT
                   THEN (u::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT
                   ELSE u::BIGINT END AS mh
       FROM mhu),
banded AS (SELECT doc_id, h // 4 AS band,
                  md5(string_agg(mh::VARCHAR, '|' ORDER BY h)) AS bhash
           FROM mh GROUP BY doc_id, h // 4),
buckets AS (SELECT band, bhash, count(*) AS c FROM banded GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM banded a
         JOIN banded b ON a.band = b.band AND a.bhash = b.bhash
                      AND a.doc_id < b.doc_id
         JOIN buckets k ON k.band = a.band AND k.bhash = a.bhash
         WHERE k.c <= 50),
shg AS (SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(toks) - 1, 1)),
                 i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                 AS sg
        FROM t WHERE len(toks) >= 3)
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
           / len(list_distinct(list_concat(a.sg, b.sg))) AS jaccard
  FROM cand c
  JOIN shg a ON a.doc_id = c.id_a
  JOIN shg b ON b.doc_id = c.id_b)
WHERE jaccard >= 0.5
"""


def q_near_dedup(spark, sf_dir):
    """End-to-end near-duplicate removal (the composed dedup pipeline:
    LSH candidates -> Jaccard verify -> star CC -> min-id representative).
    The oracle reproduces the components with a recursive reachability
    query — fully independent of the Spark CC implementation."""
    from .operators import dedup
    docs = _t(spark, sf_dir, "documents")
    out = dedup.near_dedup(docs, "doc_id", "text", num_hashes=16, bands=4,
                           threshold=0.5, max_bucket=50,
                           verified_pairs=_verified_dup_pairs(spark, sf_dir))
    return out.select("doc_id", "dup_of", "keep")


SQL_NEAR_DEDUP = r"""
WITH RECURSIVE
t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents),
sh AS (SELECT doc_id,
              unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                     i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                AS s
       FROM t WHERE len(toks) >= 3),
hs AS (SELECT doc_id,
              ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h1,
              ('0x' || substr(md5(s), 17, 16))::UBIGINT AS h2
       FROM sh),
mhu AS (SELECT doc_id, h,
               min(CAST((h1::UHUGEINT + h::UHUGEINT * h2::UHUGEINT)
                        % 18446744073709551616::UHUGEINT AS UBIGINT)) AS u
        FROM hs, range(16) r(h) GROUP BY doc_id, h),
mh AS (SELECT doc_id, h,
              CASE WHEN u >= 9223372036854775808::UBIGINT
                   THEN (u::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT
                   ELSE u::BIGINT END AS mh
       FROM mhu),
banded AS (SELECT doc_id, h // 4 AS band,
                  md5(string_agg(mh::VARCHAR, '|' ORDER BY h)) AS bhash
           FROM mh GROUP BY doc_id, h // 4),
buckets AS (SELECT band, bhash, count(*) AS c FROM banded GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM banded a
         JOIN banded b ON a.band = b.band AND a.bhash = b.bhash
                      AND a.doc_id < b.doc_id
         JOIN buckets k ON k.band = a.band AND k.bhash = a.bhash
         WHERE k.c <= 50),
shg AS (SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(toks) - 1, 1)),
                 i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                 AS sg
        FROM t WHERE len(toks) >= 3),
ver AS (SELECT c.id_a, c.id_b
        FROM cand c
        JOIN shg a ON a.doc_id = c.id_a
        JOIN shg b ON b.doc_id = c.id_b
        WHERE CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sg, b.sg))) >= 0.5),
e AS (SELECT id_a AS a, id_b AS b FROM ver
      UNION SELECT id_b, id_a FROM ver),
n AS (SELECT DISTINCT a AS id FROM e),
reach(id, r) AS (
  SELECT id, id FROM n
  UNION
  SELECT reach.id, e.b FROM reach JOIN e ON e.a = reach.r
),
comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
SELECT d.doc_id,
       CASE WHEN c.comp IS NOT NULL AND c.comp <> d.doc_id
            THEN c.comp END AS dup_of,
       (c.comp IS NULL OR c.comp = d.doc_id) AS keep
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate top-k (the ANN scale path): queries =
    vectors 0-2, k = 5, candidates pruned to the query's RHP bucket —
    cross-checked bucket-for-bucket and score-for-score."""
    from .operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = similarity.cosine_topk_lsh(emb, qs, k=5, n_planes=8, dim=64,
                                     round_to=4)
    return out.select("q_id", "vec_id", "cos_sim", "rn")


SQL_ANN_LSH_TOPK = r"""
WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) - 1 AS d
           FROM embeddings),
proj AS (SELECT vec_id, p,
                sum(x * (('0x'||substr(md5(p::VARCHAR||'|'||d::VARCHAR),1,4))::BIGINT
                         - 32767.5)) AS dot
         FROM e, range(8) r(p) GROUP BY vec_id, p),
b AS (SELECT vec_id,
             CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)
                  AS INT) AS bucket
      FROM proj GROUP BY vec_id),
q AS (SELECT b.vec_id AS q_id, emb.embedding AS qv, b.bucket
      FROM b JOIN embeddings emb ON emb.vec_id = b.vec_id
      WHERE b.vec_id < 3),
s AS (SELECT q.q_id, c.vec_id,
             round(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                    CAST(q.qv AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]),
                                              CAST(q.qv AS DOUBLE[])))), 4)
               AS cos_sim
      FROM q
      JOIN b cb ON cb.bucket = q.bucket
      JOIN embeddings c ON c.vec_id = cb.vec_id
      WHERE c.vec_id <> q.q_id)
SELECT q_id, vec_id, cos_sim, CAST(rn AS INT) AS rn FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM s) WHERE rn <= 5
"""


def q_entity_objects(spark, sf_dir):
    """J6 (`elastic_retriever.py:239-258`): resolve entity 'f1' then its
    child objects through the mentions edges of the materialized graph —
    the parent/child join index as a co-partitionable equi-join."""
    from . import retrieval
    res = _linking_pipeline(spark, sf_dir)
    out = retrieval.entity_objects(res["triples"], res["entities"],
                                   name="f1")
    return out.select("object_ref", "repo", "score")


SQL_ENTITY_OBJECTS = f"""
SELECT source || '/d' || doc_id || '.py#' || {_SQL_GSEG} AS object_ref,
       source AS repo, 1.0 AS score
FROM documents WHERE doc_id = 1
"""


def word_vectors(spark, sf_dir, num_partitions: int):
    """A7 (`representation_learning/compute_word_vecs.py:4-11`): corpus
    word-vector training via pyspark.ml Word2Vec (skipgram analog) over
    the token stream. ``num_partitions`` is the at-scale knob: Word2Vec
    shards skip-gram batches per partition and merges hogwild-style, so
    >1 trades bit-determinism for linear training parallelism (the same
    trade the reference's fastText training makes). The invariants that
    survive any partitioning — full vocabulary coverage, vector arity,
    positive norms — are pytest-asserted at numPartitions=4."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.expr(r"regexp_extract_all(lower(text), '\\S+', 0)").alias("words"))
    w2v = Word2Vec(vectorSize=16, minCount=1, seed=42, maxIter=1,
                   numPartitions=num_partitions,
                   inputCol="words", outputCol="vec")
    model = w2v.fit(toks)
    vecs = model.getVectors().withColumn("varr",
                                         vector_to_array(F.col("vector")))
    return vecs.select(
        "word",
        F.expr("round(aggregate(varr, 0.0D, (a, v) -> a + v * v), 6)")
        .alias("sq_norm"))


def q_word_vectors(spark, sf_dir):
    """Registry wrapper: numPartitions=1 pins bit-determinism for the
    rows-only driver check; see :func:`word_vectors` for the at-scale
    setting and the partition-independent invariants."""
    return word_vectors(spark, sf_dir, num_partitions=1)


def q_rerank_top1(spark, sf_dir):
    """M7 (`bert_reranker/inference.py:22-44` +
    `elastic_reranking_retriever.py:43-49`): batched cross-encoder-shaped
    rerank (Iterator pandas UDF, model-singleton hook) + per-doc top-1
    diversity window — score-exact vs the oracle's set-Jaccard."""
    from . import retrieval
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
    from . import retrieval
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
    from . import pipeline as P
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
    from .operators import order
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


def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k (the other ANN scale path beside LSH):
    deterministic coarse centroids -> per-vector nearest-centroid index ->
    probe the query's 2 nearest lists -> exact rerank, k=5, queries =
    vectors 0-2 — assignment, probes, and scores all cross-checked."""
    from .operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = similarity.cosine_topk_ivf(emb, qs, k=5, n_centroids=8,
                                     n_probe=2)
    return out.select("q_id", "vec_id", "cos_sim", "rn")


SQL_ANN_IVF_TOPK = r"""
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings
           ORDER BY md5('ivf-seed|' || CAST(vec_id AS VARCHAR)), vec_id
           LIMIT 8),
av AS (SELECT e.vec_id, c.cid,
              round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             CAST(e.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(c.cv, c.cv))), 6) AS s
       FROM embeddings e, c),
assign AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY s DESC, cid) AS rn
             FROM av) WHERE rn = 1),
qv AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
       FROM embeddings WHERE vec_id < 3),
qs AS (SELECT q.q_id, q.qe, c.cid,
              round(list_dot_product(q.qe, c.cv)
                    / (sqrt(list_dot_product(q.qe, q.qe))
                       * sqrt(list_dot_product(c.cv, c.cv))), 6) AS s
       FROM qv q, c),
probes AS (SELECT q_id, qe, cid FROM (
             SELECT q_id, qe, cid,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY s DESC, cid) AS pr
             FROM qs) WHERE pr <= 2),
sc AS (SELECT p.q_id, e.vec_id,
              round(list_dot_product(CAST(e.embedding AS DOUBLE[]), p.qe)
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             CAST(e.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(p.qe, p.qe))), 4) AS cos_sim
       FROM probes p
       JOIN assign a ON a.cid = p.cid
       JOIN embeddings e ON e.vec_id = a.vec_id
       WHERE e.vec_id <> p.q_id)
SELECT q_id, vec_id, cos_sim, CAST(rn AS INT) AS rn FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM sc) WHERE rn <= 5
"""


def q_detection_summary(spark, sf_dir):
    """A4 corpus roll-up (`context_enrichment.py:110-115`
    describe().round(3) analog): one-row summary over the per-doc
    detection stats."""
    from .operators import enrich
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


def q_ivf_refine(spark, sf_dir):
    """IVF k-means refinement (one Lloyd iteration over the coarse lists):
    per-centroid per-dimension means, decimal-exact across engines."""
    from .operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids(emb, 8)
    assign = similarity.ivf_assign(emb, cents)
    return similarity.ivf_refine(emb, assign)


SQL_IVF_REFINE = r"""
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings
           ORDER BY md5('ivf-seed|' || CAST(vec_id AS VARCHAR)), vec_id
           LIMIT 8),
av AS (SELECT e.vec_id, c.cid,
              round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             CAST(e.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(c.cv, c.cv))), 6) AS s
       FROM embeddings e, c),
assign AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY s DESC, cid) AS rn
             FROM av) WHERE rn = 1),
j AS (SELECT a.cid AS centroid_id, e.embedding
      FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
d AS (SELECT centroid_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM j)
SELECT centroid_id, dim,
       round(CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6)
         AS val
FROM d GROUP BY centroid_id, dim
"""


QUERIES.update({
    "q_ivf_refine": (q_ivf_refine, SQL_IVF_REFINE),
    "q_ann_ivf_topk": (q_ann_ivf_topk, SQL_ANN_IVF_TOPK),
    "q_detection_summary": (q_detection_summary, SQL_DETECTION_SUMMARY),
    "q_reading_order": (q_reading_order, SQL_READING_ORDER),
    "q_class_methods": (q_class_methods, SQL_CLASS_METHODS),
    "q_rerank_top1": (q_rerank_top1, SQL_RERANK_TOP1),
    "q_qa_extract": (q_qa_extract, SQL_QA_EXTRACT),
    "q_context_windows": (q_context_windows, SQL_CONTEXT_WINDOWS),
    "q_detection_stats": (q_detection_stats, SQL_DETECTION_STATS),
    "q_table_extract": (q_table_extract, SQL_TABLE_EXTRACT),
    "q_ngram_jaccard_pairs": (q_ngram_jaccard_pairs, SQL_NGRAM_JACCARD_PAIRS),
    "q_near_dedup": (q_near_dedup, SQL_NEAR_DEDUP),
    "q_ann_lsh_topk": (q_ann_lsh_topk, SQL_ANN_LSH_TOPK),
    "q_entity_objects": (q_entity_objects, SQL_ENTITY_OBJECTS),
    "q_word_vectors": (q_word_vectors, None),
})


# ---------------------------------------------------------------------------
# round 3: whole-doc rollup (G4 materialized) + doc-filtered search
# ---------------------------------------------------------------------------

def q_doc_rollup(spark, sf_dir):
    """G4 whole-document rollup (`pipeline.doc_rollup`, the `fulldocument`
    index analog, `elastic_retriever.py:262-277`): per (repo, path) the
    reassembled content, segment count, kind set, best score. n_mentions
    is rollup-internal (its per-kind regex set is not RE2-replicable) and
    not projected here."""
    from . import pipeline as P
    src = _docs_as_source(spark, sf_dir)
    segs = P.segments_of(src)
    docs = P.doc_rollup(segs, P.mentions_of(segs))
    return docs.select(
        "repo", "path", "n_segments", "content",
        F.array_join("kinds", ",").alias("kinds_str"), "max_score")


SQL_DOC_ROLLUP = rf"""
SELECT source AS repo, CAST(doc_id AS VARCHAR) AS path,
       1 AS n_segments, text AS content,
       {_SQL_KIND_CASE} AS kinds_str,
       {_SQL_SCORE_CASE} AS max_score
FROM documents WHERE regexp_matches(text, '\S')
"""


def q_search_docfilter(spark, sf_dir):
    """§3.3 doc-filtered search: resolve a doc-level term against the
    whole-doc rollup (the `fulldocument` semi-join,
    `elastic_retriever.py:262-277`), broadcast the matching (repo, path)
    keys into a left-semi join on segments, then term-search + paginate
    (TakeOrderedAndProject — the segment side never globally sorts)."""
    from . import pipeline as P
    from . import retrieval
    src = _docs_as_source(spark, sf_dir)
    segs = P.segments_of(src)
    docs = P.doc_rollup(segs, P.mentions_of(segs))
    keys = retrieval.docs_matching(docs, ["data"])
    page = retrieval.search_segments(segs, terms=["value"], page=0,
                                     per_page=25, doc_filter=keys)
    return page.select("seg_id", "kind", "line_start", "score")


SQL_SEARCH_DOCFILTER = rf"""
WITH segs AS (
  SELECT substr(sha256(source || '|' || CAST(doc_id AS VARCHAR)
                || '|1|1|' || text), 1, 16) AS seg_id,
         {_SQL_KIND_CASE} AS kind, 1 AS line_start,
         {_SQL_SCORE_CASE} AS score
  FROM documents
  WHERE regexp_matches(text, '\S')
        AND contains(text, 'data')   -- doc-level filter (single-line docs)
        AND contains(text, 'value')  -- segment term
)
SELECT seg_id, kind, line_start, score FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, seg_id) AS rn FROM segs)
WHERE rn <= 25
"""


QUERIES.update({
    "q_doc_rollup": (q_doc_rollup, SQL_DOC_ROLLUP),
    "q_search_docfilter": (q_search_docfilter, SQL_SEARCH_DOCFILTER),
})


# ---------------------------------------------------------------------------
# graph analytics over the materialized KG (operators/graph.py query layer)
# ---------------------------------------------------------------------------
# Deterministic document citation graph: node = doc_id; every doc cites its
# next two successors inside its decade block (i -> i+1 when i%10 <= 8,
# i -> i+2 when i%10 <= 7). Out-degrees are therefore {0, 1, 2} — powers of
# two, which keeps every fixed-damping-0.5 PageRank value a dyadic rational:
# exactly representable in doubles and exactly summable in ANY reduction
# order, so the Spark result hash-matches the DuckDB oracle bit-for-bit
# with no rounding.

_SQL_DOC_EDGES = """edges AS (
  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents WHERE doc_id % 10 <= 8
  UNION ALL
  SELECT doc_id AS src, doc_id + 2 AS dst FROM documents WHERE doc_id % 10 <= 7
)"""


def _doc_edges(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    e1 = (docs.filter(F.col("doc_id") % 10 <= 8)
          .select(F.col("doc_id").alias("src"),
                  (F.col("doc_id") + 1).alias("dst")))
    e2 = (docs.filter(F.col("doc_id") % 10 <= 7)
          .select(F.col("doc_id").alias("src"),
                  (F.col("doc_id") + 2).alias("dst")))
    return e1.unionByName(e2)


def q_graph_degree(spark, sf_dir):
    """Per-node in/out degree over the KG edge relation — two
    map-side-combined counts + one outer join on the per-node aggregates
    (the edge table is never self-joined)."""
    from .operators.graph import degrees
    return degrees(_doc_edges(spark, sf_dir))


SQL_GRAPH_DEGREE = f"""
WITH {_SQL_DOC_EDGES},
od AS (SELECT src AS node, count(*) AS out_deg FROM edges GROUP BY src),
ind AS (SELECT dst AS node, count(*) AS in_deg FROM edges GROUP BY dst)
SELECT COALESCE(od.node, ind.node) AS node,
       COALESCE(out_deg, 0) AS out_deg,
       COALESCE(in_deg, 0) AS in_deg
FROM od FULL OUTER JOIN ind ON od.node = ind.node
"""


def q_graph_2hop(spark, sf_dir):
    """2-hop neighborhood of the seed set (every 100th doc): frontier BFS
    where only the broadcast frontier moves — the edge relation stays
    partition-local across both rounds."""
    from .operators.graph import k_hop
    docs = _t(spark, sf_dir, "documents")
    seeds = (docs.filter(F.col("doc_id") % 100 == 0)
             .select(F.col("doc_id").alias("node")))
    return k_hop(_doc_edges(spark, sf_dir), seeds, k=2)


SQL_GRAPH_2HOP = f"""
WITH {_SQL_DOC_EDGES},
s AS (SELECT DISTINCT doc_id AS node FROM documents WHERE doc_id % 100 = 0),
h1 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN s ON e.src = s.node),
h2 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN h1 ON e.src = h1.node)
SELECT node FROM s UNION SELECT node FROM h1 UNION SELECT node FROM h2
"""


def q_graph_triangles(spark, sf_dir):
    """Per-node triangle participation: one wedge join + one closing-edge
    join over the canonical (u < v) undirected edge set; each triangle is
    produced once and credited to all three corners."""
    from .operators.graph import triangle_counts
    return triangle_counts(_doc_edges(spark, sf_dir))


SQL_GRAPH_TRIANGLES = f"""
WITH {_SQL_DOC_EDGES},
und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM edges WHERE src <> dst),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, count(*) AS n_tri FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b AS node FROM tri
  UNION ALL SELECT c AS node FROM tri
) GROUP BY node
"""


_PAGERANK_ITERS = 5


def q_graph_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (damping 0.5, 5 rounds) — the static
    (src, dst, out_deg) relation is shuffled once and reused every round;
    only the per-node rank vector moves per iteration. Dyadic-exact by
    construction (see module comment), so the oracle needs no rounding."""
    from .operators.graph import pagerank
    return pagerank(_doc_edges(spark, sf_dir), iters=_PAGERANK_ITERS,
                    damping=0.5)


def _pagerank_sql(iters: int) -> str:
    parts = [f"""WITH {_SQL_DOC_EDGES},
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS pr FROM nodes)"""]
    for t in range(iters):
        parts.append(f"""r{t + 1} AS (
  SELECT n.node,
         CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE)
           * COALESCE(c.s, CAST(0 AS DOUBLE)) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(r.pr / d.out_deg) AS s
    FROM edges e
    JOIN r{t} r ON e.src = r.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst) c ON n.node = c.node)""")
    return ",\n".join(parts) + f"\nSELECT node, pr FROM r{iters}"


SQL_GRAPH_PAGERANK = _pagerank_sql(_PAGERANK_ITERS)


QUERIES.update({
    "q_graph_degree": (q_graph_degree, SQL_GRAPH_DEGREE),
    "q_graph_2hop": (q_graph_2hop, SQL_GRAPH_2HOP),
    "q_graph_triangles": (q_graph_triangles, SQL_GRAPH_TRIANGLES),
    "q_graph_pagerank": (q_graph_pagerank, SQL_GRAPH_PAGERANK),
})


def q_quantile_sketch(spark, sf_dir):
    """Per-language document-length quantiles from a bounded-state
    sample sketch (operators/sketch.quantile_sketch) — the quantile leg
    of the sketch family (KMV = distinct, CMS = frequency). k = 64 <
    group sizes at every sf, so the k-min truncation + order-statistic
    estimator path is exercised (not the trivially-exact small-group
    branch); the hash, the sampled row set, and the ceil(q*m) pick are
    all engine-portable, so the oracle reproduces every estimate
    bit-for-bit."""
    from .operators.sketch import quantile_sketch
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


def q_salted_join(spark, sf_dir):
    """Deterministic skew-salted shuffle join (operators/skew.py — the
    north-star 'monorepo hot key' mitigation): events (probe, 5-value
    hot key event_type) left-joined to a derived per-type dim with the
    probe side salted 8 ways and the dim replicated across salts. The
    rewrite is an identity — the oracle is the PLAIN SQL join, checked
    row-for-row; 'error' rows exercise the preserved-left (no match)
    path."""
    from .operators.skew import salted_join
    ev = _t(spark, sf_dir, "events")
    dim = (ev.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("type_n"))
           .where(F.col("event_type") != "error"))
    out = salted_join(ev, dim, on=["event_type"], salt_on="event_id",
                      n_salt=8, how="left")
    return out.select("event_id", "event_type", "type_n")


SQL_SALTED_JOIN = """
SELECT e.event_id, e.event_type, d.type_n
FROM events e
LEFT JOIN (SELECT event_type, count(*) AS type_n FROM events
           GROUP BY event_type HAVING event_type <> 'error') d
  USING (event_type)
"""


def q_stream_sessions(spark, sf_dir):
    """Event-time SESSION windows (streaming.ingest.stream_sessions),
    VALUE-exact: per-repo activity sessions over deterministic event
    times — doc j of a repo fires at minute (j%5) + 11*((j//5)%20), so
    events form 5-minute-long bursts 11 minutes apart and the session
    layout (gap 5, inclusive merge — boundary pinned by pytest) is a
    pure gaps-and-islands SQL over the documents table. Three availableNow drains against one
    checkpoint: the main wave, then two far-future flush rows whose
    only job is to advance the watermark (a finalized window emits one
    drain AFTER the batch that advances the watermark past it — the
    cross-drain watermark rule); flush sessions themselves stay
    unfinalized and are filtered besides."""
    from .streaming.ingest import stream_sessions

    docs = _t(spark, sf_dir, "documents")
    j = "(doc_id div 20)"
    minute = f"(({j} % 5) + 11 * (({j} div 5) % 20))"
    main = docs.select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0" * 40).alias("commit"), F.col("lang"),
        F.lit("").alias("content"),
        F.expr(f"timestamp'2026-01-01 00:00:00' + "
               f"make_interval(0, 0, 0, 0, 0, {minute}, 0)")
        .alias("ingested_at"))
    src_dir = _tmpdir("stream_sess_src_")
    ck = _tmpdir("ck_sess_")
    out_dir = _tmpdir("stream_sess_out_")
    main.write.mode("append").parquet(src_dir)

    def _flush(days: int) -> None:
        (spark.range(1).select(
            F.lit("__flush__").alias("repo"), F.lit("f").alias("path"),
            F.lit("0" * 40).alias("commit"), F.lit("md").alias("lang"),
            F.lit("").alias("content"),
            F.expr(f"timestamp'2026-01-01 00:00:00' + "
                   f"make_interval(0, 0, 0, {days}, 0, 0, 0)")
            .alias("ingested_at"))
         .write.mode("append").parquet(src_dir))

    def _drain() -> None:
        q = (stream_sessions(spark, src_dir, gap="5 minutes",
                             watermark="10 minutes")
             .writeStream.outputMode("append").format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    _drain()
    _flush(2)
    _drain()
    _flush(4)
    _drain()
    return (spark.read.parquet(out_dir)
            .where(F.col("repo") != "__flush__"))


SQL_STREAM_SESSIONS = """
WITH ev AS (
  SELECT source AS repo,
         TIMESTAMP '2026-01-01 00:00:00' + INTERVAL (
           ((doc_id // 20) % 5) + 11 * (((doc_id // 20) // 5) % 20)
         ) MINUTE AS ts
  FROM documents
),
x AS (
  SELECT repo, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY repo ORDER BY ts)
                   <= INTERVAL 5 MINUTE
              THEN 0 ELSE 1 END AS brk
  FROM ev
),
y AS (
  SELECT repo, ts,
         sum(brk) OVER (PARTITION BY repo ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM x
)
SELECT repo, min(ts) AS session_start,
       max(ts) + INTERVAL 5 MINUTE AS session_end,
       count(*) AS n_events
FROM y GROUP BY repo, grp
"""


QUERIES.update({
    "q_quantile_sketch": (q_quantile_sketch, SQL_QUANTILE_SKETCH),
    "q_salted_join": (q_salted_join, SQL_SALTED_JOIN),
    "q_stream_sessions": (q_stream_sessions, SQL_STREAM_SESSIONS),
})


# ---------------------------------------------------------------------------
# driver-visibility ordering
# ---------------------------------------------------------------------------
# The per-round driver correctness file caps at 50 entries while the registry
# is larger; queries listed here are rotated to the FRONT of the exported
# registry so the driver verifies them this round (the round-2 file covered
# the other 50 — the two rounds' union covers every query).
PRIORITY_QUERIES: list[str] = [
    "q_graph_degree",
    "q_graph_2hop",
    "q_graph_triangles",
    "q_graph_pagerank",
    "q_stream_triples",
    "q_incremental_kg",
    "q_merge_upsert",
    "q_stream_join",
    "q_sql_surface",
    "q_time_travel",
    "q_snapshot_changes",
    "q_sessionize",
    "q_rollup_agg",
    "q_pivot_agg",
    "q_percentiles",
    "q_winnow_fingerprints",
    "q_kmv_distinct",
    "q_kmv_set_ops",
    "q_cms_heavy_hitters",
    "q_training_mix",
    "q_quota_sample",
    "q_pii_scrub",
    "q_bpe_train",
    "q_bpe_token_count",
    "q_train_split",
    "q_decontaminate",
    "q_bm25",
    "q_doc_rollup",
    "q_search_docfilter",
    "q_entity_objects",
    "q_near_dedup",
    "q_ngram_jaccard_pairs",
    "q_ann_lsh_topk",
    "q_context_windows",
    "q_detection_stats",
    "q_table_extract",
    "q_class_methods",
    "q_rerank_top1",
    "q_qa_extract",
    "q_word_vectors",
    "q_quantile_sketch",
    "q_salted_join",
    "q_stream_sessions",
]


def ordered_queries() -> dict[str, tuple[Callable, str | None]]:
    """Registry with PRIORITY_QUERIES first (driver-cap rotation)."""
    unknown = [n for n in PRIORITY_QUERIES if n not in QUERIES]
    if unknown:
        # a typo/rename here would silently drop a never-yet-verified
        # query out of the driver's front-50 — fail loudly instead
        raise KeyError(f"PRIORITY_QUERIES not in registry: {unknown}")
    out: dict[str, tuple[Callable, str | None]] = {}
    for name in PRIORITY_QUERIES:
        out[name] = QUERIES[name]
    for name, entry in QUERIES.items():
        if name not in out:
            out[name] = entry
    return out
