"""Relational operator families (SURVEY §2.2-2.8): scans, joins, windows, set ops, sessionization, rollup/pivot/percentiles over the TPC-H-ish tables."""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ._shared import (  # noqa: F401
    _t,
)

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
    from ..operators import ranks
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
    most recent prior signup ts of the same user. r5: re-expressed on
    operators/asof.py's linear union+window plan — the original
    range-join + argmax formulation materialized every
    (error, earlier-signup) pair, quadratic per user (the exact
    anti-pattern the operator exists to avoid); same oracle, identical
    output. Ordering travels as unix micros (exact integers, full ts
    precision); the payload is the signup timestamp itself, so any
    equal-ts tie carries an identical value and no tiebreak is
    needed."""
    from ..operators.asof import asof_join
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", us.alias("ts_us"))
    sign = ev.filter(F.col("event_type") == "signup").select(
        "user_id", us.alias("ts_us"), F.col("ts").alias("s_ts"))
    # final groupBy mirrors the oracle's GROUP BY e.event_id, e.user_id
    # structurally (duplicate (event_id, user_id) error rows would
    # collapse identically on both sides; max of identical matches is a
    # no-op on unique ids)
    return (asof_join(
        err, sign, on=["user_id"], ts_col="ts_us", payload_cols=["s_ts"])
        .groupBy("event_id", "user_id")
        .agg(F.max("asof_s_ts").alias("last_signup_ts")))


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


def q_asof_bucketed(spark, sf_dir):
    """As-of join (operators/asof.py): align each click to the LATEST
    preceding purchase of the same user within 7 days — the
    nearest-earlier temporal join a range join would quadratify. Runs
    the skew-parallel BUCKETED plan (3-day buckets over the 30-day
    event span, so bucket-head rows genuinely need the cross-bucket
    carry) — the property test pins it equal to the plain windowed
    plan, and this oracle value-checks it against DuckDB's native ASOF
    LEFT JOIN, an independent implementation of the semantics.
    Timestamps travel as unix millis (exact integers; the q_lead_lag
    convention). The purchase side is pre-deduplicated to one row per
    (user, ms) — max event_id wins — so ties are engine-independent."""
    from ..operators.asof import asof_join
    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    clicks = (ev.where(F.col("event_type") == "click")
              .select("event_id", "user_id", ms.alias("ts_ms")))
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("user_id", ms.alias("ts_ms"),
                         F.struct("event_id", "value").alias("s"))
                 .groupBy("user_id", "ts_ms")
                 .agg(F.max("s").alias("s"))
                 .select("user_id", "ts_ms",
                         F.col("s.event_id").alias("p_event"),
                         F.col("s.value").alias("p_value")))
    return asof_join(
        clicks, purchases, on=["user_id"], ts_col="ts_ms",
        payload_cols=["p_event", "p_value"],
        tolerance=7 * 86_400_000, right_tiebreak="p_event",
        bucket_width=3 * 86_400_000)


SQL_ASOF_BUCKETED = """
WITH l AS (
  SELECT event_id, user_id, epoch_ms(ts)::BIGINT AS ts_ms
  FROM events WHERE event_type = 'click'),
r AS (
  SELECT user_id, epoch_ms(ts)::BIGINT AS ts_ms,
         max(event_id) AS p_event, arg_max(value, event_id) AS p_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT l.event_id, l.user_id, l.ts_ms,
       CASE WHEN l.ts_ms - r.ts_ms <= 604800000 THEN r.ts_ms END
         AS asof_ts_ms,
       CASE WHEN l.ts_ms - r.ts_ms <= 604800000 THEN r.p_event END
         AS asof_p_event,
       CASE WHEN l.ts_ms - r.ts_ms <= 604800000 THEN r.p_value END
         AS asof_p_value
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms
"""
