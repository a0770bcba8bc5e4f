"""Scale-safe global ordering operators.

A bare ``Window.orderBy(...)`` (no partitionBy) plans as an Exchange
SinglePartition: every input row funnels through ONE reducer — fine at
sf0.1, fatal on a hot term or full-corpus export at 100 TB. These two
helpers cover the only two shapes the query path needs:

- :func:`paginate` — page N of an ordered result. Rows needed are bounded
  by ``(page+1)*per_page`` (user-controlled, small), so ``orderBy().
  limit(hi)`` plans as TakeOrderedAndProject (per-partition top-hi +
  driver merge) and the row_number window then runs over at most ``hi``
  rows — the same fix shape as the r1 ANN top-k.
- :func:`bucketed_rank` — a full-table rank for exports, computed as
  (per-bucket local row_number) + (cumulative bucket offset). The bucket
  key is a key-column PREFIX: prefix truncation is monotone w.r.t.
  lexicographic order, so bucket order == key order and local rank +
  offset == global rank, exactly. The only single-reducer window runs
  over the distinct-bucket counts relation (tiny by construction), and
  offsets come back as a broadcast join; the big side shuffles once, by
  bucket, with full parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def paginate(df: DataFrame, order_by: list[Column], page: int,
             per_page: int, rank_col: str | None = None) -> DataFrame:
    """Rows (page*per_page, (page+1)*per_page] of ``df`` ordered by
    ``order_by``. Plans as TakeOrderedAndProject over the full input; the
    rank window touches only the <= hi retained rows. When ``rank_col`` is
    given the (global, 1-based) rank is kept as that column."""
    lo, hi = page * per_page, (page + 1) * per_page
    top = df.orderBy(*order_by).limit(hi)
    w = Window.orderBy(*order_by)
    ranked = top.withColumn("_rn", F.row_number().over(w))
    out = ranked.filter(F.col("_rn") > lo)
    if rank_col is not None:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")


def bucketed_rank(df: DataFrame, key_col: str, rank_col: str = "ord",
                  prefix_len: int = 4,
                  bucket: Column | None = None) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY key_col)`` without a
    single-reducer pass over ``df``.

    Requires ``key_col`` to be a unique, NON-NULL key (exports rank by a
    primary key) — a null key has no position in the total order, would
    inflate every bucket's offset and then vanish in the offset equi-join
    (NULL != NULL), so it fails the job row-locally instead. ``bucket``
    must be an expression MONOTONE non-decreasing in ``key_col``'s
    ordering — then bucket order == key order and local rank + cumulative
    bucket offset == global rank, exactly. Default: a ``prefix_len``-char
    prefix for string keys (prefix truncation is monotone w.r.t.
    lexicographic order); for numeric keys pass e.g.
    ``F.floor(F.col(k) / width)``. Pick granularity so each bucket fits
    an executor (hash-prefixed string ids spread uniformly; dense numeric
    ids split evenly by width)."""
    b = bucket if bucket is not None \
        else F.substring(F.col(key_col), 1, prefix_len)
    b = F.when(F.col(key_col).isNotNull(), b).otherwise(
        F.raise_error(F.lit(
            f"bucketed_rank: null {key_col} — ranks need a total order")))
    dfb = df.withColumn("_bucket", b)
    counts = dfb.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_cnt"))
    off_w = (Window.orderBy("_bucket")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (counts
               .withColumn("_off",
                           F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)))
               .drop("_cnt"))
    local_w = Window.partitionBy("_bucket").orderBy(key_col)
    return (
        dfb.join(F.broadcast(offsets), "_bucket")
        .withColumn(rank_col, F.col("_off") + F.row_number().over(local_w))
        .drop("_bucket", "_off")
    )
