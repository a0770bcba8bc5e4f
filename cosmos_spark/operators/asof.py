"""As-of (nearest-earlier) join — the temporal-alignment operator the
engine's event/stream tables need and plain SQL joins can't express
without an O(n·m) range explosion.

For each left row, attach the payload of the LATEST right row with the
same key whose ordering value is <= the left row's (inclusive), and
optionally only if it lies within ``tolerance``. The reference has no
temporal algebra (its closest analog is the page-context "nearest
preceding section header" association, `cosmos/ingestion/ingest/
process/aggregation/aggregate.py:158-186`, done row-wise per page);
this operator is the engine-extension form a training-data /
event-analytics pipeline needs (align clicks to the last preceding
purchase, sensor reads to the last calibration, doc versions to the
last license grant).

Why not a range join: ``l JOIN r ON key AND r.ts <= l.ts`` followed by
an argmax materializes every (left, earlier-right) pair — quadratic per
key. The scalable shapes used here:

- **plain** (default): tag sides, union, ONE shuffle on the key, and a
  running ``last(..., ignorenulls=True)`` window ordered by
  ``(ts, side, tiebreak)`` with right rows sorted before left rows at
  equal ts (that ordering IS the inclusive `>=` match semantics).
  Linear work, no pair materialization; the per-key window is the same
  shape as every sessionize/section operator in the engine.
- **bucketed** (``bucket_width=``): the skew escape hatch for a
  pathological hot key (one entity with 10^8 events would serialize the
  plain window on one task). Rows are split into
  ``floor(ts / bucket_width)`` time buckets; the same running window
  runs per (key, bucket) — parallel across buckets of the hot key —
  and misses at the head of a bucket are repaired with a bucket-level
  carry relation: per (key, bucket) the max-(ts, tiebreak) right row,
  cumulatively maxed over strictly-earlier buckets on a spine of
  key x active-bucket rows (data-size-independent: one row per active
  bucket, not per event). Exactly-equal results pinned by a
  property test (`tests/test_operators.py`).

Determinism: ties among right rows at the same (key, ts) are broken by
``right_tiebreak`` (greatest wins); callers that need cross-engine
parity pre-deduplicate or pass a unique tiebreak (q_asof_join does).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _matched(ts_col: str, payload: list[str], order_cols: list):
    """Running nearest-earlier-right-row expressions over a window
    ordered by (ts, side, tiebreak): last non-null right value up to and
    including the current row."""
    w = (Window.partitionBy(*order_cols)
         .orderBy(F.col(ts_col), F.col("_side"), F.col("_tb"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    is_r = F.col("_side") == 0
    exprs = {"_m_ts": F.last(F.when(is_r, F.col(ts_col)),
                             ignorenulls=True).over(w)}
    for p in payload:
        exprs[f"_m_{p}"] = F.last(F.when(is_r, F.col(f"_p_{p}")),
                                  ignorenulls=True).over(w)
    return exprs


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              ts_col: str, payload_cols: list[str],
              tolerance: int | None = None,
              right_tiebreak: str | None = None,
              bucket_width: int | None = None) -> DataFrame:
    """Nearest-earlier join: every ``left`` row gains ``asof_<ts_col>``
    plus ``asof_<p>`` for each payload column — the values of the last
    ``right`` row per ``on`` key with ``right.ts <= left.ts``
    (inclusive), nulls when none (left-join semantics).

    ``ts_col`` must be a numeric ordering column present on both sides
    (epoch millis is the house convention — exact integers, no
    timestamp-comparison drift across engines). ``tolerance`` (same
    unit) nulls matches older than ``left.ts - tolerance``.
    ``right_tiebreak`` must name a right payload column; the greatest
    value wins among equal-ts right rows. ``bucket_width`` switches to
    the skew-parallel bucketed plan (identical results)."""
    if right_tiebreak is not None and right_tiebreak not in payload_cols:
        raise ValueError("right_tiebreak must be one of payload_cols")
    shared = [*on, ts_col]
    left_extra = [c for c in left.columns if c not in shared]
    r_types = {p: right.schema[p].dataType for p in payload_cols}
    tb = (F.col(f"_p_{right_tiebreak}") if right_tiebreak is not None
          else F.lit(0))

    lt = left.select(
        *shared, *left_extra, F.lit(1).alias("_side"),
        *[F.lit(None).cast(r_types[p]).alias(f"_p_{p}")
          for p in payload_cols])
    rt = right.select(
        *shared,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_extra],
        F.lit(0).alias("_side"),
        *[F.col(p).alias(f"_p_{p}") for p in payload_cols])
    u = lt.unionByName(rt).withColumn("_tb", tb)

    if bucket_width is None:
        out = u.withColumns(_matched(ts_col, payload_cols, on))
    else:
        # exact floor-division bucket (integer-only: safe for any sign)
        bw = int(bucket_width)
        bucket = F.expr(
            f"CAST((`{ts_col}` - pmod(`{ts_col}`, {bw})) DIV {bw} "
            "AS BIGINT)")
        u = u.withColumn("_b", bucket)
        within = u.withColumns(_matched(ts_col, payload_cols,
                                        [*on, "_b"]))
        # bucket-level carry: per (key, bucket) the max-(ts, tiebreak)
        # right row, then a cumulative max over STRICTLY earlier buckets
        # on the key x active-bucket spine (one row per active bucket —
        # the second window's partitions are bucket-count-sized, never
        # event-sized)
        r_struct = F.struct(F.col(ts_col).alias("ts"),
                            F.col("_tb").alias("tb"),
                            *[F.col(f"_p_{p}").alias(p)
                              for p in payload_cols])
        per_bucket = (u.groupBy(*on, "_b")
                      .agg(F.max(F.when(F.col("_side") == 0, r_struct))
                           .alias("_best")))
        wprev = (Window.partitionBy(*on).orderBy("_b")
                 .rowsBetween(Window.unboundedPreceding, -1))
        carry = per_bucket.select(
            *on, "_b", F.max("_best").over(wprev).alias("_carry"))
        out = within.join(carry, [*on, "_b"], "left")
        # a bucket-local miss falls back to the carried earlier-bucket row
        miss = F.col("_m_ts").isNull()
        out = out.withColumns({
            "_m_ts": F.when(miss, F.col("_carry.ts"))
                      .otherwise(F.col("_m_ts")),
            **{f"_m_{p}": F.when(miss, F.col(f"_carry.{p}"))
                           .otherwise(F.col(f"_m_{p}"))
               for p in payload_cols}})

    out = out.where(F.col("_side") == 1)
    in_tol = (F.lit(True) if tolerance is None else
              (F.col(ts_col) - F.col("_m_ts")) <= F.lit(int(tolerance)))
    sel = [*shared, *left_extra,
           F.when(in_tol, F.col("_m_ts")).alias(f"asof_{ts_col}")]
    sel += [F.when(in_tol, F.col(f"_m_{p}")).alias(f"asof_{p}")
            for p in payload_cols]
    return out.select(*sel)
