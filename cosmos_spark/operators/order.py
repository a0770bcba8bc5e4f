"""Reading-order operators (SURVEY §2.6 W1/W2) — per-page band ordering
and the SKEMA column-break repair, as per-(doc, page) ``applyInPandas``
kernels. Groups are page-sized (bounded by the proposal cap), so the
imperative greedy semantics run on tiny pandas frames while the page
partitioning itself scales horizontally.

Reference parity:

- :func:`order_page_kernel` <- `cosmos/ingestion/ingest/process/
  aggregation/aggregate.py:115-156`: greedy y-overlap band grouping
  (via `check_y_overlap`, `aggregate.py:9-12` — note the reference's
  check is one-sided: candidate joins a band iff some member's y2 >=
  candidate's y1; reproduced faithfully), x-sort within band, x-proximity
  (<20px) clustering, y-sort within cluster, bands ordered by their first
  member's y1.
- :func:`column_break_repair_kernel` <- `cosmos_service/src/util/
  parquet_to_json.py:42-94`: sort by (x1 // 500, y1); every right-column
  item (x1 >= 500) that sits entirely above an earlier full-width block
  (span >= 800) is hoisted to just before the earliest such block. The
  reference applies its edit list sequentially with stale indices;
  reproduced faithfully (cited `:88-93`).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ORDER_SCHEMA_COLS = ["repo", "path", "page", "seg_id",
                     "x1", "y1", "x2", "y2", "ord"]

ORDER_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("page", T.IntegerType()),
    T.StructField("seg_id", T.StringType()),
    T.StructField("x1", T.DoubleType()),
    T.StructField("y1", T.DoubleType()),
    T.StructField("x2", T.DoubleType()),
    T.StructField("y2", T.DoubleType()),
    T.StructField("ord", T.IntegerType()),
])


def order_page_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """W1 band ordering for one (repo, path, page) group. Input rows are
    pre-sorted (y1, x1, seg_id) for determinism (the reference consumes
    model-output row order)."""
    pdf = pdf.sort_values(["y1", "x1", "seg_id"]).reset_index(drop=True)
    rows = pdf.to_dict("records")

    y_groups: list[list[dict]] = []
    for p in rows:
        placed = False
        for group in y_groups:
            for member in group:
                if member["y2"] >= p["y1"]:  # reference's one-sided check
                    group.append(p)
                    placed = True
                    break
            if placed:
                break
        if not placed:
            y_groups.append([p])

    sorted_groups = []
    for group in y_groups:
        slist = sorted(group, key=lambda r: r["x1"])
        nested: list[list[dict]] = []
        for obj in slist:
            placed = False
            for sub in nested:
                for el in sub:
                    if abs(el["x1"] - obj["x1"]) < 20:
                        sub.append(obj)
                        placed = True
                        break
                if placed:
                    break
            if not placed:
                nested.append([obj])
        sorted_groups.append(
            [sorted(sub, key=lambda r: r["y1"]) for sub in nested])
    sorted_groups.sort(key=lambda g: g[0][0]["y1"])

    final = [el for g in sorted_groups for sub in g for el in sub]
    out = pd.DataFrame(final)
    out["ord"] = range(len(out))
    out["ord"] = out["ord"].astype("int32")
    return out[ORDER_SCHEMA_COLS]


def column_break_repair_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """W2 repair for one (repo, path, page) group: base sort
    (x1 // 500, y1), then hoist right-column items above spanning blocks
    — including the reference's sequential stale-index edit application."""
    items = (pdf.assign(_col=(pdf["x1"] // 500))
             .sort_values(["_col", "y1", "seg_id"])
             .drop(columns="_col")
             .to_dict("records"))
    edits = []
    for e1, r1 in enumerate(items):
        if r1["x1"] < 500:
            continue
        found = False
        ins = -1
        for t1 in range(e1, 0, -1):
            r2 = items[t1 - 1]
            if r1["y2"] <= r2["y1"] and (r2["x2"] - r2["x1"]) >= 800:
                found = True
                ins = t1 - 1
        if found:
            edits.append((e1, ins, r1))
    for del_idx, ins_idx, val in edits:  # stale indices, per the reference
        del items[del_idx]
        items.insert(ins_idx, val)
    out = pd.DataFrame(items)
    out["ord"] = range(len(out))
    out["ord"] = out["ord"].astype("int32")
    return out[ORDER_SCHEMA_COLS]


def _apply_per_page(df: DataFrame, kernel) -> DataFrame:
    cols = [c for c in ORDER_SCHEMA_COLS if c != "ord"]
    return (df.select(*cols)
            .groupBy("repo", "path", "page")
            .applyInPandas(lambda pdf: kernel(pdf), ORDER_SCHEMA))


def order_pages(df: DataFrame) -> DataFrame:
    """W1: reading-order bands per page (distributed by page group)."""
    return _apply_per_page(df, order_page_kernel)


def repair_column_breaks(df: DataFrame) -> DataFrame:
    """W2: SKEMA sort + column-break repair per page."""
    return _apply_per_page(df, column_break_repair_kernel)
