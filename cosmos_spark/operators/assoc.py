"""Greedy nearest-neighbor association (the J3/J10 analog).

The reference pairs each caption with the *closest remaining* object by
squared centroid distance, popping matched objects from the pool — greedy
and order-dependent (`cosmos/ingestion/ingest/process/aggregation/
aggregate.py:46-112`: distance `:70-82`, ``objs.pop`` `:82`, leftovers
`:94-111`). That pop semantics is not expressible as a pure relational
join (a row_number-over-distance window would let two captions claim the
same object), so — exactly like the reference — it runs as a per-group
kernel: ``groupBy(repo, path).applyInPandas``. Groups are single files
(bounded size; the reference's analog bound is the 19-proposal cap), so
the quadratic scan inside the kernel is O(1) per file and the operator
scales linearly with the corpus.

Code-domain instantiation: associate each *comment* segment with the
nearest remaining *function/class* segment by line distance (caption ->
object becomes docstring-ish comment -> definition).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ASSOC_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("comment_seg_id", T.StringType()),
    T.StructField("object_seg_id", T.StringType()),
    T.StructField("object_kind", T.StringType()),
    T.StructField("line_distance", T.IntegerType()),
])

CAPTION_KINDS = ("comment",)
OBJECT_KINDS = ("function", "class")


def associate_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy pairing inside one file. Deterministic: captions processed in
    line order; distance = |caption.line_start - object.line_start|, ties
    broken toward the earlier object (same tie rule as min() over the
    candidate scan in aggregate.py:70-82)."""
    pdf = pdf.sort_values(["line_start", "seg_id"]).reset_index(drop=True)
    captions = pdf[pdf["kind"].isin(CAPTION_KINDS)]
    pool = pdf[pdf["kind"].isin(OBJECT_KINDS)][
        ["seg_id", "kind", "line_start"]].to_dict("records")
    out = []
    repo = pdf["repo"].iloc[0] if len(pdf) else None
    path = pdf["path"].iloc[0] if len(pdf) else None
    for cap in captions.itertuples(index=False):
        if not pool:
            out.append((repo, path, cap.seg_id, None, None, None))
            continue
        best_i, best_d = 0, None
        for i, obj in enumerate(pool):
            d = abs(int(cap.line_start) - int(obj["line_start"]))
            if best_d is None or d < best_d:
                best_i, best_d = i, d
        obj = pool.pop(best_i)
        out.append((repo, path, cap.seg_id, obj["seg_id"], obj["kind"],
                    int(best_d)))
    # leftovers: unmatched objects emitted with null caption (aggregate.py:94-111)
    for obj in pool:
        out.append((repo, path, None, obj["seg_id"], obj["kind"], None))
    return pd.DataFrame(out, columns=[f.name for f in ASSOC_SCHEMA.fields])


def associate_comments(segments: DataFrame) -> DataFrame:
    """segments -> (repo, path, comment_seg_id, object_seg_id, object_kind,
    line_distance). One shuffle on (repo, path); kernel work is per-file."""
    relevant = segments.filter(
        F.col("kind").isin(*CAPTION_KINDS, *OBJECT_KINDS)
    ).select("repo", "path", "seg_id", "kind", "line_start")
    return relevant.groupBy("repo", "path").applyInPandas(
        lambda pdf: associate_kernel(pdf), ASSOC_SCHEMA)
