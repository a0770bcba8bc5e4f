"""`cosmos_corpus` — a registered Spark Python DataSource (batch +
micro-batch streaming) over the deterministic synthetic corpus.

The engine's input is "an Iceberg table of source-code repositories"
(BASELINE.json input_hint); in production the scan is a table format.
This source is the OTHER half of the S-family story: a first-class
pluggable source (Spark 4 `pyspark.sql.datasource` API, the successor
to the DataSource V2 Python gap) so the same corpus rows arrive via

    spark.dataSource.register(CorpusDataSource)
    spark.read.format("cosmos_corpus").option("files_per_repo", 80).load()
    spark.readStream.format("cosmos_corpus").option(...).load()

with real partition planning instead of an ad-hoc helper:

- batch: the global file-index space [0, total) is split into
  `num_partitions` contiguous `InputPartition` ranges — each task
  synthesizes only its slice (executor-side generation, no driver
  bottleneck, same property as corpus.make_corpus_spark);
- streaming: offsets are positions in that same index space; each
  micro-batch admits the next `rows_per_batch` rows. Offsets are
  checkpointable dicts and `read(start)` is driven by the restored
  offset, so a restarted query resumes mid-corpus and
  `readBetweenOffsets` replays any batch bit-identically (content is a
  pure function of (seed, repo, idx), corpus.py banner).

Rows are IDENTICAL to corpus.make_corpus / make_corpus_spark at the
same options (pinned by test): index planning and row synthesis are
delegated to the ONE shared definition (`corpus.corpus_index_space` /
`corpus.corpus_row_at`), with the planted edge-case rows occupying the
tail indices [total_files, total_files + n_edges).
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = ("repo string, path string, commit string, lang string, "
          "content string, content_sha256 string")
_COLS = ["repo", "path", "commit", "lang", "content", "content_sha256"]


class _Opts:
    """Typed view of the string option map (shared batch/stream)."""

    def __init__(self, options: dict):
        self.n_repos = int(options.get("n_repos", 10))
        self.files_per_repo = int(options.get("files_per_repo", 20))
        self.skew_factor = int(options.get("skew_factor", 20))
        self.seed = int(options.get("seed", 42))
        self.include_edges = (str(options.get("include_edges", "true"))
                              .lower() == "true")
        self.num_partitions = int(options.get("num_partitions", 8))
        self.rows_per_batch = int(options.get("rows_per_batch", 50))

    def bounds(self):
        """(bounds, n_files, total) — delegated to the ONE index-space
        definition in corpus.corpus_index_space."""
        from ..corpus import corpus_index_space
        return corpus_index_space(self.n_repos, self.files_per_repo,
                                  self.skew_factor, self.include_edges)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _split(start: int, end: int, n: int) -> Sequence[_Range]:
    total = end - start
    if total <= 0:
        return []
    n = max(1, min(n, total))
    step, rem = divmod(total, n)
    parts, lo = [], start
    for i in range(n):
        hi = lo + step + (1 if i < rem else 0)
        parts.append(_Range(lo, hi))
        lo = hi
    return parts


def _read_range(opts: _Opts, start: int, end: int) -> Iterator[tuple]:
    """Synthesize rows for global indices [start, end) — stateless, a
    pure function of (options, index range), via the shared
    corpus.corpus_row_at mapping."""
    from ..corpus import _edge_rows, corpus_row_at

    bounds, n_files, _total = opts.bounds()
    starts = [b[0] for b in bounds]
    edges = _edge_rows() if opts.include_edges else []
    for gidx in range(start, end):
        row = corpus_row_at(opts.seed, bounds, starts, n_files, edges,
                            gidx)
        yield tuple(row[c] for c in _COLS)


class CorpusBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.opts = _Opts(options)

    def partitions(self) -> Sequence[InputPartition]:
        _bounds, _n_files, total = self.opts.bounds()
        return _split(0, total, self.opts.num_partitions)

    def read(self, partition: _Range) -> Iterator[tuple]:
        return _read_range(self.opts, partition.start, partition.end)


class CorpusStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: offset = position in the global file index;
    each batch admits the next rows_per_batch rows until the corpus is
    exhausted (a bounded, replayable ingest stream). The SIMPLE stream
    API is the deliberate choice: its `read(start)` receives the
    checkpointed offset, so a restarted query resumes mid-corpus — the
    partition-planning API (`DataSourceStreamReader`) never sees the
    restored offset and a rate-limited reader deadlocks after restart
    (its `latestOffset` restarts below the checkpoint). Row synthesis
    is a pure function of (options, index range), so
    `readBetweenOffsets` replays any batch bit-identically."""

    def __init__(self, options: dict):
        self.opts = _Opts(options)
        _bounds, _n_files, self.total = self.opts.bounds()

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict) -> tuple:
        lo = int(start["idx"])
        hi = min(lo + self.opts.rows_per_batch, self.total)
        # materialized list, not a generator: the simple API prefetches
        # batch rows driver-side and pickles them to executors
        return list(_read_range(self.opts, lo, hi)), {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return list(_read_range(self.opts, int(start["idx"]),
                                int(end["idx"])))


class CorpusDataSource(DataSource):
    """Register with ``spark.dataSource.register(CorpusDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "cosmos_corpus"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        # rows are synthesized positionally in _COLS order; a
        # user-supplied .schema(...) that reorders or subsets columns
        # would silently misassign values — refuse it loudly (project
        # with .select AFTER load instead)
        names = list(schema.fieldNames()) if schema is not None else _COLS
        if names != list(_COLS):
            raise ValueError(
                f"cosmos_corpus emits columns {list(_COLS)} positionally; "
                f"got read schema {names} — drop .schema() and project "
                f"with .select() after load")
        return CorpusBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return CorpusStreamReader(self.options)
