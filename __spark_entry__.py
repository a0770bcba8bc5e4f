"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on the sf0.001
stand-in corpus and returns the triples DataFrame. ``queries()`` /
``oracle_sql()`` expose one entry per implemented SURVEY §2 operator family
(registry in :mod:`cosmos_spark.queries`); the driver verifies each against
DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cosmos_spark.queries import _docs_as_source, ordered_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full KG pipeline (segment -> mentions -> link ->
    canonicalize -> triples) over sf0.001 documents mapped to the
    (repo, path, commit, lang, content) source shape."""
    from cosmos_spark.pipeline import run_pipeline

    source = _docs_as_source(spark, "/root/testdata/sf0.001")
    return run_pipeline(spark, source)["triples"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in ordered_queries().items()
            if sql is not None}
