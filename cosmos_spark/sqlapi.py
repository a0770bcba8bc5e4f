"""SQL-surface registration — the engine for SQL-only consumers.

A reference user queries through an HTTP/ES DSL front-end
(`cosmos/retrieval/retrieval/elastic_retriever.py`); the Spark-native
equivalent is ``spark.sql`` over registered views and functions (a
notebook, Thrift server, or downstream job that never touches the
DataFrame API). This module exposes:

- the engine's scalar kernels as Arrow-VECTORIZED SQL functions
  (`register_functions`): each is the same pandas kernel the pipeline
  runs, wrapped in a pandas_udf — batched columnar transfer, not
  row-at-a-time Python;
- the materialized graph tables as temp views (`register_graph_views`)
  so the KG is one ``SELECT`` away.

`q_sql_surface` gates the route end-to-end (view + registered
functions + pure-SQL query, value-exact vs DuckDB).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

#: SQL name -> (kernel function, return type). All are batched pandas
#: kernels from kernels.py (provenance cites in their docstrings).
_FUNCTIONS = {
    "kg_alias_norm": ("alias_norm", "string"),
    "kg_basename": ("basename", "string"),
    "kg_defuzz": ("defuzz", "string"),
    "kg_entity_id": ("entity_id_for", "string"),
}


def register_functions(spark: SparkSession) -> list[str]:
    """Register the scalar kernels as vectorized SQL functions; returns
    the registered names. Idempotent (re-registration replaces)."""
    from . import kernels as K

    names = []
    for sql_name, (attr, rtype) in _FUNCTIONS.items():
        spark.udf.register(sql_name, F.pandas_udf(getattr(K, attr), rtype))
        names.append(sql_name)

    # two-argument kernel needs its own wrapper signature
    @F.pandas_udf("double")
    def _tj(a, b):
        return K.trigram_jaccard(a, b)

    spark.udf.register("kg_trigram_jaccard", _tj)
    names.append("kg_trigram_jaccard")
    return names


def register_graph_views(spark: SparkSession, catalog, tables=None,
                         view_prefix: str = "kg_") -> list[str]:
    """Temp views over a written graph warehouse (`pipeline.write_graph`
    tables by default): SQL consumers join/filter the KG directly.
    Returns the view names."""
    tables = tables if tables is not None else [
        "graph.triples", "graph.nodes", "graph.documents"]
    views = []
    for t in tables:
        name = view_prefix + t.split(".")[-1]
        if name in views:
            # two tables sharing a suffix would silently clobber one
            # view and SQL consumers would query the wrong table
            raise ValueError(
                f"view name collision: {name!r} (from {t!r}) — tables "
                f"sharing a last dotted component need distinct "
                f"view_prefix calls")
        catalog.read(t).createOrReplaceTempView(name)
        views.append(name)
    return views
