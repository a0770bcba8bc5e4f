"""cosmos_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the *computational shape* of
UW-COSMOS/Cosmos (segment -> classify -> pool -> aggregate -> link ->
canonicalize -> materialize a queryable entity<->object graph) as a staged
DataFrame job over a table of source-code repositories
``(repo, path, commit, lang, content)``.

Layout
------
- :mod:`cosmos_spark.session`    SparkSession factory (Arrow + AQE on)
- :mod:`cosmos_spark.corpus`     deterministic synthetic source corpus
- :mod:`cosmos_spark.kernels`    pure pandas kernels shared by the Spark
  pipeline and the single-node oracle (the Cosmos test strategy:
  known input -> knowable expected output)
- :mod:`cosmos_spark.pipeline`   the staged DataFrame job
- :mod:`cosmos_spark.oracle`     single-node pandas oracle
- :mod:`cosmos_spark.operators`  reusable operators (interval join,
  dedup family, similarity search, text stats, windows, multimodal)
- :mod:`cosmos_spark.plans`      lineage / checkpoint-resume protocol
- :mod:`cosmos_spark.sources`    table catalog abstraction (parquet dir,
  Iceberg-compatible call shape)
"""

__version__ = "0.1.0"
