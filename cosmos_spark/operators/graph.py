"""Distributed graph operators.

``connected_components`` is the general iterative CC for edge relations that
*can* cross any blocking scheme (the scale-out replacement for the
reference's in-memory fixpoint merge, `group_cls.py:94-122`, and for
`link.py:113` drop_duplicates-style dedup). The KG pipeline's
canonicalization doesn't need it (its edges are block-local by
construction, see pipeline.canonicalize); it exists for graphs built from
arbitrary edges — e.g. cross-repo same_as chains or MinHash-LSH candidate
pairs spanning bands.

Algorithm: min-label propagation (a simplified large-star step per
iteration) — converges in O(component diameter) rounds; every round is one
shuffle join + one aggregation, localCheckpointed to keep lineage flat.
Skew note: a giant component's label traffic is spread by the groupBy hash
shuffle; AQE splits oversized reduce partitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_iters: int = 25) -> DataFrame:
    """nodes: (node), edges: (src, dst) undirected-as-given (symmetrized
    here). Returns (node, component) with component = min node id in the
    component."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()

    labels = nodes.select(F.col("node"),
                          F.col("node").alias("component")).localCheckpoint()
    for _ in range(max_iters):
        neighbor = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node").agg(F.min("component").alias("component"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels
