"""Graph analytics over the materialized KG plus the explicit skew-salted join."""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ._shared import (  # noqa: F401
    _t,
)

# ---------------------------------------------------------------------------
# graph analytics over the materialized KG (operators/graph.py query layer)
# ---------------------------------------------------------------------------
# Deterministic document citation graph: node = doc_id; every doc cites its
# next two successors inside its decade block (i -> i+1 when i%10 <= 8,
# i -> i+2 when i%10 <= 7). Out-degrees are therefore {0, 1, 2} — powers of
# two, which keeps every fixed-damping-0.5 PageRank value a dyadic rational:
# exactly representable in doubles and exactly summable in ANY reduction
# order, so the Spark result hash-matches the DuckDB oracle bit-for-bit
# with no rounding.

_SQL_DOC_EDGES = """edges AS (
  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents WHERE doc_id % 10 <= 8
  UNION ALL
  SELECT doc_id AS src, doc_id + 2 AS dst FROM documents WHERE doc_id % 10 <= 7
)"""


def _doc_edges(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    e1 = (docs.filter(F.col("doc_id") % 10 <= 8)
          .select(F.col("doc_id").alias("src"),
                  (F.col("doc_id") + 1).alias("dst")))
    e2 = (docs.filter(F.col("doc_id") % 10 <= 7)
          .select(F.col("doc_id").alias("src"),
                  (F.col("doc_id") + 2).alias("dst")))
    return e1.unionByName(e2)


def q_graph_degree(spark, sf_dir):
    """Per-node in/out degree over the KG edge relation — two
    map-side-combined counts + one outer join on the per-node aggregates
    (the edge table is never self-joined)."""
    from ..operators.graph import degrees
    return degrees(_doc_edges(spark, sf_dir))


SQL_GRAPH_DEGREE = f"""
WITH {_SQL_DOC_EDGES},
od AS (SELECT src AS node, count(*) AS out_deg FROM edges GROUP BY src),
ind AS (SELECT dst AS node, count(*) AS in_deg FROM edges GROUP BY dst)
SELECT COALESCE(od.node, ind.node) AS node,
       COALESCE(out_deg, 0) AS out_deg,
       COALESCE(in_deg, 0) AS in_deg
FROM od FULL OUTER JOIN ind ON od.node = ind.node
"""


def q_graph_2hop(spark, sf_dir):
    """2-hop neighborhood of the seed set (every 100th doc): frontier BFS
    where only the broadcast frontier moves — the edge relation stays
    partition-local across both rounds."""
    from ..operators.graph import k_hop
    docs = _t(spark, sf_dir, "documents")
    seeds = (docs.filter(F.col("doc_id") % 100 == 0)
             .select(F.col("doc_id").alias("node")))
    return k_hop(_doc_edges(spark, sf_dir), seeds, k=2)


SQL_GRAPH_2HOP = f"""
WITH {_SQL_DOC_EDGES},
s AS (SELECT DISTINCT doc_id AS node FROM documents WHERE doc_id % 100 = 0),
h1 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN s ON e.src = s.node),
h2 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN h1 ON e.src = h1.node)
SELECT node FROM s UNION SELECT node FROM h1 UNION SELECT node FROM h2
"""


def q_graph_triangles(spark, sf_dir):
    """Per-node triangle participation: one wedge join + one closing-edge
    join over the canonical (u < v) undirected edge set; each triangle is
    produced once and credited to all three corners."""
    from ..operators.graph import triangle_counts
    return triangle_counts(_doc_edges(spark, sf_dir))


SQL_GRAPH_TRIANGLES = f"""
WITH {_SQL_DOC_EDGES},
und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM edges WHERE src <> dst),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, count(*) AS n_tri FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b AS node FROM tri
  UNION ALL SELECT c AS node FROM tri
) GROUP BY node
"""


_PAGERANK_ITERS = 5


def q_graph_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (damping 0.5, 5 rounds) — the static
    (src, dst, out_deg) relation is shuffled once and reused every round;
    only the per-node rank vector moves per iteration. Dyadic-exact by
    construction (see module comment), so the oracle needs no rounding."""
    from ..operators.graph import pagerank
    return pagerank(_doc_edges(spark, sf_dir), iters=_PAGERANK_ITERS,
                    damping=0.5)


def _pagerank_sql(iters: int) -> str:
    parts = [f"""WITH {_SQL_DOC_EDGES},
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS pr FROM nodes)"""]
    for t in range(iters):
        parts.append(f"""r{t + 1} AS (
  SELECT n.node,
         CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE)
           * COALESCE(c.s, CAST(0 AS DOUBLE)) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(r.pr / d.out_deg) AS s
    FROM edges e
    JOIN r{t} r ON e.src = r.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst) c ON n.node = c.node)""")
    return ",\n".join(parts) + f"\nSELECT node, pr FROM r{iters}"


SQL_GRAPH_PAGERANK = _pagerank_sql(_PAGERANK_ITERS)

def q_salted_join(spark, sf_dir):
    """Deterministic skew-salted shuffle join (operators/skew.py — the
    north-star 'monorepo hot key' mitigation): events (probe, 5-value
    hot key event_type) left-joined to a derived per-type dim with the
    probe side salted 8 ways and the dim replicated across salts. The
    rewrite is an identity — the oracle is the PLAIN SQL join, checked
    row-for-row; 'error' rows exercise the preserved-left (no match)
    path."""
    from ..operators.skew import salted_join
    ev = _t(spark, sf_dir, "events")
    dim = (ev.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("type_n"))
           .where(F.col("event_type") != "error"))
    out = salted_join(ev, dim, on=["event_type"], salt_on="event_id",
                      n_salt=8, how="left")
    return out.select("event_id", "event_type", "type_n")


SQL_SALTED_JOIN = """
SELECT e.event_id, e.event_type, d.type_n
FROM events e
LEFT JOIN (SELECT event_type, count(*) AS type_n FROM events
           GROUP BY event_type HAVING event_type <> 'error') d
  USING (event_type)
"""


def q_graph_jaccard(spark, sf_dir):
    """Link prediction by neighbor-set Jaccard (operators/graph.py
    neighbor_jaccard): every co-neighbor pair of the doc citation graph
    scored |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — the structural 'related
    entity' ranking a KG consumer runs over the materialized graph. The
    doc graph's degrees are bounded (<= 4), so the exact contract
    (max_degree=None) applies; the hub cap is plan-pinned separately."""
    from ..operators.graph import neighbor_jaccard
    return neighbor_jaccard(_doc_edges(spark, sf_dir))


SQL_GRAPH_JACCARD = f"""
WITH {_SQL_DOC_EDGES},
und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM edges WHERE src <> dst),
sym AS (SELECT u AS node, v AS nbr FROM und
        UNION ALL SELECT v AS node, u AS nbr FROM und),
deg AS (SELECT node, count(*) AS deg FROM sym GROUP BY node),
common AS (
  SELECT s1.nbr AS node_a, s2.nbr AS node_b, count(*) AS common
  FROM sym s1 JOIN sym s2 ON s1.node = s2.node AND s1.nbr < s2.nbr
  GROUP BY s1.nbr, s2.nbr)
SELECT c.node_a, c.node_b, c.common,
       round(CAST(c.common AS DOUBLE)
             / (da.deg + db.deg - c.common), 6) AS jac
FROM common c
JOIN deg da ON da.node = c.node_a
JOIN deg db ON db.node = c.node_b
"""


def q_graph_label_prop(spark, sf_dir):
    """Community detection by synchronous label propagation
    (operators/graph.py label_propagation): 3 fixed rounds, most-frequent
    neighbor label with (count DESC, label ASC) tie-break — the
    deterministic LPA contract whose oracle is the same 3 rounds
    unrolled as SQL CTEs."""
    from ..operators.graph import label_propagation
    return label_propagation(_doc_edges(spark, sf_dir), rounds=3)


_SQL_LPA_ROUND = """
m{i} AS (SELECT u.dst AS node, l.label, count(*) AS c
         FROM und u JOIN l{j} l ON u.src = l.node GROUP BY 1, 2),
l{i} AS (SELECT node, label FROM (
           SELECT node, label,
                  row_number() OVER (PARTITION BY node
                                     ORDER BY c DESC, label ASC) AS rn
           FROM m{i}) WHERE rn = 1)"""

SQL_GRAPH_LABEL_PROP = f"""
WITH {_SQL_DOC_EDGES},
und AS (SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM edges
          UNION ALL
          SELECT dst AS src, src AS dst FROM edges) s
        WHERE src <> dst),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
{_SQL_LPA_ROUND.format(i=1, j=0)},
{_SQL_LPA_ROUND.format(i=2, j=1)},
{_SQL_LPA_ROUND.format(i=3, j=2)}
SELECT node, label AS community FROM l3
"""


def q_graph_distances(spark, sf_dir):
    """Multi-source BFS shortest distances from the seed set (every 100th
    doc) in <= 3 hops (operators/graph.py bfs_distances) — the
    'how far is this entity from the seed concepts' query a KG consumer
    runs; oracle = the 3 BFS layers unrolled as CTEs."""
    from ..operators.graph import bfs_distances
    docs = _t(spark, sf_dir, "documents")
    seeds = (docs.filter(F.col("doc_id") % 100 == 0)
             .select(F.col("doc_id").alias("node")))
    return bfs_distances(_doc_edges(spark, sf_dir), seeds, max_hops=3)


SQL_GRAPH_DISTANCES = f"""
WITH {_SQL_DOC_EDGES},
d0 AS (SELECT DISTINCT doc_id AS node, 0 AS dist FROM documents
       WHERE doc_id % 100 = 0),
f1 AS (SELECT DISTINCT e.dst AS node FROM edges e
       JOIN d0 ON e.src = d0.node),
d1 AS (SELECT node, 1 AS dist FROM f1
       WHERE node NOT IN (SELECT node FROM d0)),
f2 AS (SELECT DISTINCT e.dst AS node FROM edges e
       JOIN d1 ON e.src = d1.node),
d2 AS (SELECT node, 2 AS dist FROM f2
       WHERE node NOT IN (SELECT node FROM d0 UNION ALL
                          SELECT node FROM d1)),
f3 AS (SELECT DISTINCT e.dst AS node FROM edges e
       JOIN d2 ON e.src = d2.node),
d3 AS (SELECT node, 3 AS dist FROM f3
       WHERE node NOT IN (SELECT node FROM d0 UNION ALL
                          SELECT node FROM d1 UNION ALL
                          SELECT node FROM d2))
SELECT node, dist FROM d0 UNION ALL SELECT node, dist FROM d1
UNION ALL SELECT node, dist FROM d2 UNION ALL SELECT node, dist FROM d3
"""
