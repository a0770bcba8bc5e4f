"""Code-corpus governance queries: license detection/propagation, repo
fork detection, and bigram-LM quality scoring (operators/repostats.py
query layer).

Like the KG family (`_shared._linking_source`), these construct their
code-shaped input deterministically from the ``documents`` table so the
DuckDB oracle can replay the construction and the full operator
semantics in ANSI SQL.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ._shared import (  # noqa: F401
    _t,
)

# ---------------------------------------------------------------------------
# license detection + repo-level propagation
# ---------------------------------------------------------------------------
# Deterministic header planting: doc_id % 5 picks one of the four license
# header phrases (or none), prepended as a comment line — the oracle
# replays the same construction, so the detector semantics (NOT the
# planting) are what the value comparison verifies.

_HDR = {
    0: "# Permission is hereby granted, free of charge",
    1: "# Licensed under the Apache License, Version 2.0",
    2: "# This file is part of a GNU General Public License v3 distribution",
    3: "# Redistribution and use in source and binary forms, with or without"
       " modification",
}


def _license_files(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    hdr = F.when(F.lit(False), "")
    for r, line in _HDR.items():
        hdr = hdr.when(F.col("doc_id") % 5 == r, line + "\n")
    hdr = hdr.otherwise("")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("d"), F.col("doc_id").cast("string"),
                 F.lit(".py")).alias("path"),
        F.concat(hdr, F.col("text")).alias("content"),
    )


def q_license_propagate(spark, sf_dir):
    """License governance, The-Stack-style: classify each file's license
    from its header comment, resolve a repo-level license by majority
    vote (ties -> smallest id, 'unknown' when no file matched), and
    stamp the per-file keep decision for a permissive-only corpus
    (effective license = file's own, else the repo's).

    Scale: detection is a bounded-window regex per row (map-only); the
    vote is a (repo, license)-keyed partial agg collapsing to one row
    per repo, broadcast back. 100 TB of content streams through
    map-side work plus one broadcast join."""
    from ..operators.repostats import (PERMISSIVE_LICENSES, detect_license,
                                       propagate_repo_license)
    lic = _license_files(spark, sf_dir).withColumn(
        "file_license", detect_license(F.col("content")))
    rl = propagate_repo_license(lic)
    eff = F.coalesce("file_license", "repo_license")
    return (lic.join(F.broadcast(rl), "repo")
            .select("repo", "path",
                    F.coalesce("file_license", F.lit("none"))
                    .alias("file_license"),
                    "repo_license",
                    eff.isin(*PERMISSIVE_LICENSES).cast("int")
                    .alias("keep")))


SQL_LICENSE_PROPAGATE = f"""
WITH files AS (
  SELECT source AS repo, 'd' || doc_id || '.py' AS path,
         (CASE CAST(doc_id % 5 AS INTEGER)
            WHEN 0 THEN '{_HDR[0]}' || chr(10)
            WHEN 1 THEN '{_HDR[1]}' || chr(10)
            WHEN 2 THEN '{_HDR[2]}' || chr(10)
            WHEN 3 THEN '{_HDR[3]}' || chr(10)
            ELSE '' END) || text AS content
  FROM documents),
lic AS (
  SELECT repo, path,
         CASE
           WHEN regexp_matches(substr(content, 1, 400),
                               'Permission is hereby granted') THEN 'MIT'
           WHEN regexp_matches(substr(content, 1, 400),
                               'Licensed under the Apache License')
             THEN 'Apache-2.0'
           WHEN regexp_matches(substr(content, 1, 400),
                               'GNU General Public License') THEN 'GPL-3.0'
           WHEN regexp_matches(substr(content, 1, 400),
                               'Redistribution and use in source and binary forms')
             THEN 'BSD-3-Clause'
         END AS file_license
  FROM files),
counts AS (
  SELECT repo, file_license, count(*) AS c FROM lic
  WHERE file_license IS NOT NULL GROUP BY 1, 2),
voted AS (
  SELECT repo, file_license AS repo_license FROM (
    SELECT repo, file_license,
           row_number() OVER (PARTITION BY repo
                              ORDER BY c DESC, file_license ASC) AS rn
    FROM counts) WHERE rn = 1),
rl AS (
  SELECT r.repo, coalesce(v.repo_license, 'unknown') AS repo_license
  FROM (SELECT DISTINCT repo FROM lic) r LEFT JOIN voted v USING (repo))
SELECT l.repo, l.path,
       coalesce(l.file_license, 'none') AS file_license,
       rl.repo_license,
       CASE WHEN coalesce(l.file_license, rl.repo_license)
                 IN ('MIT', 'Apache-2.0', 'BSD-3-Clause')
            THEN 1 ELSE 0 END AS keep
FROM lic l JOIN rl USING (repo)
"""


# ---------------------------------------------------------------------------
# repo fork detection
# ---------------------------------------------------------------------------

def q_fork_detect(spark, sf_dir):
    """Repo-level near-duplicate (fork) detection: Jaccard over per-repo
    file-content-hash sets, pairs generated by an inverted-index
    self-join on the hash with a document-frequency cap — never an
    all-pairs repo join. Input plants one 'mirror/<repo>' per source
    holding every 4th file, so each source/mirror pair shares exactly
    that subset (expected Jaccard = 0.25)."""
    from ..operators.repostats import fork_candidates
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(F.col("source").alias("repo"),
                       F.md5("text").alias("file_hash"))
    mirror = (docs.filter(F.col("doc_id") % 4 == 0)
              .select(F.concat(F.lit("mirror/"), "source").alias("repo"),
                      F.md5("text").alias("file_hash")))
    return fork_candidates(base.unionByName(mirror),
                           max_df=64, min_jaccard=0.05)


SQL_FORK_DETECT = """
WITH files AS (
  SELECT source AS repo, md5(text) AS file_hash FROM documents
  UNION ALL
  SELECT 'mirror/' || source, md5(text) FROM documents WHERE doc_id % 4 = 0),
uniq AS (SELECT DISTINCT repo, file_hash FROM files),
sizes AS (SELECT repo, count(*) AS n FROM uniq GROUP BY 1),
rare AS (SELECT file_hash FROM uniq GROUP BY 1 HAVING count(*) <= 64),
inv AS (SELECT u.repo, u.file_hash FROM uniq u JOIN rare USING (file_hash)),
shared AS (
  SELECT a.repo AS repo_a, b.repo AS repo_b, count(*) AS n_shared
  FROM inv a JOIN inv b ON a.file_hash = b.file_hash AND a.repo < b.repo
  GROUP BY 1, 2)
SELECT repo_a, repo_b, n_shared, sa.n AS n_a, sb.n AS n_b,
       round(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 6)
         AS jaccard
FROM shared
JOIN sizes sa ON sa.repo = shared.repo_a
JOIN sizes sb ON sb.repo = shared.repo_b
WHERE round(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 6) >= 0.05
"""


# ---------------------------------------------------------------------------
# bigram-LM quality scoring
# ---------------------------------------------------------------------------

def q_bigram_lm_score(spark, sf_dir):
    """CCNet-style LM quality filter: train an add-k bigram model on the
    corpus (one map-side-combinable count job), score every document's
    mean token log-probability by joining its bigrams to the broadcast
    count relations. Low scorers are the gibberish/boilerplate a
    pretraining recipe drops.

    The driver-hashed relation carries the exact dyadic sums
    (sum_num, sum_den) rather than avg_logp: round(avg(ln(...)), 6) of
    irrational doubles is not bit-exact by construction across engines
    (partition-ordered partial sums + libm ln ulps can flip the 6th
    decimal), while the sums are exact multiples of 0.5 — see the
    bigram_lm_score docstring. avg_logp stays in the operator API and is
    pinned against a pure-python reference in tests/test_operators.py."""
    from ..operators.repostats import bigram_lm_score
    return (bigram_lm_score(_t(spark, sf_dir, "documents"))
            .select("doc_id", "n_bigrams", "sum_num", "sum_den"))


SQL_BIGRAM_LM_SCORE = r"""
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_slice(w, 1, len(w) - 1)) AS w1,
         unnest(list_slice(w, 2, len(w))) AS w2
  FROM ws WHERE len(w) >= 2),
c2 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1),
v AS (SELECT count(DISTINCT ux) AS v
      FROM (SELECT unnest(w) AS ux FROM ws) u),
scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(CAST(n12 AS DOUBLE) + 0.5) AS DOUBLE) AS sum_num,
         CAST(sum(CAST(n1 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)) AS DOUBLE)
           AS sum_den
  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
  GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       s.sum_num, s.sum_den
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# model-hook scoring (M7 executor-singleton with real state)
# ---------------------------------------------------------------------------

_MODEL_ARTIFACT_MEMO: dict = {}

#: dyadic weights (i+1)/16: every per-doc sum is an exact multiple of
#: 1/16, representable and order-independently summable in doubles, so
#: the Spark kernel and the DuckDB oracle agree bit-for-bit.
_MODEL_DIM = 8


def _model_artifact(spark) -> str:
    """Ship the deterministic .npz weight artifact once per application
    (addFile rejects re-adding a changed path under one basename)."""
    import os

    import numpy as np

    from ._shared import _memo_scope, _tmpdir
    key = (spark.sparkContext.applicationId,)
    _memo_scope(_MODEL_ARTIFACT_MEMO, spark)
    if key not in _MODEL_ARTIFACT_MEMO:
        path = os.path.join(_tmpdir("cosmos_modelw_"), "q_model_w.npz")
        np.savez(path, w=np.arange(1, _MODEL_DIM + 1, dtype="float64") / 16.0)
        spark.sparkContext.addFile(path)
        _MODEL_ARTIFACT_MEMO[key] = path
    return _MODEL_ARTIFACT_MEMO[key]


def q_model_scores(spark, sf_dir):
    """The M7 model hook scoring the corpus through REAL executor state:
    a numpy weight artifact shipped via addFile, np.load-ed once per
    Python worker (retrieval._load_model singleton — the reference's
    Dask worker-preload pattern, `preload_plugins/linking_setup.py:9-16`),
    scores = hashed bag-of-words over the engine-portable hash60. The
    oracle replays the model exactly in SQL, so the driver value-checks
    the whole executor-side load->score path."""
    from .. import retrieval
    _model_artifact(spark)
    docs = _t(spark, sf_dir, "documents")
    return (retrieval.model_scores(docs, "q_model_w.npz")
            .select("doc_id", "model_score"))


_W_CASE = " ".join(
    f"WHEN {i} THEN CAST({(i + 1) / 16.0!r} AS DOUBLE)"
    for i in range(_MODEL_DIM))

SQL_MODEL_SCORES = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
  FROM documents),
scored AS (
  SELECT doc_id,
         sum(CASE CAST(('0x' || substr(md5(tok), 1, 15))::UBIGINT
                       % {_MODEL_DIM} AS INTEGER)
             {_W_CASE} END) AS s
  FROM toks GROUP BY doc_id)
SELECT d.doc_id, round(coalesce(s.s, 0.0), 6) AS model_score
FROM documents d LEFT JOIN scored s USING (doc_id)
"""
