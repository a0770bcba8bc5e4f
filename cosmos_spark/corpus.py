"""Deterministic synthetic source-code corpus.

The test-input analog of the reference's golden-fixture PDFs
(`cosmos_service/test/resources/pdfs/bucky.pdf` + hand-annotated XML,
`cosmos_service/test/src/annotations/annotations_base.py:16-133`): a known
input whose expected segments / mentions / triples are enumerable by
construction. Seeded, no wall-clock, no uuids.

Shape is exactly the BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``
plus the derived per-row invariant ``content_sha256``.

Every file's content is a pure function of ``(seed, repo, file_idx)`` — a
per-file ``random.Random`` stream — so the corpus is identical whether it
is generated driver-side in pandas (:func:`make_corpus`, small test scale)
or executor-side via ``spark.range + mapInPandas``
(:func:`make_corpus_spark`, bench scale: a driver-side generator cannot
feed a cluster, and at 10^12 files the input must be synthesized or
scanned where it is consumed).

Fixtures planted (FIXTURES.md §1, §3):

- one skewed "monorepo" with ``skew_factor`` x the per-repo file count;
- an empty file (zero segments, no crash);
- a file with no blank-line separators (single segment);
- unicode-ligature rows (normalize_text analog,
  `cosmos/ingestion/ingest/utils/normalize_text.py:19-28`);
- duplicate content across two repos (same sha256, distinct (repo,path));
- cross-repo entities with alias-variant names (``load_config`` vs
  ``loadConfig`` vs ``load_config_v2``) so canonicalization has real
  same_as edges to find.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd

LANGS = ["python", "java", "md"]

# identifier stems used for planted defs/calls; variants of the same stem
# must canonicalize together (same_as), distinct stems must not.
STEMS = [
    "load_config",
    "parse_args",
    "run_pipeline",
    "write_output",
    "fetch_rows",
    "merge_frames",
    "score_model",
    "init_session",
    "read_table",
    "emit_triples",
]


# variant spellings of a stem: underscore, camelCase, _v2 suffix, leading _
def _variants(stem: str) -> list[str]:
    parts = stem.split("_")
    camel = parts[0] + "".join(p.capitalize() for p in parts[1:])
    return [stem, camel, stem + "_v2", "_" + stem]


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _commit_for(repo: str, path: str) -> str:
    return _sha(f"commit|{repo}|{path}")[:40]


def _py_file(rng: random.Random, repo: str, fidx: int) -> str:
    """A python file with 2-4 blank-line-separated segments."""
    stem_def = rng.choice(STEMS)
    name_def = rng.choice(_variants(stem_def))
    stem_call = rng.choice(STEMS)
    name_call = rng.choice(_variants(stem_call))
    imp_mod = rng.choice(["os", "json", "pkg.util", "pkg.bar", "collections"])
    imp_from = rng.choice(["pkg.core", "pkg.io", "lib.base"])
    imp_name = rng.choice(_variants(rng.choice(STEMS)))

    blocks = [
        f"import {imp_mod}\nfrom {imp_from} import {imp_name}",
        f"# module {repo} file {fidx}\n# generated fixture",
        f"def {name_def}(x, y):\n    z = {name_call}(x)\n    return z + y",
    ]
    if rng.random() < 0.5:
        cls = "C" + str(fidx % 7)
        blocks.append(
            f"class {cls}:\n    def method_{fidx % 5}(self):\n"
            f"        return {name_def}(1, 2)"
        )
    rng.shuffle(blocks)
    return "\n\n".join(blocks) + "\n"


def _java_file(rng: random.Random, repo: str, fidx: int) -> str:
    name = rng.choice(_variants(rng.choice(STEMS)))
    callee = rng.choice(_variants(rng.choice(STEMS)))
    return (
        f"import java.util.List;\nimport com.example.Util;\n\n"
        f"// fixture {repo}/{fidx}\n\n"
        f"class Handler{fidx % 9} {{\n"
        f"    int {name}(int a) {{\n"
        f"        return {callee}(a) + 1;\n"
        f"    }}\n"
        f"}}\n"
    )


def _md_file(rng: random.Random, repo: str, fidx: int) -> str:
    stem = rng.choice(STEMS)
    body = (
        f"# Notes {fidx}\n\n"
        f"This doc mentions {stem} and the ﬁle format.\n\n"
        f"- item one\n- item two\n"
    )
    # M2 fixture: display-math block -> equation kind (md files land on
    # fidx % 3 == 2, so key the condition on fidx % 2 to hit half of them)
    if fidx % 2 == 0:
        body += f"\n$$\nE_{{{fidx}}} = m \\cdot c^2 + {fidx}\n$$\n"
    return body


def _file_row(seed: int, repo: str, fidx: int) -> dict:
    """Pure function (seed, repo, fidx) -> source row."""
    rng = random.Random(f"{seed}|{repo}|{fidx}")
    lang = LANGS[fidx % len(LANGS)]
    ext = {"python": "py", "java": "java", "md": "md"}[lang]
    path = f"src/m{fidx % 10}/f_{fidx:04d}.{ext}"
    if lang == "python":
        content = _py_file(rng, repo, fidx)
    elif lang == "java":
        content = _java_file(rng, repo, fidx)
    else:
        content = _md_file(rng, repo, fidx)
    return {"repo": repo, "path": path, "commit": _commit_for(repo, path),
            "lang": lang, "content": content}


def _edge_rows() -> list[dict]:
    """FIXTURES.md §3 edge fixtures."""
    edge_repo = "org9/edge_repo"
    edge = [
        # empty file -> zero segments
        {"repo": edge_repo, "path": "empty.py", "lang": "python", "content": ""},
        # no blank-line separators -> single segment
        {"repo": edge_repo, "path": "dense.py", "lang": "python",
         "content": "import os\ndef solo(a):\n    return a\nx = solo(1)\n"},
        # unicode ligatures (normalize_text analog)
        {"repo": edge_repo, "path": "liga.md", "lang": "md",
         "content": "# ﬁle\n\nThe eﬀort deﬁnes quality.\n"},
        # hyphen line-wrap (dehyphenation analog)
        {"repo": edge_repo, "path": "wrap.md", "lang": "md",
         "content": "# wrap\n\nThis uses a config-\nuration value.\n"},
        # M2: LaTeX equation environment -> equation kind
        {"repo": edge_repo, "path": "eq.md", "lang": "md",
         "content": ("# eq\n\n\\begin{equation}\nx^2 + y^2 = z^2\n"
                     "\\end{equation}\n\n$$\na = b + c\n$$\n")},
    ]
    # cross-prefix canonicalization variants: xload_config ~ load_config has
    # trigram J = 0.9 but the names differ in their first 4 chars — a
    # prefix-blocked canonicalizer silently drops this same_as edge (the
    # VERDICT r1 recall fixture for multi-key blocking)
    edge.append({"repo": "org3/canon_x", "path": "canon_x.py",
                 "lang": "python",
                 "content": "def xload_config(p):\n    return p\n"})
    dup_content = "import json\n\ndef load_config(p):\n    return json.loads(p)\n"
    edge.append({"repo": "org1/dup_a", "path": "dup.py", "lang": "python",
                 "content": dup_content})
    edge.append({"repo": "org2/dup_b", "path": "same/dup.py", "lang": "python",
                 "content": dup_content})
    for e in edge:
        e["commit"] = _commit_for(e["repo"], e["path"])
    return edge


def _repo_spec(n_repos: int, files_per_repo: int,
               skew_factor: int) -> list[tuple[str, int]]:
    """[(repo, n_files)] — repo 0 is the skewed monorepo."""
    return [
        (f"org{r % 3}/repo_{r:02d}",
         files_per_repo * (skew_factor if r == 0 else 1))
        for r in range(n_repos)
    ]


def corpus_index_space(n_repos: int, files_per_repo: int,
                       skew_factor: int, include_edges: bool):
    """THE global file-index space: (bounds, n_files, total) where
    bounds = [(start, end, repo)] over generated files and the planted
    edge-case rows occupy the tail indices [n_files, total). One
    definition shared by :func:`make_corpus_spark` and the
    ``cosmos_corpus`` DataSource (sources/corpus_source.py) so their
    rows can never drift apart."""
    bounds, off = [], 0
    for repo, n in _repo_spec(n_repos, files_per_repo, skew_factor):
        bounds.append((off, off + n, repo))
        off += n
    n_edges = len(_edge_rows()) if include_edges else 0
    return bounds, off, off + n_edges


def corpus_row_at(seed: int, bounds, starts, n_files: int, edges,
                  gidx: int) -> dict:
    """The row at global index ``gidx`` (sha stamped) — pure function
    of (seed, index); ``starts``/``edges`` are precomputed by the
    caller (``[b[0] for b in bounds]`` / ``_edge_rows()``)."""
    import bisect
    if gidx >= n_files:
        row = dict(edges[gidx - n_files])
    else:
        i = bisect.bisect_right(starts, gidx) - 1
        lo, _hi, repo = bounds[i]
        row = _file_row(seed, repo, int(gidx) - lo)
    row.setdefault("content_sha256", _sha(row["content"]))
    return row


def make_corpus(
    n_repos: int = 10,
    files_per_repo: int = 20,
    skew_factor: int = 20,
    seed: int = 42,
    include_edges: bool = True,
) -> pd.DataFrame:
    """Driver-side pandas corpus (test scale)."""
    rows: list[dict] = []
    for repo, nfiles in _repo_spec(n_repos, files_per_repo, skew_factor):
        for f in range(nfiles):
            rows.append(_file_row(seed, repo, f))
    if include_edges:
        rows.extend(_edge_rows())
    df = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    df["content_sha256"] = df["content"].map(_sha)
    return df


def make_corpus_spark(
    spark,
    n_repos: int = 10,
    files_per_repo: int = 2000,
    skew_factor: int = 20,
    seed: int = 42,
    include_edges: bool = True,
    partitions: int | None = None,
):
    """Executor-side corpus: ``spark.range`` over the global file index,
    content synthesized in mapInPandas — identical rows to
    :func:`make_corpus` (same per-file seed), any scale, no driver
    bottleneck."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    # the ONE index-space definition (shared with the cosmos_corpus
    # DataSource); edge rows here ride as a separate union arm, so the
    # generated range covers only the file indices
    bounds, total, _with_edges = corpus_index_space(
        n_repos, files_per_repo, skew_factor, include_edges=False)

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
    ])

    def gen(it):
        starts = [b[0] for b in bounds]
        for pdf in it:
            rows = [corpus_row_at(seed, bounds, starts, total, [], gidx)
                    for gidx in pdf["id"]]
            yield pd.DataFrame(rows, columns=schema.fieldNames())

    nparts = partitions or max(spark.sparkContext.defaultParallelism * 2, 8)
    base = spark.range(0, total, 1, nparts).mapInPandas(gen, schema)
    if include_edges:
        edges = pd.DataFrame(_edge_rows(),
                             columns=["repo", "path", "commit", "lang",
                                      "content"])
        edges["content_sha256"] = edges["content"].map(_sha)
        base = base.unionByName(spark.createDataFrame(edges, schema=schema))
    return base


def corpus_to_spark(spark, pdf: pd.DataFrame, partitions: int | None = None):
    """Parallelize a pandas corpus; repartition by (repo, path) so per-file
    group ops never land the skewed repo on one task."""
    sdf = spark.createDataFrame(pdf)
    if partitions:
        sdf = sdf.repartition(partitions, "repo", "path")
    return sdf
