"""Deterministic synthetic source-code corpus.

The test-input analog of the reference's golden-fixture PDFs
(`cosmos_service/test/resources/pdfs/bucky.pdf` + hand-annotated XML,
`cosmos_service/test/src/annotations/annotations_base.py:16-133`): a known
input whose expected segments / mentions / triples are enumerable by
construction. Seeded, no wall-clock, no uuids.

Shape is exactly the BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``
plus the derived per-row invariant ``content_sha256``.

Fixtures planted (FIXTURES.md §1, §3):

- one skewed "monorepo" with ``skew_factor`` x the median file count
  (exercises salting / AQE skew handling);
- an empty file (zero segments, no crash);
- a file with no blank-line separators (single segment);
- unicode-ligature rows (normalize_text analog,
  `cosmos/ingestion/ingest/utils/normalize_text.py:19-28`);
- duplicate content across two repos (same sha256, distinct (repo,path) —
  dedup must NOT collapse source rows);
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
    return (
        f"# Notes {fidx}\n\n"
        f"This doc mentions {stem} and the ﬁle format.\n\n"
        f"- item one\n- item two\n"
    )


def make_corpus(
    n_repos: int = 10,
    files_per_repo: int = 20,
    skew_factor: int = 20,
    seed: int = 42,
) -> pd.DataFrame:
    """Build the corpus as a pandas DataFrame (driver-side, then parallelize).

    ``repo_00`` is the skewed monorepo with ``skew_factor * files_per_repo``
    files; all other repos get ``files_per_repo``.
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    for r in range(n_repos):
        repo = f"org{r % 3}/repo_{r:02d}"
        nfiles = files_per_repo * (skew_factor if r == 0 else 1)
        for f in range(nfiles):
            lang = LANGS[f % len(LANGS)]
            ext = {"python": "py", "java": "java", "md": "md"}[lang]
            path = f"src/m{f % 10}/f_{f:04d}.{ext}"
            if lang == "python":
                content = _py_file(rng, repo, f)
            elif lang == "java":
                content = _java_file(rng, repo, f)
            else:
                content = _md_file(rng, repo, f)
            rows.append(
                {"repo": repo, "path": path, "commit": _commit_for(repo, path),
                 "lang": lang, "content": content}
            )

    # --- edge fixtures (FIXTURES.md §3) ---
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
    ]
    # duplicate content across two repos: same sha256, distinct (repo, path)
    dup_content = "import json\n\ndef load_config(p):\n    return json.loads(p)\n"
    edge.append({"repo": "org1/dup_a", "path": "dup.py", "lang": "python",
                 "content": dup_content})
    edge.append({"repo": "org2/dup_b", "path": "same/dup.py", "lang": "python",
                 "content": dup_content})
    for e in edge:
        e["commit"] = _commit_for(e["repo"], e["path"])
        rows.append(e)

    df = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    df["content_sha256"] = df["content"].map(_sha)
    return df


def corpus_to_spark(spark, pdf: pd.DataFrame, partitions: int | None = None):
    """Parallelize the corpus; repartition by (repo, path) so per-file group
    ops never shuffle the skewed repo onto one task."""
    sdf = spark.createDataFrame(pdf)
    if partitions:
        sdf = sdf.repartition(partitions, "repo", "path")
    return sdf
