"""Single-node pandas oracle for the KG pipeline.

Runs the identical kernels (:mod:`cosmos_spark.kernels`) over the whole
corpus in one process, plus straightforward single-node implementations of
linking (top-1 candidate, 0.8 threshold — `link.py:26-33` semantics),
canonicalization (union-find connected components — the scale analog of
`link.py:113` ``drop_duplicates``) and triple emission. pytest compares the
distributed pipeline's triples against this oracle at P/R >= 0.95
(the north-rule analog of count equality + AP > 0.9,
`cosmos_service/src/healthcheck/annotation_metrics.py:10-11`).
"""

from __future__ import annotations

import pandas as pd

from . import kernels as K

TRIPLE_COLUMNS = ["subj", "pred", "obj", "repo", "score", "provenance"]


def build_entities_and_aliases(mentions: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Entities from def mentions; alias table with exact + fuzzy keys."""
    defs = mentions[mentions["mention_kind"] == "def"].copy()
    defs["norm"] = K.alias_norm(defs["mention_text"])
    defs = defs[defs["norm"] != ""]

    spellings = (
        defs.groupby("norm")["mention_text"]
        .agg(lambda x: sorted(set(x)))
        .reset_index()
        .rename(columns={"mention_text": "aliases"})
    )
    entities = spellings.copy()
    entities["entity_id"] = K.entity_id_for(entities["norm"])
    entities["canonical_name"] = entities["norm"]
    entities["types"] = [["def"]] * len(entities)
    entities = entities[["entity_id", "canonical_name", "aliases", "types"]]

    norms = spellings[["norm"]].copy()
    norms["entity_id"] = K.entity_id_for(norms["norm"])
    norms["canonical_name"] = norms["norm"]
    exact = norms.rename(columns={"norm": "alias_key"})
    exact["alias_kind"] = "exact"
    fuzzy = norms.copy()
    fuzzy["alias_key"] = K.defuzz(fuzzy["norm"])
    fuzzy = fuzzy[fuzzy["alias_key"] != fuzzy["norm"]].drop(columns=["norm"])
    fuzzy["alias_kind"] = "fuzzy"
    aliases = pd.concat(
        [exact[["alias_key", "entity_id", "canonical_name", "alias_kind"]],
         fuzzy[["alias_key", "entity_id", "canonical_name", "alias_kind"]]],
        ignore_index=True,
    ).drop_duplicates(["alias_key", "entity_id"])
    return entities, aliases


def link_mentions(mentions: pd.DataFrame, aliases: pd.DataFrame) -> pd.DataFrame:
    """Candidate join + trigram-jaccard scoring + top-1 + 0.8 acceptance."""
    cand_src = mentions[mentions["mention_kind"].isin(["call", "import", "ref"])].copy()
    cand_src["alias_key"] = K.alias_norm(K.basename(cand_src["mention_text"]))
    cands = cand_src.merge(aliases, on="alias_key", how="inner")
    if cands.empty:
        return pd.DataFrame(columns=["mention_id", "entity_id", "score", "linked"])
    cands["link_score"] = K.trigram_jaccard(cands["alias_key"], cands["canonical_name"])
    cands = cands.sort_values(
        ["mention_id", "link_score", "entity_id"],
        ascending=[True, False, True],
    )
    top = cands.drop_duplicates("mention_id", keep="first").copy()
    top["linked"] = top["link_score"] > K.LINK_THRESHOLD
    return top[["mention_id", "entity_id", "link_score", "linked"]].rename(
        columns={"link_score": "score"}).reset_index(drop=True)


def _oracle_trigrams(s: str) -> set:
    # deliberately re-implemented here (not kernels._trigrams): the oracle
    # must be independent of the pipeline's similarity/blocking code so a
    # blocking recall bug cannot hide behind a shared kernel (VERDICT r1 #4)
    if len(s) < 3:
        return {s} if s else set()
    return {s[i:i + 3] for i in range(len(s) - 2)}


def canonicalize(entities: pd.DataFrame) -> pd.DataFrame:
    """Independent exhaustive all-pairs union-find — NO blocking.

    Every pair of entity names is scored (char-trigram Jaccard >= 0.7 =>
    edge); components via union-find; representative = min
    (canonical_name, entity_id). O(n^2) — test-scale recall oracle for the
    pipeline's MinHash-band blocked CC."""
    ids = entities["entity_id"].tolist()
    names = entities["canonical_name"].tolist()
    n = len(ids)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    grams = [_oracle_trigrams(nm) for nm in names]
    for i in range(n):
        for j in range(i + 1, n):
            u = len(grams[i] | grams[j])
            sim = (len(grams[i] & grams[j]) / u) if u else 1.0
            if sim >= 0.7:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    comp: dict[int, int] = {}
    for i in range(n):
        r = find(i)
        best = comp.get(r)
        if best is None or (names[i], ids[i]) < (names[best], ids[best]):
            comp[r] = i
    canon = pd.DataFrame({
        "entity_id": ids,
        "canonical_id": [ids[comp[find(i)]] for i in range(n)],
    })
    return entities.merge(canon, on="entity_id", how="left")


_PRED_FOR_KIND = {"def": "defines", "import": "imports", "call": "calls"}


def emit_triples(
    segments: pd.DataFrame,
    mentions: pd.DataFrame,
    links: pd.DataFrame,
    entities_canon: pd.DataFrame,
    provenance: str = "oracle@0:0",
) -> pd.DataFrame:
    m = mentions.copy()
    m["subj"] = m["repo"] + "/" + m["path"] + "#" + m["seg_id"]

    base = m[m["mention_kind"].isin(_PRED_FOR_KIND)].copy()
    base["pred"] = base["mention_kind"].map(_PRED_FOR_KIND)
    base = base.rename(columns={"mention_text": "obj"})[
        ["subj", "pred", "obj", "repo", "score"]]

    linked = links[links["linked"]].merge(
        m[["mention_id", "subj", "repo"]], on="mention_id")
    ment = linked.rename(columns={"entity_id": "obj"})
    ment["pred"] = "mentions"
    ment = ment[["subj", "pred", "obj", "repo", "score"]]

    member = segments[["repo", "path", "seg_id"]].copy()
    member["subj"] = member["repo"] + "/" + member["path"] + "#" + member["seg_id"]
    member = member.drop_duplicates("subj")
    member["pred"] = "member_of"
    member["obj"] = member["repo"] + "/" + member["path"]
    member["score"] = 1.0
    member = member[["subj", "pred", "obj", "repo", "score"]]

    same = entities_canon[
        entities_canon["entity_id"] != entities_canon["canonical_id"]].copy()
    same = same.rename(columns={"entity_id": "subj", "canonical_id": "obj"})
    same["pred"] = "same_as"
    same["repo"] = "*"
    same["score"] = 1.0
    same = same[["subj", "pred", "obj", "repo", "score"]]

    t = pd.concat([base, ment, member, same], ignore_index=True)
    t = (
        t.sort_values(["subj", "pred", "obj", "score"], ascending=[True, True, True, False])
        .drop_duplicates(["subj", "pred", "obj"], keep="first")
        .reset_index(drop=True)
    )
    t["provenance"] = provenance
    return t[TRIPLE_COLUMNS]


def run_oracle(source: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Full single-node pipeline: source -> segments -> mentions -> links ->
    entities(+canon) -> triples."""
    segments = K.segment_kernel(source)
    mentions = K.mention_kernel(segments)
    entities, aliases = build_entities_and_aliases(mentions)
    links = link_mentions(mentions, aliases)
    entities_canon = canonicalize(entities)
    triples = emit_triples(segments, mentions, links, entities_canon)
    return {
        "segments": segments,
        "mentions": mentions,
        "entities": entities_canon,
        "aliases": aliases,
        "links": links,
        "triples": triples,
    }
