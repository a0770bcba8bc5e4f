"""Basic-graph-pattern matching over the materialized triple relation —
the declarative KG query surface (the SPARQL-BGP analog of the
reference's hand-written retrieval joins, e.g. the entity->children
object resolution in `/root/reference/cosmos/retrieval/
elastic_retriever.py:239-258`, each of which is one fixed
two-pattern instance of this general operator).

A pattern is a (subj, pred, obj) term triple; a term starting with
``?`` is a variable, anything else an equality constant. The match is
the natural join of the per-pattern bindings on shared variables —
expressed as plain DataFrame filters + equi-joins so Catalyst gets the
whole plan: constants become pushed-down scan filters (and, on the
catalog's pred-partitioned triples table, partition pruning), AQE picks
per-join strategies/sides at runtime, and bag semantics are preserved
(no implicit DISTINCT — SPARQL BGP is a bag algebra).

Scale notes: each pattern is one filtered scan of the triples relation;
patterns sharing no variable with what came before multiply bindings
(a genuine cross product — that is BGP semantics, guarded by
``allow_product=False`` by default). Join ORDER is the caller's
selectivity knob: list the most selective patterns first, exactly like
ordering a SPARQL WHERE clause."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_POS = ("subj", "pred", "obj")


def match_pattern(triples: DataFrame,
                  patterns: list[tuple[str, str, str]],
                  select: list[str] | None = None,
                  allow_product: bool = False) -> DataFrame:
    """Match a basic graph pattern against a (subj, pred, obj) relation.

    Returns one row per binding of the pattern's variables; columns are
    the variable names without the ``?`` prefix, in first-appearance
    order (or ``select``'s order/subset). A variable repeated WITHIN one
    pattern constrains that pattern's row to equal values; repeated
    ACROSS patterns becomes the join key. Raises on a pattern with no
    variables (use a filter) and, unless ``allow_product=True``, on a
    pattern disconnected from every earlier one (accidental cross
    products at triple-store scale are outages, not queries)."""
    if not patterns:
        raise ValueError("patterns must be non-empty")
    bound: DataFrame | None = None
    seen_vars: list[str] = []
    for idx, pat in enumerate(patterns):
        if len(pat) != 3:
            raise ValueError(f"pattern {idx} is not a term triple: {pat!r}")
        arm = triples
        var_of: dict[str, str] = {}  # position -> variable name
        for pos, term in zip(_POS, pat):
            if isinstance(term, str) and term.startswith("?"):
                name = term[1:]
                if not name:
                    raise ValueError(f"pattern {idx}: bare '?' term")
                if name in var_of.values():
                    # repeated var inside one pattern: equality filter
                    prev = next(p for p, v in var_of.items() if v == name)
                    arm = arm.filter(F.col(pos) == F.col(prev))
                else:
                    var_of[pos] = name
            else:
                arm = arm.filter(F.col(pos) == F.lit(term))
        if not var_of:
            raise ValueError(
                f"pattern {idx} binds no variables — express pure "
                f"existence checks as a semi-join/filter instead")
        arm = arm.select(*(F.col(p).alias(v) for p, v in var_of.items()))
        if bound is None:
            bound = arm
            seen_vars = list(var_of.values())
            continue
        shared = [v for v in var_of.values() if v in seen_vars]
        if not shared and not allow_product:
            raise ValueError(
                f"pattern {idx} shares no variable with the patterns "
                f"before it (cross product); reorder the pattern list "
                f"or pass allow_product=True")
        bound = (bound.crossJoin(arm) if not shared
                 else bound.join(arm, shared))
        seen_vars += [v for v in var_of.values() if v not in seen_vars]
    assert bound is not None
    return bound.select(*(select or seen_vars))
