"""Explicit skew handling for shuffle joins: key salting.

The north-star scenario is a monorepo with millions of files: any
shuffle join keyed on ``repo`` funnels that repo's entire probe side
through ONE reducer task, and the stage runs as slowly as its hottest
key regardless of cluster size. Spark's own mitigations cover two
regimes — ``broadcast()`` when the build side fits an executor, and
AQE skew-join splitting (``spark.sql.adaptive.skewJoin``) which
re-plans oversized SortMergeJoin partitions at runtime. This operator
covers the third: a *deterministic, plan-time* rewrite for when the
build side is too big to broadcast and the job can't rely on AQE
(e.g. AQE disabled, or the skew is known up front and re-planning
mid-stage is wasted work).

``salted_join(big, small, on, n_salt)`` rewrites

    big ⋈_k small   →   (big + salt(row))  ⋈_{k, salt}  (small × salts)

Every big row gets ONE salt (a pure function of a caller-chosen
column, ``portable_hash.hash60`` mod n — deterministic across runs and
engines); every small row is replicated to ALL n salts. Each big row
therefore meets exactly the same small rows as before — result
equality is an identity, not an approximation (pinned by parity test
and a value-exact driver oracle, q_salted_join) — while the hot key's
probe rows spread across n_salt reducers. Cost model: the build side
is shuffled n_salt× larger, so pick ``n_salt ≈ (hot-key rows) /
(target partition rows)`` and keep ``n_salt × |small|`` well under the
shuffle volume the skew was costing; the salt column prunes nothing,
so this is strictly a parallelism trade.

Join types: ``inner`` and ``left`` (probe-side preserved) only. Right/
full/semi/anti on the REPLICATED side would see each small row once
per salt and duplicate or mis-count — refused loudly.

For skewed *aggregations* no operator is needed: Spark's partial
(map-side) aggregation already collapses hot groups before the
shuffle, and count(DISTINCT) is planner-rewritten into the two-stage
spread. Salting is for joins, where no partial step exists.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..portable_hash import hash60

SALT_COL = "__skew_salt"


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                salt_on, n_salt: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on columns ``on``, with the big
    (probe) side salted into ``n_salt`` sub-keys and the small (build)
    side replicated across them. ``salt_on`` is a big-side column (or
    Column) whose hash spreads the hot key — any roughly-uniform,
    non-constant column works; a row id is ideal (null salt values
    hash to salt 0, so nullable columns still join correctly — they
    just don't spread). Result is column-for-column identical to
    ``big.join(small, on, how)``."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join preserves the probe side only (inner/left); "
            f"got {how!r} — a {how} join would see the replicated "
            f"build side once per salt")
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    for side, df in (("big", big), ("small", small)):
        if SALT_COL in df.columns:
            raise ValueError(
                f"{side} side already has a {SALT_COL!r} column — "
                f"rename it; salted_join would overwrite and drop it")
    sc = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    b = big.withColumn(SALT_COL,
                       F.pmod(F.coalesce(hash60(sc, salt="skew"),
                                         F.lit(0)),
                              F.lit(n_salt)).cast("int"))
    s = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return b.join(s, on=[*on, SALT_COL], how=how).drop(SALT_COL)
