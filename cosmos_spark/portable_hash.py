"""THE engine-portable 60-bit hash — one definition, four surfaces.

``h60(x) = first 15 hex chars of md5(x), as an integer``: 60 bits is
always positive in a Spark BIGINT, a DuckDB UBIGINT→BIGINT, and a
numpy int64, so unsigned/signed ordering games never arise (the trick
plans/lineage.py introduced). Every sketch, sampler, and oracle that
claims bit-exactness across engines routes through these helpers; the
DuckDB side of the contract is the fragment

    ('0x' || substr(md5(x), 1, 15))::UBIGINT      -- (::BIGINT safe)

and the three producer surfaces below are pinned equal to it by the
value-exact driver oracles. Keeping them in ONE module is the point:
the substring length, the >>4 shift, and the salt framing are
load-bearing in every consumer, and an edit here breaks every oracle
at once (loudly) instead of one query at a time.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column

HASH_BITS = 60
HASH_SPACE = float(2**HASH_BITS)


def hash60(col, salt: str | None = None) -> Column:
    """Column form. ``salt`` prefixes the value with ``salt + '|'``
    (after a cast to string), giving an independent hash family per
    salt — DuckDB mirror: ``md5('<salt>|' || x)``."""
    x = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        x = F.concat(F.lit(salt + "|"), x.cast("string"))
    return (F.conv(F.substring(F.md5(x), 1, 15), 16, 10)
            .cast("long"))


def hash60_sql(expr: str) -> str:
    """Spark-SQL-string form, for expression-string builders."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def hash60_py(value: str) -> int:
    """Python/numpy-kernel form: first 15 hex chars = the digest's top
    60 bits (8 bytes big-endian >> 4)."""
    return int.from_bytes(
        hashlib.md5(value.encode()).digest()[:8], "big") >> 4
