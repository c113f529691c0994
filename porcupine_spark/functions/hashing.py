"""Shared 60-bit md5 hashing idioms.

Every sketch/dedup operator in this repo that needs a uniform integer
hash uses the same construction: the first 15 hex chars of md5 parsed
as a 60-bit non-negative long — exactly mirrorable in DuckDB as
CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT), so both engines
agree bit-for-bit. These helpers single-source the Spark side; a
one-character drift between copies would only surface as an oracle
value mismatch, so there must be exactly one copy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long60(col: Column | str) -> Column:
    """60-bit integer hash: first 15 md5 hex chars as a long."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_bucket(col: Column | str, salt: str, mod: int) -> Column:
    """Salted bucket index in [0, mod): md5_long60(salt || col) % mod.

    The salt string selects an independent hash function (the d rows
    of a Count-Min array, the k probes of a Bloom filter)."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long60(F.concat(F.lit(salt), c)) % mod
