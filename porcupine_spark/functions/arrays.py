"""Array helpers used by shingling/fingerprinting operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def seq1(n: Column) -> Column:
    """``[1..n]``, EMPTY when ``n <= 0``.

    Spark's ``sequence(1, 0)`` yields a *descending* ``[1, 0]`` (it
    infers step -1), unlike SQL GENERATE_SERIES which is empty — this
    helper restores the empty-range semantics the oracles assume.
    """
    return F.slice(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        F.lit(1),
        F.greatest(n, F.lit(0)),
    )
