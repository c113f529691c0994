"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on by default in session.py) handles most
cases at runtime; explicit salting remains necessary for (a) skewed
AGGREGATIONS (AQE does not split those) and (b) joins where one key
dwarfs the rest and even split partitions thrash. Both helpers keep
results exactly equal to their unsalted equivalents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (keys + random salt) — hot keys spread over ``n_salts`` reducers —
    phase 2 merges the partials on the true keys.

    ``aggs`` are the phase-1 partials (aliased), ``final_aggs`` the
    phase-2 merges over those aliases (e.g. sum of partial counts).
    Exactness: partial/final pairs must be associative decompositions
    (count->sum, sum->sum, min->min, max->max, decimal-sum->decimal-sum).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side's key, replicate the small
    side across all salts, join on (key, salt). Hot keys of ``big``
    spread over ``n_salts`` tasks; ``small`` grows n_salts-fold (only
    viable when small is near-broadcastable). Result == plain join."""
    big_s = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
