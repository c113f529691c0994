"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` / ``oracle_sql()`` expose every registered QuerySpec from
``porcupine_spark.plans.registry`` (one per implemented operator from
SURVEY.md §2 plus the large-scale curation operators).

Ordering: plain registration order (module import order, then source
order) — no curation.  Every query, not just a sampled subset, is
additionally verified in-repo by ``tools/verify_oracles.py`` (full
sweep) and ``tests/test_oracles.py`` (per-run representative subset).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from porcupine_spark.plans.registry import load_all_plans

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = load_all_plans()
    return specs["q1_pricing_summary"].builder(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in load_all_plans().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in load_all_plans().items()
        if spec.oracle is not None
    }
