"""Query plans: the engine's exercised operator surface.

Each module registers ``QuerySpec`` entries (Spark builder + DuckDB
oracle SQL) into ``registry.REGISTRY``; ``__spark_entry__.py`` exposes
them to the driver's correctness harness.
"""

from porcupine_spark.plans.registry import REGISTRY, QuerySpec, query

__all__ = ["REGISTRY", "QuerySpec", "query"]
