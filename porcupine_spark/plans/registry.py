"""Registry of (Spark query, DuckDB oracle) pairs.

Every operator the engine claims from SURVEY.md §2 registers here: the
Spark-side builder takes ``(spark, sf_dir)`` and returns a DataFrame;
the oracle is equivalent ANSI SQL DuckDB runs on the same parquet
tables. Column names are aliased identically on both sides (the
harness sorts columns by name before hashing values).

Oracle-less specs (``oracle=None``) are genuinely non-SQL-expressible
(custom stateful streaming, iterative algorithms) and get a weaker
rows-only check from the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register a builder under ``name`` with its oracle SQL."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags
        )
        return fn

    return deco


def load_all_plans() -> dict[str, QuerySpec]:
    """Import every plan module so its @query decorators run; return the
    registry in plain registration order (module import order, then
    source order within a module) — no curation of exposure order."""
    # Imports are effectful (registration); keep them in one place so the
    # driver entry file and the tests see an identical registry.
    from porcupine_spark.plans import joins_extra, relational, tpch_extra  # noqa: F401
    from porcupine_spark.operators import (  # noqa: F401
        asof,
        components,
        corpus,
        curation,
        dedup,
        linalg,
        sessionize,
        similarity,
        sketches,
        text,
        multimodal,
        orderstats,
        quality,
        quantization,
        segments,
        upsert,
        vocabstats,
    )
    from porcupine_spark.streaming import enrich, joins, stateful, windows  # noqa: F401

    return dict(REGISTRY)
