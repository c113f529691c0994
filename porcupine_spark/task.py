"""Composable tasks with *statically accumulated* requirements.

The reference's ``PTask`` is an arrow that writes its resource
requirements into a ``VirtualTree`` while composing (PTask/Internal.hs:
113-119) and deliberately has no ArrowChoice so the requirement set is
known before execution (:120-130). Here a ``Task`` carries (a) the set
of dataset names it may read/write and (b) a runner ``(RunCtx, input)
-> output``; composition (``>>`` / ``then_``, ``both``, ``fanout``)
unions requirements — a data-dependent resource acquisition is
impossible to express, exactly as in the reference.

The runner manipulates lazy DataFrames: "running" a pipeline builds
Spark plans; only terminal writes/collects trigger execution (the
reference's dead-sink pruning becomes Spark laziness + the explicit
unmapped-sink skip in BoundCatalog.write).
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from porcupine_spark.catalog import BoundCatalog

logger = logging.getLogger("porcupine_spark")


@dataclass
class RunCtx:
    """The reader environment (PTaskState analog, PTask/Internal.hs:84-88):
    session + bound catalog + logging namespace + repetition variables."""

    spark: SparkSession
    bound: BoundCatalog
    namespace: tuple[str, ...] = ()
    variables: dict[str, Any] = field(default_factory=dict)
    cache: Any = None  # optional cache.CacheStore

    def scoped(self, name: str) -> "RunCtx":
        return RunCtx(
            self.spark, self.bound, (*self.namespace, name), dict(self.variables), self.cache
        )

    def with_vars(self, **vs) -> "RunCtx":
        return RunCtx(
            self.spark, self.bound, self.namespace, {**self.variables, **vs}, self.cache
        )


@dataclass(frozen=True)
class Task:
    """An arrow from input to output with static requirements."""

    run: Callable[[RunCtx, Any], Any]
    reads: frozenset = frozenset()
    writes: frozenset = frozenset()
    name: str = ""

    @property
    def requirements(self) -> frozenset:
        return self.reads | self.writes

    # ---- composition (Category/Arrow instances) ----
    def then_(self, other: "Task") -> "Task":
        """(>>>): sequential composition; requirements union."""
        def runner(ctx: RunCtx, x):
            return other.run(ctx, self.run(ctx, x))

        return Task(
            runner,
            self.reads | other.reads,
            self.writes | other.writes,
            name=f"{self.name}>>{other.name}",
        )

    __rshift__ = then_

    def both(self, other: "Task") -> "Task":
        """(***): pairwise parallel — ((a,b)) -> (c,d)."""
        def runner(ctx: RunCtx, pair):
            a, b = pair
            return (self.run(ctx, a), other.run(ctx, b))

        return Task(runner, self.reads | other.reads, self.writes | other.writes,
                    name=f"({self.name}***{other.name})")

    def fanout(self, other: "Task") -> "Task":
        """(&&&): same input to both — a -> (c,d)."""
        def runner(ctx: RunCtx, x):
            return (self.run(ctx, x), other.run(ctx, x))

        return Task(runner, self.reads | other.reads, self.writes | other.writes,
                    name=f"({self.name}&&&{other.name})")

    def named(self, name: str) -> "Task":
        """nameTask (PTask.hs:129-207): log duration under a namespace."""
        def runner(ctx: RunCtx, x):
            scoped = ctx.scoped(name)
            t0 = time.perf_counter()
            out = self.run(scoped, x)
            logger.info(
                "Finished task '%s' in %.3fs", ".".join(scoped.namespace),
                time.perf_counter() - t0,
            )
            return out

        return Task(runner, self.reads, self.writes, name=name)

    def in_subtree(self, prefix: str) -> "Task":
        """taskInSubtree (PTask.hs:214-219): re-root requirements under a
        namespace prefix; dataset accesses inside resolve with it too."""
        def runner(ctx: RunCtx, x):
            # the bound catalog is looked up with prefixed names by the
            # load/write tasks below via ctx.variables['__prefix']
            sub = ctx.with_vars(__prefix=f"{prefix}/{ctx.variables.get('__prefix', '')}".strip("/"))
            return self.run(sub, x)

        return Task(
            runner,
            frozenset(f"{prefix}/{r}" for r in self.reads),
            frozenset(f"{prefix}/{w}" for w in self.writes),
            name=self.name,
        )


def _resolve(ctx: RunCtx, name: str) -> str:
    prefix = ctx.variables.get("__prefix", "")
    return f"{prefix}/{name}" if prefix else name


def arr(f: Callable[[Any], Any], name: str = "arr") -> Task:
    """Lift a pure function (Arrow ``arr``)."""
    return Task(lambda ctx, x: f(x), name=name)


def io_task(f: Callable[[RunCtx, Any], Any], name: str = "io") -> Task:
    """toTask/ioTask (PTask.hs:100-109,62-64): effectful driver-side step."""
    return Task(f, name=name)


def load(name: str) -> Task:
    """loadData (VirtualFileAccess.hs:73-83): () -> DataFrame."""
    return Task(
        lambda ctx, _:
            ctx.bound.read(ctx.spark, _resolve(ctx, name), variables=ctx.variables),
        reads=frozenset({name}),
        name=f"load:{name}",
    )


def load_merged(name: str, key: str) -> Task:
    """loadData with keyed layered merge (§1.4)."""
    return Task(
        lambda ctx, _:
            ctx.bound.read_merged(ctx.spark, _resolve(ctx, name), key, variables=ctx.variables),
        reads=frozenset({name}),
        name=f"load_merged:{name}",
    )


def write(name: str, mode: str = "overwrite") -> Task:
    """writeData (VirtualFileAccess.hs:126-136): DataFrame -> list[path]."""
    return Task(
        lambda ctx, df:
            ctx.bound.write(df, _resolve(ctx, name), mode=mode, variables=ctx.variables),
        writes=frozenset({name}),
        name=f"write:{name}",
    )


def write_eff(name: str, thunk_producer: Callable[[RunCtx], Any], mode: str = "overwrite") -> Task:
    """writeEffData (VirtualFileAccess.hs:141-148): skip *computing* the
    value when the sink is unmapped."""
    def runner(ctx: RunCtx, _):
        resolved = _resolve(ctx, name)
        if not ctx.bound.is_mapped(resolved):
            return []
        return ctx.bound.write(thunk_producer(ctx), resolved, mode=mode, variables=ctx.variables)

    return Task(runner, writes=frozenset({name}), name=f"write_eff:{name}")


def void() -> Task:
    """voidTask = arr (const ()) (PTask.hs:59-60)."""
    return arr(lambda _: None, name="void")


def cached(
    task: "Task",
    ident: str,
    params=None,
    name: str = "",
) -> "Task":
    """toTask' with cache Properties (PTask.hs:107-109; Caching.hs:52-122):
    wrap a DataFrame-producing task so its result is checkpointed in
    the content-addressed store. Key = (ident, params, resolved
    locations of every dataset the task reads) — re-binding an input
    re-triggers the step (PorcupineTree.hs:118-129). No-op (straight
    compute) when the run has no cache configured."""

    def runner(ctx: RunCtx, x):
        if ctx.cache is None:
            return task.run(ctx, x)
        locs: list[str] = []
        for ds_name in sorted(task.reads):
            ds_locs = ctx.bound.locations(ds_name)
            locs.extend(loc.path for loc in (ds_locs or []))
        return ctx.cache.cached(
            ident, params, locs, lambda: task.run(ctx, x)
        )

    return Task(runner, task.reads, task.writes, name=name or f"cached:{task.name}")
