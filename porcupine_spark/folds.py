"""The fold/aggregation layer — ``FoldA`` re-expressed for Catalyst.

Reference: ``FoldA arr i a b`` = (step, start, done)
(porcupine-core/src/Control/Arrow/FoldA.hs:87-91) with Applicative
composition running several folds in ONE pass (:118-130). That shape
is exactly a Spark aggregate expression; applicative combination is
``df.agg(e1, e2, ...)`` — one shuffle, one pass, map-side partials
free. So a ``Fold`` here wraps a Column expression plus pre-transform
hooks, and ``done`` is a post-projection:

- ``premap``   ≙ premapA/lmap    (FoldA.hs:146-150,132-137)
- ``prefilter``≙ prefilterA      (FoldA.hs:159-169)
- ``postmap``  ≙ postmapA/fmap   (FoldA.hs:153-157,112-116)
- ``Fold.zip`` ≙ Applicative <*> (FoldA.hs:118-130)

``run_fold`` ≙ foldlTask/foldStreamTask (Repetition/Foldl.hs:104-129);
``run_fold_grouped`` ≙ parMapTask+fold. Custom step logic that isn't
expressible as a Column (the ``arrowFold`` escape hatch, FoldA.hs:
172-189) compiles to applyInPandas via ``pandas_fold``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field, replace

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Fold:
    """One or more aggregate expressions evaluated in a single pass.

    ``make_exprs``/``init_map`` carry the reference's parameterized
    accumulator initialization (FoldA's ``i`` parameter + premapInitA,
    FoldA.hs:140-144): a fold may build its aggregate expressions from
    an init value supplied at run time; ``premap_init`` pre-composes a
    transform of that value. Plain folds (init-independent) keep
    ``exprs`` static and ignore init entirely.
    """

    exprs: tuple[Column, ...]
    names: tuple[str, ...]
    pre: Callable[[DataFrame], DataFrame] | None = None
    post: Callable[[DataFrame], DataFrame] | None = None
    make_exprs: Callable[..., tuple[Column, ...]] | None = None
    init_map: Callable[..., object] | None = None

    @staticmethod
    def of(expr: Column, name: str) -> "Fold":
        return Fold((expr.alias(name),), (name,))

    @staticmethod
    def with_init(make_exprs: Callable[..., tuple[Column, ...]], names: tuple[str, ...]) -> "Fold":
        """FoldA with a parameterized accumulator init: ``make_exprs(
        init)`` builds the aggregate expressions when the init value is
        known (run_fold's ``init=``)."""
        return Fold((), tuple(names), make_exprs=make_exprs)

    def premap_init(self, f: Callable[..., object]) -> "Fold":
        """premapInitA (FoldA.hs:140-144): map the init value before it
        reaches the accumulator initializer."""
        prev = self.init_map
        g = f if prev is None else (lambda i: prev(f(i)))
        return replace(self, init_map=g)

    def resolve_exprs(self, init=None) -> tuple[Column, ...]:
        if self.make_exprs is None:
            return self.exprs
        if self.init_map is not None:
            init = self.init_map(init)
        exprs = tuple(self.make_exprs(init))
        return tuple(e.alias(n) for e, n in zip(exprs, self.names))

    # ---- the foldl-library vocabulary (Porcupine/Foldl.hs re-exports) ----
    @staticmethod
    def length(name: str = "length") -> "Fold":
        """L.length ≙ count(*)."""
        return Fold.of(F.count(F.lit(1)), name)

    @staticmethod
    def sum_(col: str | Column, name: str = "sum") -> "Fold":
        return Fold.of(F.sum(col), name)

    @staticmethod
    def mean(col: str | Column, name: str = "mean") -> "Fold":
        return Fold.of(F.avg(col), name)

    @staticmethod
    def min_(col: str | Column, name: str = "min") -> "Fold":
        return Fold.of(F.min(col), name)

    @staticmethod
    def max_(col: str | Column, name: str = "max") -> "Fold":
        return Fold.of(F.max(col), name)

    @staticmethod
    def nub(col: str | Column, name: str = "nub") -> "Fold":
        """L.nub ≙ collect_set (sorted for determinism)."""
        return Fold.of(F.array_sort(F.collect_set(col)), name)

    @staticmethod
    def nub_length(col: str | Column, name: str = "n_distinct") -> "Fold":
        """length . nub ≙ countDistinct (ExampleRadon.hs:76-79 pattern)."""
        return Fold.of(F.countDistinct(col), name)

    @staticmethod
    def approx_nub_length(col: str | Column, name: str = "approx_distinct") -> "Fold":
        """The at-scale variant: HLL sketch instead of exact distinct."""
        return Fold.of(F.approx_count_distinct(col), name)

    @staticmethod
    def list_(col: str | Column, name: str = "list") -> "Fold":
        return Fold.of(F.collect_list(col), name)

    # ---- combinators ----
    def zip(self, other: "Fold") -> "Fold":
        """Applicative <*>: both folds in the same single pass."""
        dup = set(self.names) & set(other.names)
        if dup:
            raise ValueError(f"duplicate fold output names: {sorted(dup)}")
        if (self.pre or other.pre) and self.pre is not other.pre:
            raise ValueError("cannot zip folds with different pre-transforms")
        post = None
        if self.post or other.post:
            p1, p2 = self.post, other.post
            post = (lambda df: (p2 or (lambda d: d))((p1 or (lambda d: d))(df)))
        if self.make_exprs or other.make_exprs:
            # FoldA <*> shares the init across both sides (start =
            # startL &&&& startR, FoldA.hs:122-130); each side applies
            # its own init_map inside resolve_exprs
            a, b = self, other

            def mk(init):
                return a.resolve_exprs(init) + b.resolve_exprs(init)

            return Fold(
                (), self.names + other.names, self.pre or other.pre, post, make_exprs=mk
            )
        return Fold(
            self.exprs + other.exprs, self.names + other.names, self.pre or other.pre, post
        )

    __and__ = zip

    def premap(self, f: Callable[[DataFrame], DataFrame]) -> "Fold":
        prev = self.pre
        g = f if prev is None else (lambda df: prev(f(df)))
        return replace(self, pre=g)

    def prefilter(self, cond: Column) -> "Fold":
        return self.premap(lambda df: df.filter(cond))

    def postmap(self, f: Callable[[DataFrame], DataFrame]) -> "Fold":
        prev = self.post
        g = f if prev is None else (lambda df: f(prev(df)))
        return replace(self, post=g)


def run_fold(df: DataFrame, fold: Fold, init=None) -> DataFrame:
    """foldlTask/foldStreamTask: ungrouped single-row aggregate.
    ``init`` feeds a parameterized-init fold (Fold.with_init)."""
    if fold.pre:
        df = fold.pre(df)
    out = df.agg(*fold.resolve_exprs(init))
    return fold.post(out) if fold.post else out


def run_fold_grouped(df: DataFrame, keys: list[str], fold: Fold, init=None) -> DataFrame:
    """parMapTask + fold: per-index fold = groupBy(idx).agg(...) — the
    repetition index becomes the grouping key (SURVEY §2.7)."""
    if fold.pre:
        df = fold.pre(df)
    out = df.groupBy(*keys).agg(*fold.resolve_exprs(init))
    return fold.post(out) if fold.post else out


def pandas_fold(
    df: DataFrame,
    keys: list[str],
    step: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
) -> DataFrame:
    """arrowFold escape hatch (FoldA.hs:172-189): a fold whose step is
    arbitrary Python, compiled to one applyInPandas per group. Use only
    when the step is genuinely not a Column expression."""
    return df.groupBy(*keys).applyInPandas(step, schema=output_schema)
