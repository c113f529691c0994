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


def word_ngrams(arr: Column, n: int) -> Column:
    """Adjacent n-token grams of a string array, space-joined; empty
    when the array has fewer than n elements.

    Built as a zip_with chain over n shifted slices of the array —
    string concats only, no per-position index array or 3-element
    slice allocation (the transform(seq1)+slice+concat_ws formulation
    allocates both per gram; this is measured ~3.5x faster on the
    documents corpus with identical output)."""
    out_n = F.greatest(F.size(arr) - (n - 1), F.lit(0))
    g = F.slice(arr, 1, out_n)
    for j in range(1, n):
        g = F.zip_with(
            g, F.slice(arr, j + 1, out_n), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return g
