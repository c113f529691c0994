"""Run independent driver-blocking Spark actions concurrently.

Guide §2.6: Spark happily runs several jobs at once inside one
application — actions are only sequential because driver code calls
them sequentially. Query builders that must materialize two or more
INDEPENDENT intermediates (eager localCheckpoints, collects, scalar
aggs) submit them from InheritableThreads so one job's straggler tail
backfills with the other job's tasks. This overlaps work WITHIN one
query build — it is not caching and does not survive the build.
"""

from __future__ import annotations

from collections.abc import Callable


def run_concurrently(*thunks: Callable):
    """Execute the thunks on InheritableThreads (JVM thread-locals —
    job group/description — are inherited and cleaned up) and return
    their results in order. Exceptions propagate to the caller."""
    from pyspark import InheritableThread

    results: list = [None] * len(thunks)
    errors: list = [None] * len(thunks)

    def _run(i: int, fn: Callable) -> None:
        try:
            results[i] = fn()
        except BaseException as e:  # noqa: BLE001 — re-raised below
            errors[i] = e

    threads = [
        InheritableThread(target=_run, args=(i, fn)) for i, fn in enumerate(thunks)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for e in errors:
        if e is not None:
            raise e
    return results
