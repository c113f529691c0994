"""Session-level measurement helpers shared by bench.py and the scale
tools — ONE guarded copy of the JVM statusStore accessor instead of
drifting per-tool pastes."""

from __future__ import annotations

import gc


def shuffle_read_bytes(spark) -> int:
    """Cumulative shuffle-read bytes across executors from the live
    AppStatusStore (the UI's data source; local mode = one 'driver'
    executor row). Returns -1 when the JVM internals are unavailable —
    metrics are best-effort, never fatal; callers gate on >= 0."""
    try:
        total = 0
        it = (
            spark.sparkContext._jsc.sc()
            .statusStore()
            .executorList(True)
            .iterator()
        )
        while it.hasNext():
            total += it.next().totalShuffleRead()
        return total
    except Exception:  # noqa: BLE001 — metrics are best-effort, never fatal
        return -1


def drop_session_residue(spark) -> None:
    """Free cached/checkpointed leftovers between timed queries so
    timings stay independent: clearCache alone is not enough —
    localCheckpoint RDD blocks and broadcasts only free after the
    Python refs die AND the JVM ContextCleaner runs, so force both
    (measured: late-alphabet bench queries read 5-10x their
    clean-session cost without this)."""
    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 — GC nudge is best-effort
        pass
