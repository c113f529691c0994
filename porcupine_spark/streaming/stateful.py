"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only stateful construct is ``FoldA`` over batch
streams (SURVEY §2.10); this is the additive streaming twin: an
arbitrary per-key accumulator carried across microbatches, with the
GroupState API bounding memory (state ages out by timeout — the thing
a 100 TB unbounded stream demands). Registered as a rows-only query
(no SQL oracle: emission granularity is per-microbatch, so the final
rowset depends on batch boundaries — exactly the non-SQL-expressible
class the contract flags)."""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_events_stream

OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_event string"
STATE_SCHEMA = "n bigint, total double, last string"


def running_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum, last-event-type) accumulator."""
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = str(pdf["event_type"].iloc[-1])
    state.update((n, total, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "last_event": [last]}
    )


def stateful_user_stats(spark: SparkSession, stream: DataFrame) -> DataFrame:
    """Drive the stateful query over a (file-source) stream to
    completion; returns the final per-key emissions."""
    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            running_user_stats,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_stateful_user_stats",
    None,  # rows-only: emission granularity is per-microbatch
    tags=("streaming", "stateful"),
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user running count/sum/last-event across microbatches. "
    "Rows-only check by design; the batch-equivalence assertion lives "
    "in tests/test_operators.py.",
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F, Window as W

    # Stateful cost is dominated by per-partition state-store + Python
    # worker setup; size the state partitioning to the key cardinality
    # (150-1500 users here), not the session's shuffle width. A cloned
    # session scopes the conf change to this query. On a real cluster
    # this is executors-sized instead.
    ns = spark.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", "8")
    stream = load_events_stream(ns, sf_dir)
    raw = stateful_user_stats(ns, stream)
    # keep only each user's final emission (latest n_events wins) so the
    # result is batch-boundary-insensitive after all data is processed
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        raw.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
