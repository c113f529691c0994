"""Sessionization: gap-based session assignment over an event stream.

Batch form: the lag+cumsum idiom — flag a new session when the gap to
the previous event of the same user exceeds the threshold, then a
running sum of flags numbers the sessions. Two window passes over ONE
shuffle (both windows share the user_id partitioning, so Spark reuses
the exchange). The streaming twin is ``session_window`` in
streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

GAP_SECONDS = 1800


def sessionize(df: DataFrame, key: str, ts: str, order_tiebreak: str, gap_s: int) -> DataFrame:
    """Add a ``session_id`` column (1-based per key) to an event frame."""
    w = W.partitionBy(key).orderBy(ts, order_tiebreak)
    # integer microsecond arithmetic: exact, identical in the oracle
    gap = F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s * 1_000_000), 1).otherwise(0)
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(wrun)
    ).drop("__new")


@query(
    "sessionize_events",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_SECONDS} * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("sessionize", "window"),
    doc="Gap-based sessionization (30 min) via lag+cumsum, then per-"
    "session rollup. epoch() diff on both sides; decimal-sum for the "
    "value rollup.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", order_tiebreak="event_id", gap_s=GAP_SECONDS)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
    )
