"""Non-equi (range) join and skew-salted aggregation queries.

Two surfaces the rest of the corpus doesn't exercise:

- a RANGE join (equi key + time-range condition) — the attribution /
  interval-alignment shape. Spark executes it as the equi-join on the
  key with the range predicate evaluated inside the join, so it
  shuffles once on the key and never builds the unkeyed cross product;
  at 100 TB the key join is the thing that scales, and a genuinely
  key-less range join would instead need bucketized range overlap
  (bin the time axis, equi-join on bin).
- the SALTED two-phase aggregation from functions/skew.py on the
  oracle path, proving result-equality with the plain GROUP BY it
  replaces (AQE splits skewed JOINS at runtime but not skewed
  aggregations — salting is the standing fix; see SCALE.md).

The reference has no joins at all (SURVEY §2.3) — these extend the
engine's join surface alongside the TPC-H corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from porcupine_spark.functions.skew import salted_agg
from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

BURST_HOURS = 2


@query(
    "range_join_error_burst",
    f"""
    SELECT s.event_id AS signup_id,
           s.user_id,
           COUNT(*) AS n_errors
    FROM events s
    JOIN events e
      ON e.user_id = s.user_id
     AND s.event_type = 'signup' AND e.event_type = 'error'
     AND e.ts >= s.ts
     AND e.ts < s.ts + INTERVAL {BURST_HOURS} HOURS
    GROUP BY s.event_id, s.user_id
    """,
    tags=("join", "range"),
    doc=f"Range join: errors within {BURST_HOURS}h after each signup, "
    "per signup. Executes as ONE shuffle on the user key with the "
    "time-range predicate evaluated inside the join — no cross "
    "product; the per-signup rollup reuses the join's key "
    "partitioning. A key-less range join would instead need "
    "time-bucketized overlap (bin the axis, equi-join on bin).",
)
def range_join_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", F.col("ts").alias("sts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("ets")
    )
    joined = s.join(
        e,
        (F.col("e_user") == F.col("user_id"))
        & (F.col("ets") >= F.col("sts"))
        & (F.col("ets") < F.col("sts") + F.expr(f"INTERVAL {BURST_HOURS} HOURS")),
    )
    return joined.groupBy("signup_id", "user_id").agg(F.count(F.lit(1)).alias("n_errors"))


@query(
    "salted_source_stats",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    """,
    tags=("agg", "skew"),
    doc="Per-source corpus stats through the SALTED two-phase "
    "aggregation (phase 1 on (source, salt) spreads hot sources over "
    "16 reducers, phase 2 merges partials on source). The oracle is "
    "the plain GROUP BY — passing proves the associative "
    "decomposition (count->sum, sum->sum) is exact. This is the "
    "standing fix for skewed aggregation keys, which AQE does not "
    "split (SCALE.md).",
)
def salted_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.length("text").alias("len")
    )
    return salted_agg(
        docs,
        keys=["source"],
        aggs=[F.count(F.lit(1)).alias("pc"), F.sum("len").alias("ps")],
        final_aggs=[
            F.sum("pc").alias("n_docs"),
            F.sum("ps").alias("total_chars"),
        ],
    )
