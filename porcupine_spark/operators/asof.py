"""As-of (point-in-time) join — an operator Spark lacks natively.

Scale-first design: the classic join-free union+window merge. Tag both
sides, union them, and for each left row take the most recent right row
at-or-before its timestamp via ``last_value(..., ignorenulls)`` over a
key-partitioned, time-ordered window. ONE shuffle (on the key), no
range-explosion, no per-group pandas; skew behaves like any window op.
A join-based formulation (left join on key + ts<=ts, then keep max)
explodes on hot keys — at 100 TB the union+window form is the only one
that survives.

The reference has no joins at all (SURVEY.md §2.3); this is part of the
additive large-scale operator surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_order: str,
    payload_cols: list[str],
) -> DataFrame:
    """For every ``left`` row, attach the latest ``right`` payload with
    ``right_ts <= left_ts`` and the same ``on`` key (ties on right_ts
    broken by largest ``right_order``). Returns left columns + payloads
    (null when no right row precedes)."""
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c in payload_cols:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn("__ord", F.lit(None).cast(right.schema[right_order].dataType))
    r = right.withColumn("__t", F.col(right_ts)).withColumn("__side", F.lit(0))
    r = r.withColumn("__ord", F.col(right_order))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    sel = [on, "__t", "__side", "__ord", *[c for c in lcols if c != on], *payload_cols]
    unioned = l.select(*sel).unionByName(r.select(*sel))
    # right rows sort BEFORE left rows at equal ts => "at or before" includes ties
    w = (
        W.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__ord").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in [on, "__side", *[c for c in lcols if c != on]]],
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


@query(
    "asof_purchase_last_view",
    """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT event_id AS view_id, user_id, ts, value AS view_value
      FROM events WHERE event_type = 'view'
    ),
    ranked AS (
      SELECT p.event_id, v.view_id, v.view_value,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.view_id DESC) AS rn
      FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
    )
    SELECT p.event_id, p.user_id, r.view_id, r.view_value
    FROM p LEFT JOIN (SELECT event_id, view_id, view_value FROM ranked WHERE rn = 1) r
      ON r.event_id = p.event_id
    """,
    tags=("asof", "window"),
    doc="As-of join: each purchase gets the latest at-or-before view of "
    "the same user. Spark side is the union+window merge (no join); the "
    "oracle is an independent correlated-rank formulation.",
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts", F.col("value").alias("view_value")
    )
    out = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_order="view_id",
        payload_cols=["view_id", "view_value"],
    )
    return out.select("event_id", "user_id", "view_id", "view_value")
