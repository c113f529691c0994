"""MERGE / upsert / SCD2 without a table format.

Plain parquet has no MERGE INTO (Delta/Iceberg jars aren't in this
environment); the standing emulation is set algebra over immutable
snapshots:

- ``merge_upsert``: updates win per key, untouched base rows survive —
  one anti-join + union, both shuffling on the key once. This is also
  exactly the reference's right-biased layered-read merge (§1.4) with
  the update set as the top layer.
- ``scd2_apply``: slowly-changing-dimension type 2 — incoming changes
  close the current version's validity interval and append a new open
  version; history rows pass through untouched.

At warehouse scale both stay viable because they never touch rows
outside the affected keys' partitions when the base layout is
partitioned/bucketed by the merge key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """UPDATE-or-INSERT: rows of ``updates`` replace same-key rows of
    ``base``; unmatched base rows survive."""
    untouched = base.join(updates, key, "left_anti")
    return untouched.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts_col: str,
    open_end: str = "2200-01-01 00:00:00",  # ns-safe sentinel (9999 overflows datetime64[ns])
) -> DataFrame:
    """Type-2 apply: ``dim`` carries (key, attrs..., valid_from,
    valid_to); rows with valid_to == open_end are current. Each change
    closes the matching current row at its change ts and appends a new
    current row."""
    current = dim.filter(F.col("valid_to") == open_end)
    history = dim.filter(F.col("valid_to") != open_end)
    changed_keys = changes.select(key).distinct()
    closed = (
        current.join(changed_keys, key, "left_semi")
        .drop("valid_to")
        .join(changes.select(key, F.col(change_ts_col).alias("valid_to")), key)
    )
    untouched_current = current.join(changed_keys, key, "left_anti")
    new_versions = changes.withColumnRenamed(change_ts_col, "valid_from").withColumn(
        "valid_to", F.lit(open_end).cast("timestamp")
    )
    cols = dim.columns
    return (
        history.select(cols)
        .unionByName(untouched_current.select(cols))
        .unionByName(closed.select(cols))
        .unionByName(new_versions.select(cols))
    )


@query(
    "merge_upsert_customers",
    """
    WITH updates AS (
      SELECT c_custkey, upper(c_name) AS c_name, c_nationkey,
             c_acctbal + 1000.0 AS c_acctbal, 'UPSERTED' AS c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
    ),
    untouched AS (
      SELECT c.* FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM untouched
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM updates
    """,
    tags=("merge", "upsert"),
    doc="MERGE INTO emulation (no Delta): updates (derived here from "
    "custkey%7) replace matched rows, unmatched base rows survive — "
    "anti-join + unionByName, one shuffle on the key. Equals the "
    "reference's right-biased layer merge with updates as top layer.",
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("c_name"),
        "c_nationkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit("UPSERTED").alias("c_mktsegment"),
    )
    return merge_upsert(c, updates, "c_custkey")


@query(
    "scd2_customer_segments",
    """
    WITH dim AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
             TIMESTAMP '2200-01-01 00:00:00' AS valid_to
      FROM customer
    ),
    changes AS (
      SELECT c_custkey, 'MOVED' AS c_mktsegment,
             TIMESTAMP '1997-06-01 00:00:00' AS change_ts
      FROM customer WHERE c_custkey % 10 = 3
    ),
    changed_keys AS (SELECT DISTINCT c_custkey FROM changes),
    closed AS (
      SELECT d.c_custkey, d.c_mktsegment, d.valid_from, ch.change_ts AS valid_to
      FROM dim d JOIN changes ch ON ch.c_custkey = d.c_custkey
      WHERE d.valid_to = TIMESTAMP '2200-01-01 00:00:00'
    ),
    untouched AS (
      SELECT d.* FROM dim d
      WHERE NOT EXISTS (SELECT 1 FROM changed_keys k WHERE k.c_custkey = d.c_custkey)
    ),
    new_versions AS (
      SELECT c_custkey, c_mktsegment, change_ts AS valid_from,
             TIMESTAMP '2200-01-01 00:00:00' AS valid_to
      FROM changes
    )
    SELECT c_custkey, c_mktsegment,
           CAST(valid_from AS TIMESTAMP_NS) AS valid_from,
           CAST(valid_to AS TIMESTAMP_NS) AS valid_to
    FROM (
      SELECT * FROM untouched
      UNION ALL SELECT * FROM closed
      UNION ALL SELECT * FROM new_versions
    )
    """,
    tags=("merge", "scd2"),
    doc="SCD2 apply: changes (custkey%10=3 -> segment MOVED at a fixed "
    "ts) close the open version and append a new open version; "
    "history preserved. The MERGE-less warehouse pattern.",
)
def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit("2200-01-01 00:00:00").cast("timestamp").alias("valid_to"),
    )
    changes = c.filter(F.col("c_custkey") % 10 == 3).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.lit("1997-06-01 00:00:00").cast("timestamp").alias("change_ts"),
    )
    return scd2_apply(dim, changes, "c_custkey", "change_ts")


@query(
    "snapshot_diff_orders",
    """
    WITH snap_a AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
    ),
    snap_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           a.o_totalprice AS price_a,
           b.o_totalprice AS price_b
    FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_totalprice <> b.o_totalprice
    """,
    tags=("merge", "cdc"),
    doc="Snapshot diff (table-format-free CDC): classify every key of "
    "two dataset versions as added / removed / changed, dropping "
    "unchanged rows. One co-partitioned full-outer join on the key — "
    "with both snapshots bucketed on the key (bucketing.py) the diff "
    "runs shuffle-free, which is what makes periodic 100 TB snapshot "
    "reconciliation affordable. Snapshots are derived deterministically "
    "from orders (key mod filters, a mod-3 price bump) so both engines "
    "see identical inputs.",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    snap_a = o.filter(F.col("o_orderkey") % 7 != 0).select("o_orderkey", "o_totalprice")
    snap_b = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 2
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    a = snap_a.alias("a")
    b = snap_b.alias("b")
    j = a.join(b, "o_orderkey", "full_outer")
    pa = F.col("a.o_totalprice")
    pb = F.col("b.o_totalprice")
    return j.filter(pa.isNull() | pb.isNull() | (pa != pb)).select(
        "o_orderkey",
        F.when(pa.isNull(), "added")
        .when(pb.isNull(), "removed")
        .otherwise("changed")
        .alias("status"),
        pa.alias("price_a"),
        pb.alias("price_b"),
    )


@query(
    "pit_join_order_segment",
    """
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.o_orderdate AS TIMESTAMP_NS) AS o_orderdate,
           CASE WHEN o.o_orderdate < TIMESTAMP '1995-01-01 00:00:00' THEN NULL
                WHEN o.o_custkey % 10 = 3
                 AND o.o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
                THEN 'MOVED' ELSE c.c_mktsegment END AS segment_at_order
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    tags=("join", "scd2", "feature-store"),
    doc="Point-in-time correct dimension lookup - the feature-store "
    "join: each order picks the SCD2 segment version valid AT its "
    "order date (valid_from <= ts < valid_to), never a later one (no "
    "training-serving leakage). Executes as the custkey equi-join "
    "with the validity range evaluated inside the join - per-key "
    "amplification is the version count (here <=2, generally small), "
    "so the shuffle is the fact table keyed by custkey, same as a "
    "plain dim join; a high-churn dimension would switch to the as-of "
    "join (operators/asof.py) on (key, ts). The oracle is the CLOSED "
    "FORM of the segment history - an independent derivation, not a "
    "SQL transliteration of the pipeline.",
)
def pit_join_order_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    versions = scd2_customer_segments(spark, sf_dir)
    return (
        orders.join(
            versions,
            (orders.o_custkey == versions.c_custkey)
            & (versions.valid_from <= orders.o_orderdate)
            & (orders.o_orderdate < versions.valid_to),
            "left",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("c_mktsegment").alias("segment_at_order"),
        )
    )
