"""Data-quality expectation checking — the dbt-test / Great-Expectations
shape as a distributed operator: declare rules, get one row per rule
with its violation count.

Row-level rules compile into ONE conditional-sum pass over the table
(no per-rule scan); referential rules are anti-joins (broadcast when
the dimension is small). At 100 TB this is the cheapest possible
formulation: a single scan + one tiny shuffle for the row rules, one
join per FK rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table


@query(
    "dq_violations_orders",
    """
    WITH row_rules AS (
      SELECT
        CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS nonpositive_price,
        CAST(SUM(CASE WHEN o_orderdate < DATE '1992-01-01'
                       OR o_orderdate > DATE '1998-12-31' THEN 1 ELSE 0 END) AS BIGINT)
          AS date_out_of_range,
        CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
          AS bad_status,
        CAST(SUM(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS BIGINT)
          AS suspicious_high_price
      FROM orders
    )
    SELECT 'nonpositive_price' AS rule, nonpositive_price AS n_violations FROM row_rules
    UNION ALL
    SELECT 'date_out_of_range', date_out_of_range FROM row_rules
    UNION ALL
    SELECT 'bad_status', bad_status FROM row_rules
    UNION ALL
    SELECT 'suspicious_high_price', suspicious_high_price FROM row_rules
    UNION ALL
    SELECT 'orphan_custkey', CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
    tags=("quality",),
    doc="Expectation suite over orders: four row-level rules "
    "(non-positive price, date range, status domain, outlier price) "
    "evaluated in ONE conditional-sum scan, plus FK integrity "
    "(orders.o_custkey -> customer) as a broadcast anti-join. Output "
    "is one (rule, n_violations) row per rule — the monitoring-table "
    "shape a pipeline gate consumes.",
)
def dq_violations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    row_rules = o.agg(
        viol(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        viol(
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
            | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date"))
        ).alias("date_out_of_range"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("bad_status"),
        viol(F.col("o_totalprice") > 400000).alias("suspicious_high_price"),
    )
    long_rules = row_rules.select(
        F.explode(
            F.create_map(
                F.lit("nonpositive_price"), F.col("nonpositive_price"),
                F.lit("date_out_of_range"), F.col("date_out_of_range"),
                F.lit("bad_status"), F.col("bad_status"),
                F.lit("suspicious_high_price"), F.col("suspicious_high_price"),
            )
        ).alias("rule", "n_violations")
    )
    orphans = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orphan_custkey").alias("rule"), "n_violations")
    )
    return long_rules.unionByName(orphans)
