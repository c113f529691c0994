"""Distributed prefix scans.

A global running aggregate over a total order ("max seen so far in
arrival order") is the one window shape Spark cannot partition: the
naive ``Window.orderBy(id)`` moves the whole table to ONE partition.
The classic fix is a two-level scan (the same decomposition GPU scan
kernels use): bucket the order key, aggregate per bucket, prefix-scan
the bounded bucket table, then finish within buckets carrying the
bucket prefix in. Both levels are ordinary keyed windows:

  level 1: |buckets| = n / B rows through a single-partition window
  level 2: each partition holds one bucket's <= B rows

Pick B ~ sqrt(n) and both sides stay bounded at any scale (1e10 rows,
B = 1e5: a 1e5-row bucket table and 1e5-row partitions). The oracle
side can use the direct single-window form — proving on every run
that the decomposition equals the global scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_max_exclusive(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    value_col: str,
    out_col: str,
    bucket_width: int,
) -> DataFrame:
    """Add ``out_col`` = MAX(value_col) over all rows STRICTLY BEFORE
    this row in (``order_col``, ``tiebreak_col``) order (null for the
    first row), computed with the two-level scan above. The pair must
    be a unique total order; ``order_col`` and ``value_col`` must be
    numeric (cast timestamps first). ``bucket_width`` is in order_col
    VALUE units — size it so a bucket holds ~sqrt(n) rows."""
    bucket = F.floor(F.col(order_col) / F.lit(bucket_width)).alias("__bucket")
    b = df.withColumn("__bucket", bucket)
    # level 1: bucket maxima, then exclusive prefix over the bounded
    # bucket table (single-partition window over n/B rows — by design)
    bmax = b.groupBy("__bucket").agg(F.max(value_col).alias("__bmax"))
    wb = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    carry = bmax.select(
        "__bucket", F.max("__bmax").over(wb).alias("__carry")
    )
    # level 2: within-bucket exclusive running max + the bucket carry
    wi = (
        Window.partitionBy("__bucket")
        .orderBy(order_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(carry, "__bucket")
        .withColumn("__run", F.max(value_col).over(wi))
        .withColumn(
            out_col,
            F.when(
                F.col("__run").isNull(), F.col("__carry")
            ).when(
                F.col("__carry").isNull(), F.col("__run")
            ).otherwise(F.greatest("__run", "__carry")),
        )
        .drop("__bucket", "__carry", "__run")
    )
