"""Synthesize a larger scale factor from an existing testdata dir by
unioning N key-shifted replicas (default 10x sf0.1 ~= sf1), so bench.py
gets a genuine scaling point without touching /root/testdata.

Replication is FK-consistent (every key column of a replica shifts by
replica * stride, so joins fan out exactly as a real bigger SF would)
and avoids fake cross-replica duplicate blowup:

- documents.text gets a per-replica Caesar rotation of the letters —
  length/structure/within-replica duplicate rate preserved, but
  replicas don't collide in shingle space (a real 10x corpus is not
  10 copies of every doc, and the near-dup self-joins would otherwise
  measure a quadratic workload the algorithm never promises);
- embeddings.embedding gets a per-replica cyclic rotation — norms
  (and within-replica geometry) preserved, cross-replica cosines
  decorrelated;
- events keeps its time range (more users, same per-user density —
  how event volume actually scales);
- region/nation stay fixed (bounded dimensions).

Usage: python tools/make_scale_data.py [--src /root/testdata/sf0.1]
       [--dest /tmp/porcupine_scale_sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from porcupine_spark.session import get_spark
from porcupine_spark.tables import TABLES, table_path

KEY_STRIDE = 10_000_000  # far above any base-table key

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _caesar(col, i: int):
    """Per-replica letter rotation (replica 0 = identity)."""
    if i == 0:
        return col
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    rot = i % 26
    return F.translate(
        col,
        lower + upper,
        lower[rot:] + lower[:rot] + upper[rot:] + upper[:rot],
    )


def _replica(df: DataFrame, table: str, i: int) -> DataFrame:
    out = df
    for k in KEY_COLS.get(table, []):
        out = out.withColumn(k, F.col(k) + F.lit(i * KEY_STRIDE))
    if table == "documents":
        out = out.withColumn("text", _caesar(F.col("text"), i))
    if table == "embeddings" and i > 0:
        rot = i % 64
        if rot:
            out = out.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", rot + 1, 64 - rot), F.slice("embedding", 1, rot)
                ),
            )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default="/tmp/porcupine_scale_sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("make_scale_data")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(args.dest, exist_ok=True)
    for t in TABLES:
        src = spark.read.parquet(table_path(args.src, t))
        if t in ("region", "nation"):
            big = src
        else:
            big = _replica(src, t, 0)
            for i in range(1, args.copies):
                big = big.unionByName(_replica(src, t, i))
        dest = table_path(args.dest, t)
        big.write.mode("overwrite").parquet(dest)
        print(f"{t}: {spark.read.parquet(dest).count()} rows -> {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
