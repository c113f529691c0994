"""Reference example1 re-expressed (porcupine-core/examples/example1/
Example1.hs): per-user JSON records loaded over an index range, a
letter-count "analysis" per user, results written per-index.

Reference pipeline:  loadData userFile >>> analyseOneUser >>>
writeData analysisFile, repeated with parMapTask over
``users = IndexRange "[0..10,50..60]"`` (Example1.hs:37-60), paths
``Inputs/User-{userId}.json`` / ``Outputs/Analysis-{userId}.json``.

Spark-first shape: the index range is a column, per-user occurrence
files become ONE multi-path scan with the index recovered, the
letter-count HashMap becomes exploded (letter, cnt) rows, and the
per-index outputs become a partitionBy(userId) layout — one job end
to end, no driver loop.

Run:  python examples/example1_users.py [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.repetition import parse_index_range
from porcupine_spark.run import run_pipeline
from porcupine_spark.serials import SerialSet, json_serial, parquet_serial
from porcupine_spark.session import get_spark
from porcupine_spark.task import arr
from porcupine_spark.task_ext import load_indexed, write_partitioned

USERS_SPEC = "[0..3,7..8]"  # IndexRange syntax kept verbatim (Repetition.hs:114-181)

CATALOG = Catalog(
    [
        Dataset.source("inputs/user", SerialSet(json_serial(), parquet_serial()),
                       schema="userName string, userSurname string, userAge int"),
        Dataset.sink("outputs/analysis"),
    ]
)


def analyse(df):
    """Example1.hs:37-40: count letters of userName+userSurname; the
    HashMap Char Int becomes (idx, letter, cnt) rows."""
    letters = F.explode(
        F.split(F.lower(F.concat("userName", "userSurname")), "")
    ).alias("letter")
    return (
        df.select("idx", letters)
        .filter(F.col("letter").rlike("[a-z]"))
        .groupBy("idx", "letter")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumnRenamed("idx", "userId")
    )


def build_task(indices):
    return (
        load_indexed("inputs/user", "userId", indices)
        >> arr(analyse)
        >> write_partitioned("outputs/analysis", "userId")
    )


def seed_inputs(spark, workdir: str, indices):
    for i in indices:
        spark.createDataFrame(
            [(f"User{i}", f"Surname{i}", 20 + i)],
            "userName string, userSurname string, userAge int",
        ).coalesce(1).write.mode("overwrite").json(f"{workdir}/Inputs/User-{i}.json")


def main(workdir: str = "/tmp/porcupine_example1") -> None:
    spark = get_spark("example1")
    indices = parse_index_range(USERS_SPEC)
    seed_inputs(spark, workdir, indices)
    task = build_task(indices)
    run_pipeline(
        task,
        CATALOG,
        spark,
        root=workdir,
        mappings={
            "inputs/user": workdir + "/Inputs/User-{userId}.json",
            "outputs/analysis": f"{workdir}/Outputs/analysis.parquet",
        },
    )
    out = spark.read.parquet(f"{workdir}/Outputs/analysis.parquet")
    print(f"wrote {out.count()} letter-count rows for {len(indices)} users")
    out.orderBy("userId", "letter").show(10, False)


if __name__ == "__main__":
    main(*sys.argv[1:])
