"""Reference example2 re-expressed (porcupine-core/examples/example2/
Example2.hs): nested per-company stock JSON, a 10-day sliding-window
mean, CSV output without header.

Reference: ``Stock {chart :: [Stockdaily]}`` loaded per company index
(Example2.hs:19-26,58-63), ``msliding 10`` + mean by hand (:40-55),
``CSVSerial "csv" False ','`` sink (:36-38).

Spark-first: nested array-of-structs exploded, the hand-rolled sliding
window becomes a proper frame (ROWS BETWEEN CURRENT AND 9 FOLLOWING),
and all companies process in one plan partitioned by the index column.

Run:  python examples/example2_stocks.py [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.run import run_pipeline
from porcupine_spark.serials import SerialSet, csv_serial, json_serial
from porcupine_spark.session import get_spark
from porcupine_spark.task import arr
from porcupine_spark.task_ext import load_indexed, write_partitioned

COMPANIES = ["aapl", "googl", "fb"]  # example2's fixture set

CATALOG = Catalog(
    [
        Dataset.source(
            "inputs/stock",
            SerialSet(json_serial()),
            schema="chart array<struct<date:string, close:double>>",
        ),
        # CSV without header, comma sep — CSVSerial "csv" False ','
        Dataset.sink("outputs/smoothed", SerialSet(csv_serial(header=False))),
    ]
)


def smooth(df):
    """msliding 10 + mean (Example2.hs:40-55) as a window frame."""
    daily = df.select(
        F.col("idx").alias("company"), F.explode("chart").alias("day")
    ).select("company", F.to_date("day.date").alias("date"), F.col("day.close").alias("close"))
    w = W.partitionBy("company").orderBy("date").rowsBetween(0, 9)
    return daily.withColumn("smoothed", F.avg("close").over(w))


def build_task(companies):
    return (
        load_indexed("inputs/stock", "company", companies)
        >> arr(smooth)
        >> write_partitioned("outputs/smoothed", "company")
    )


def seed_inputs(spark, workdir: str, companies):
    import json
    import random

    for ci, comp in enumerate(companies):
        rng = random.Random(ci)
        chart = [
            {"date": f"2019-01-{d:02d}", "close": round(100 + 10 * rng.random(), 2)}
            for d in range(1, 29)
        ]
        path = f"{workdir}/Inputs/Stock-{comp}.json"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # one whole-file JSON object per company, like the reference fixture
        with open(path, "w") as fh:
            json.dump({"chart": chart}, fh)


def main(workdir: str = "/tmp/porcupine_example2") -> None:
    spark = get_spark("example2")
    seed_inputs(spark, workdir, COMPANIES)
    run_pipeline(
        build_task(COMPANIES),
        CATALOG,
        spark,
        root=workdir,
        mappings={
            "inputs/stock": workdir + "/Inputs/Stock-{company}.json",
            "outputs/smoothed": f"{workdir}/Outputs/smoothed.csv",
        },
    )
    out = spark.read.csv(f"{workdir}/Outputs/smoothed.csv")
    print(f"wrote {out.count()} smoothed rows for {len(COMPANIES)} companies")


if __name__ == "__main__":
    main(*sys.argv[1:])
