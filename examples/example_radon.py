"""Reference example-radon re-expressed (porcupine-core/examples/
example-radon/ExampleRadon.hs): CSV-with-header input, an applicative
summary fold, filtered re-write through the same serial.

Reference: ``radonObsVFile`` accepts CSV or JSON (:52-57); the summary
fold ``Summary <$> L.length <*> premap state L.nub <*> (premap county
L.nub <&> length)`` (:71-79) runs over the rows; a filtered subset is
re-written (:61-62,127).

Spark-first: the fold is ONE agg pass (folds.Fold applicative); the
filtered re-write goes through the catalog's CSV serial; typed options
(the reference's DocRec pipeline options) come from config.OptionsRecord.

Run:  python examples/example_radon.py [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.config import OptionField, OptionsRecord
from porcupine_spark.folds import Fold, run_fold
from porcupine_spark.run import run_pipeline
from porcupine_spark.serials import SerialSet, csv_serial, json_serial
from porcupine_spark.session import get_spark
from porcupine_spark.task import arr, load
from porcupine_spark.task_ext import tee

CATALOG = Catalog(
    [
        Dataset.source(
            "inputs/radon",
            SerialSet(csv_serial(header=True), json_serial()),
            schema="state string, county string, basement string, log_radon double",
        ),
        Dataset.sink("outputs/summary", SerialSet(json_serial())),
        Dataset.sink("outputs/filtered", SerialSet(csv_serial(header=True))),
    ]
)

OPTIONS = OptionsRecord(
    "options",
    [
        OptionField("min_log_radon", 0.0, "keep rows with log_radon above this"),
    ],
)

SUMMARY_FOLD = (
    Fold.length("n_obs")
    & Fold.nub("state", "states")
    & Fold.nub_length("county", "n_counties")
)


def build_task(min_log_radon: float):
    def summarize_and_split(df):
        return df  # pass-through; tee handles the two sinks

    return load("inputs/radon") >> tee(
        ("outputs/summary", lambda df: run_fold(df, SUMMARY_FOLD)),
        ("outputs/filtered", lambda df: df.filter(F.col("log_radon") > min_log_radon)),
    )


def seed_inputs(spark, workdir: str):
    rows = [
        ("MN", "AITKIN", "Y", 0.83),
        ("MN", "ANOKA", "N", 1.55),
        ("MN", "ANOKA", "Y", -0.11),
        ("WI", "DANE", "Y", 2.04),
        ("WI", "DANE", "N", 0.33),
    ]
    df = spark.createDataFrame(rows, "state string, county string, basement string, log_radon double")
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(f"{workdir}/Inputs/radon.csv")


def main(workdir: str = "/tmp/porcupine_radon") -> None:
    spark = get_spark("example_radon")
    seed_inputs(spark, workdir)
    opts = OPTIONS.resolve({}, {})
    run_pipeline(
        build_task(opts["min_log_radon"]),
        CATALOG,
        spark,
        root=workdir,
        mappings={
            "inputs/radon": f"{workdir}/Inputs/radon.csv",
            "outputs/summary": f"{workdir}/Outputs/summary.json",
            "outputs/filtered": f"{workdir}/Outputs/filtered.csv",
        },
    )
    print(spark.read.json(f"{workdir}/Outputs/summary.json").collect())
    print("filtered rows:", spark.read.option("header", True).csv(f"{workdir}/Outputs/filtered.csv").count())


if __name__ == "__main__":
    main(*sys.argv[1:])
