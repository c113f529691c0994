"""The reference's stress workload re-expressed (porcupine-core/
examples/stress-write/Main.hs:17-37): write N text payloads of M chars
through the catalog, read them back, verify.

Reference defaults: --num-files 1000, --num-chars 1000, --ms-delay 0,
parallel via ``parMapTask "fileNum"``. Spark-first: one partitioned
write job (no per-file driver loop — 1000 "files" are 1000 partition
directories written by one distributed job) + one partition-pruned
read-back. This is the internal perf canary for catalog/engine
overhead (BASELINE.md).

Run:  python examples/stress_write.py [--num-files N] [--num-chars M]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.config import OptionField, OptionsRecord
from porcupine_spark.run import run_pipeline
from porcupine_spark.session import get_spark
from porcupine_spark.task import arr, io_task
from porcupine_spark.task_ext import load_partitioned, write_partitioned

OPTIONS = OptionsRecord(
    "options",
    [
        OptionField("num_files", 1000, "number of occurrences to write"),
        OptionField("num_chars", 1000, "payload size per occurrence"),
        OptionField("ms_delay", 0, "sleep between write and read phases"),
    ],
)

CATALOG = Catalog([Dataset("stress/payloads")])


def build_task(num_files: int, num_chars: int, ms_delay: int):
    def make_payloads(ctx, _):
        return (
            ctx.spark.range(num_files)
            .withColumnRenamed("id", "fileNum")
            .withColumn("payload", F.repeat(F.lit("a"), num_chars))
        )

    def pause(x):
        if ms_delay:
            time.sleep(ms_delay / 1000.0)
        return x

    return (
        io_task(make_payloads)
        >> write_partitioned("stress/payloads", "fileNum")
        >> arr(pause)
        >> load_partitioned("stress/payloads", "fileNum")
    )


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser()
    OPTIONS.add_cli_args(ap)
    ap.add_argument("--workdir", default="/tmp/porcupine_stress")
    ns = ap.parse_args(argv)
    opts = OPTIONS.resolve({}, {k: v for k, v in vars(ns).items() if k != "workdir"})

    spark = get_spark("stress_write")
    t0 = time.perf_counter()
    back = run_pipeline(
        build_task(opts["num_files"], opts["num_chars"], opts["ms_delay"]),
        CATALOG,
        spark,
        root=ns.workdir,
    )
    n = back.count()
    ok = (
        back.agg(F.min(F.length("payload")).alias("lo"), F.max(F.length("payload")).alias("hi"))
        .collect()[0]
    )
    dt = time.perf_counter() - t0
    assert n == opts["num_files"] and ok.lo == ok.hi == opts["num_chars"]
    print(
        f"stress-write: {n} occurrences x {opts['num_chars']} chars written+read in "
        f"{dt:.2f}s ({n / dt:.0f} occ/s)"
    )


if __name__ == "__main__":
    main()
