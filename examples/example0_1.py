"""Reference example0 / example0.1 re-expressed (porcupine-core/
examples/example0/Example0.hs, example0.1/Example0_1.hs): the
hello-world of the serial machinery — ONE logical value written
through TWO serials bound as layers of the same sink, one of them
``lmap``-transformed (Example0_1.hs:19-22: ``PlainTextSerial "txt" <>
lmap yzCompress (PlainTextSerial "yz")``).

Options (``chars`` to repeat, ``replications`` counts) come from the
typed options record like getOptions (Example0_1.hs:25-31); the
repeated text is written to the ``result`` sink; binding the sink to a
``.txt`` and a ``.yz`` layer writes BOTH — the ``.yz`` layer passing
through the run-length-encode pre-write transform.

Spark-first detail: the RLE compressor is a pure column expression
(split + aggregate fold over the char array) — whole-stage-codegen
JVM code, no Python UDF, even in a toy.

Run:  python examples/example0_1.py [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.config import OptionField, OptionsRecord
from porcupine_spark.run import run_pipeline
from porcupine_spark.serials import SerialSet, text_serial
from porcupine_spark.session import get_spark
from porcupine_spark.task import io_task

OPTIONS = OptionsRecord(
    "options",
    [
        OptionField("chars", "a", "the chars to repeat"),
        OptionField("replications", [10], "the numbers of replications"),
    ],
)


def yz_compress(df):
    """yzCompress (Example0_1.hs:13-16): run-length encode — each group
    of equal consecutive chars becomes '<len><char>,'. A pure fold over
    the char array; the accumulator carries (output, current char, run
    length)."""
    chars = F.filter(F.split(F.col("value"), ""), lambda c: c != F.lit(""))
    zero = F.struct(
        F.lit("").alias("out"), F.lit("").alias("ch"), F.lit(0).alias("n")
    )

    def flush(acc):
        return F.when(
            acc["n"] > 0,
            F.concat(acc["out"], acc["n"].cast("string"), acc["ch"], F.lit(",")),
        ).otherwise(acc["out"])

    def step(acc, c):
        return F.when(
            c == acc["ch"],
            F.struct(acc["out"].alias("out"), acc["ch"].alias("ch"), (acc["n"] + 1).alias("n")),
        ).otherwise(F.struct(flush(acc).alias("out"), c.alias("ch"), F.lit(1).alias("n")))

    return df.select(F.aggregate(chars, zero, step, flush).alias("value"))


CATALOG = Catalog(
    [
        Dataset.sink(
            "result",
            SerialSet(text_serial(ext="txt"), text_serial(ext="yz").lmap(yz_compress)),
        ),
    ]
)


def build_task(chars: str, replications: list[int]):
    """myTask (Example0_1.hs:24-33): zip chars with counts, repeat,
    concat, write — the value is option-derived (one row), the serial
    layers do the interesting work."""

    def make(ctx, _):
        txt = "".join(c * int(n) for c, n in zip(chars, replications))
        df = ctx.spark.createDataFrame([(txt,)], "value string")
        return ctx.bound.write(df, "result")

    return io_task(make, name="write:result")


def main(workdir: str = "/tmp/porcupine_example0_1") -> None:
    spark = get_spark("example0_1")
    opts = OPTIONS.resolve({}, {})
    run_pipeline(
        build_task(opts["chars"], opts["replications"]),
        CATALOG,
        spark,
        root=workdir,
        mappings={"result": [f"{workdir}/result.txt", f"{workdir}/result.yz"]},
    )
    print("txt:", spark.read.text(f"{workdir}/result.txt").collect())
    print("yz: ", spark.read.text(f"{workdir}/result.yz").collect())


if __name__ == "__main__":
    main(*sys.argv[1:])
