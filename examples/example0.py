"""Reference example0 re-expressed (porcupine-core/examples/example0/
Example0.hs): THE minimal pipeline — a typed options record (``char``
to repeat, ``replications`` count, Example0.hs:21-25), a pure task
building the repeated text, one plain-text sink ``result``
(Example0.hs:12-13), run through the full config machinery
(``runLocalPipelineTask (FullConfig ...)``, Example0.hs:29).

This is example0.1's degenerate base (one serial layer, one char);
it exists so the example inventory matches the reference's 1:1 — the
interesting two-serial variant lives in examples/example0_1.py.

Run:  python examples/example0.py [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.config import OptionField, OptionsRecord
from porcupine_spark.run import run_pipeline
from porcupine_spark.serials import SerialSet, text_serial
from porcupine_spark.session import get_spark
from porcupine_spark.task import io_task

OPTIONS = OptionsRecord(
    "options",
    [
        OptionField("char", "a", "The character to repeat"),
        OptionField("replications", 10, "The number of replications"),
    ],
)

CATALOG = Catalog([Dataset.sink("result", SerialSet(text_serial(ext="txt")))])


def build_task(char: str, replications: int):
    """myTask (Example0.hs:15-25): options -> replicated text -> sink."""

    def make(ctx, _):
        df = ctx.spark.createDataFrame([(char * int(replications),)], "value string")
        return ctx.bound.write(df, "result")

    return io_task(make, name="write:result")


def main(workdir: str = "/tmp/porcupine_example0") -> None:
    spark = get_spark("example0")
    opts = OPTIONS.resolve({}, {})
    run_pipeline(
        build_task(opts["char"], opts["replications"]),
        CATALOG,
        spark,
        root=workdir,
        mappings={"result": f"{workdir}/result.txt"},
    )
    print("result:", spark.read.text(f"{workdir}/result.txt").collect())


if __name__ == "__main__":
    main(*sys.argv[1:])
