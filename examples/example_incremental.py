"""Incremental-ingest pipeline: dedup an incoming batch against an
existing corpus WITHOUT ever self-joining the corpus.

The production shape behind the ``incremental_dedup`` query
(operators/dedup.py): the corpus's dedup artifacts — its md5 digest
table and its minhash band table — are materialized ONCE as catalog
datasets; each ingest then

  1. loads the incoming batch + the (precomputed) corpus artifacts;
  2. drops exact dups via a digest semi-join (shuffles 32-hex keys,
     never text bytes);
  3. drops near-dups via a band-signature semi-join (batch bands vs
     corpus bands — candidates are batch-sized, the corpus side is a
     lookup table);
  4. appends only the novel docs, refreshes both artifact tables with
     the survivors' rows, and writes an ingest report.

At 100 TB the per-ingest cost is proportional to the BATCH (one
digest-keyed + one band-keyed shuffle); the corpus is touched only
through its two small artifact tables, exactly how a production
curation stack amortizes corpus state across daily drops.

Run:  python examples/example_incremental.py [workdir] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.operators.dedup import _band_table, minhash_signatures
from porcupine_spark.run import run_pipeline
from porcupine_spark.serials import SerialSet, parquet_serial
from porcupine_spark.session import get_spark
from porcupine_spark.tables import load_table

CATALOG = Catalog(
    [
        Dataset.source("ingest/batch", SerialSet(parquet_serial())),
        Dataset.source("corpus/digests", SerialSet(parquet_serial())),
        Dataset.source("corpus/bands", SerialSet(parquet_serial())),
        Dataset.sink("ingest/accepted", SerialSet(parquet_serial())),
        Dataset.sink("ingest/report", SerialSet(parquet_serial())),
    ]
)


def digest_table(docs):
    """(h) digest table of a corpus — the exact-dup artifact."""
    return docs.select(F.md5(F.trim(F.col("text"))).alias("h")).distinct()


def band_sig_table(docs):
    """(band, sig) minhash band table — the near-dup artifact."""
    return _band_table(minhash_signatures(docs)).select("band", "sig").distinct()


def build_ingest_task():
    """batch + artifacts -> accepted novel docs + report."""
    from porcupine_spark.task import load
    from porcupine_spark.task_ext import tee

    def gate(inputs):
        batch, digests, bands = inputs
        batch_h = batch.withColumn("h", F.md5(F.trim(F.col("text"))))
        # exact tier: drop docs whose digest the corpus already has
        no_exact = batch_h.join(digests, "h", "left_anti").drop("h")
        # near tier: drop docs any of whose band signatures collide
        near_ids = (
            _band_table(minhash_signatures(no_exact))
            .join(bands, ["band", "sig"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        return no_exact.join(F.broadcast(near_ids), "doc_id", "left_anti")

    def report(accepted):
        return accepted.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_accepted"),
            F.sum(F.length("text")).alias("n_chars"),
        )

    from porcupine_spark.task import arr

    # (&&&)-style fanout: one (ignored) input feeds all three loads
    loads = load("ingest/batch").fanout(load("corpus/digests")).fanout(
        load("corpus/bands")
    ) >> arr(lambda t: (t[0][0], t[0][1], t[1]))
    return loads >> arr(gate) >> tee(("ingest/accepted", None), ("ingest/report", report))


def main(workdir: str = "/tmp/porcupine_incremental", sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("example_incremental")
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    # day-0 bootstrap: materialize the corpus artifacts once
    os.makedirs(workdir, exist_ok=True)
    batch.write.mode("overwrite").parquet(f"{workdir}/batch.parquet")
    digest_table(corpus).write.mode("overwrite").parquet(f"{workdir}/digests.parquet")
    band_sig_table(corpus).write.mode("overwrite").parquet(f"{workdir}/bands.parquet")

    run_pipeline(
        build_ingest_task(),
        CATALOG,
        spark,
        root=workdir,
        mappings={
            "ingest/batch": f"{workdir}/batch.parquet",
            "corpus/digests": f"{workdir}/digests.parquet",
            "corpus/bands": f"{workdir}/bands.parquet",
            "ingest/accepted": f"{workdir}/accepted.parquet",
            "ingest/report": f"{workdir}/report.parquet",
        },
    )
    accepted = spark.read.parquet(f"{workdir}/accepted.parquet")
    print(f"batch {batch.count()} docs -> accepted {accepted.count()} novel")
    spark.read.parquet(f"{workdir}/report.parquet").orderBy("source").show(5, False)


if __name__ == "__main__":
    main(*sys.argv[1:])
