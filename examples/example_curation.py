"""End-to-end LLM training-data curation pipeline through the
porcupine task layer — the engine's two halves composed: the
reference's task/catalog orchestration (load >>> transform >>> write,
configurable bindings) driving the large-scale curation operators.

Stages (each a Task, composed with >>):
  1. load the raw document corpus through the catalog;
  2. quality gate — per-row text statistics (JVM expressions only),
     keep docs inside length/word-length/alpha-ratio bounds;
  3. segment gate — CCNet-style paragraph dedup at segment
     granularity: drop docs whose cross-document duplicated-segment
     share exceeds the keep threshold (operators/segments.py);
  4. near-dup removal — minhash-LSH candidate pairs, verified Jaccard,
     keep-first canonical policy (one broadcast anti-join);
  5. write the curated corpus + a per-source audit summary through two
     catalog sinks (rebindable to s3a:// etc. via config, like any
     porcupine pipeline).

Run:  python examples/example_curation.py [workdir] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.operators.dedup import DEDUP_CANON_T, minhash_lsh_pairs
from porcupine_spark.run import run_pipeline
from porcupine_spark.serials import SerialSet, parquet_serial
from porcupine_spark.session import get_spark
from porcupine_spark.task import arr, load, write
from porcupine_spark.tables import table_path

CATALOG = Catalog(
    [
        Dataset.source("corpus/raw", SerialSet(parquet_serial())),
        Dataset.sink("corpus/curated", SerialSet(parquet_serial())),
        Dataset.sink("corpus/audit", SerialSet(parquet_serial())),
    ]
)


def quality_gate(df):
    """Keep docs passing cheap per-row quality bounds (all JVM column
    expressions — the 100 TB-safe first pass of any curation stack)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chars = F.length("text")
    n_words = F.size(toks)
    mean_wlen = n_chars.cast("double") / n_words
    alpha_ratio = (
        F.length(F.regexp_replace("text", r"[^A-Za-z]", "")).cast("double") / n_chars
    )
    return df.filter(
        (n_chars >= 20) & (n_words >= 5) & (mean_wlen <= 15.0) & (alpha_ratio >= 0.4)
    )


def drop_segment_spam(df):
    """CCNet-style gate: drop docs whose share of cross-document
    duplicated segments exceeds DUP_FRAC_KEEP_PPM (boilerplate-heavy
    pages). Two hash-keyed shuffles of (doc_id, 60-bit hash) longs."""
    from porcupine_spark.operators.segments import (
        DUP_FRAC_KEEP_PPM, _segments)

    perdoc = (
        _segments(df).groupBy("doc_id", "seg_hash")
        .agg(F.count(F.lit(1)).alias("n_inst"))
    )
    dfreq = perdoc.groupBy("seg_hash").agg(F.count(F.lit(1)).alias("n_docs"))
    dup_ppm = F.floor(
        F.sum(F.when(F.col("n_docs") >= 2, F.col("n_inst")).otherwise(0))
        * F.lit(1_000_000) / F.sum("n_inst")
    )
    keep_ids = (
        perdoc.join(dfreq, "seg_hash").groupBy("doc_id")
        .agg(dup_ppm.alias("dup_ppm"))
        .filter(F.col("dup_ppm") <= DUP_FRAC_KEEP_PPM)
        .select("doc_id")
    )
    return df.join(keep_ids, "doc_id", "left_semi")


def drop_near_dups(df):
    """Keep-first canonical policy over verified minhash-LSH pairs."""
    dropped = (
        minhash_lsh_pairs(df)
        .filter(F.col("jaccard") >= DEDUP_CANON_T)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return df.join(F.broadcast(dropped), "doc_id", "left_anti")


def audit(df):
    """Per-source counts + token totals of the curated corpus."""
    return df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("n_tokens"),
    )


def build_task():
    from porcupine_spark.task_ext import tee

    curate = (load("corpus/raw") >> arr(quality_gate)
              >> arr(drop_segment_spam) >> arr(drop_near_dups))
    # tee (mapCopy): the curated frame computes once and feeds both
    # sinks — verbatim to one, through the audit agg to the other
    return curate >> tee(("corpus/curated", None), ("corpus/audit", audit))


def main(workdir: str = "/tmp/porcupine_curation", sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("example_curation")
    run_pipeline(
        build_task(),
        CATALOG,
        spark,
        root=workdir,
        mappings={
            "corpus/raw": table_path(sf_dir, "documents"),
            # sinks inherit workdir via the root fallback; shown
            # explicitly here to mirror a production config
            "corpus/curated": f"{workdir}/curated.parquet",
            "corpus/audit": f"{workdir}/audit.parquet",
        },
    )
    curated = spark.read.parquet(f"{workdir}/curated.parquet")
    audit_df = spark.read.parquet(f"{workdir}/audit.parquet")
    print(f"curated corpus: {curated.count()} docs")
    audit_df.orderBy("source").show(20, False)


if __name__ == "__main__":
    main(*sys.argv[1:])
