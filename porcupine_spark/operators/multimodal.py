"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample stages.

The Spark-side plumbing is real and tested — binary columns, Arrow-
batched ``mapInPandas`` with a declared output schema, deterministic
batch shapes — while the codec kernel itself is STUBBED (this container
has no image/audio libraries): ``decode_media_meta`` computes metadata
with a deterministic fake decoder over the raw bytes. Swapping in a
real decoder (PIL/ffmpeg) changes ONE function body, none of the
plumbing. A real deployment keeps bytes out of shuffles: metadata is
extracted once, bytes are re-read from storage by path when needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from porcupine_spark.functions import seq1
from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

META_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, format string"
)


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a codec: metadata derived from byte
    length and first/last byte. Raises like a real decoder on empty
    input."""
    if not payload:
        raise ValueError("cannot decode empty payload")
    n = len(payload)
    return {
        "n_bytes": n,
        "width": (n * 7) % 640 + 16,
        "height": (payload[0] * 5) % 480 + 16,
        "n_frames": n % 5 + 1,
        "format": "fake/v1",
    }


def decode_media_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload binary) -> metadata rows.
    Arrow-batched; one Python crossing per ~10k rows, not per row."""
    for pdf in batches:
        metas = [fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out[["doc_id", "n_bytes", "width", "height", "n_frames", "format"]]


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-cast as an opaque binary payload column —
    the fixture for the multimodal plumbing (no real media in the
    test corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))


@query(
    "media_decode_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           (octet_length(encode(text)) * 7) % 640 + 16 AS width,
           (ord(substr(text, 1, 1)) * 5) % 480 + 16 AS height,
           octet_length(encode(text)) % 5 + 1 AS n_frames,
           'fake/v1' AS format
    FROM documents
    """,
    tags=("multimodal", "pandas_udf"),
    doc="Binary decode -> metadata through Arrow-batched mapInPandas "
    "(kernel stubbed deterministically; see module doc). The oracle "
    "recomputes the fake decoder arithmetic in SQL, proving the "
    "plumbing (schema, batching, binary column) end-to-end.",
)
def media_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    out = media.mapInPandas(decode_media_meta, schema=META_SCHEMA)
    return out.select(
        "doc_id",
        "n_bytes",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        "format",
    )


@query(
    "media_frame_sample",
    """
    WITH meta AS (
      SELECT doc_id, octet_length(encode(text)) % 5 + 1 AS n_frames FROM documents
    )
    SELECT doc_id, f.frame_idx,
           md5(concat(CAST(doc_id AS VARCHAR), ':', CAST(f.frame_idx AS VARCHAR))) AS frame_key
    FROM meta,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(0, n_frames - 1)) AS frame_idx) f
    """,
    tags=("multimodal", "explode"),
    doc="Frame sampling: one row per sampled frame index (explode of a "
    "per-item frame range), frame_key = stable handle a downstream "
    "decode stage would fetch by. Bytes never enter the explode.",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_frames = F.octet_length(F.encode(F.col("text"), "UTF-8")) % 5 + 1
    frames = docs.select(
        "doc_id", F.explode(F.transform(seq1(n_frames), lambda i: i - 1)).alias("frame_idx")
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("frame_idx").cast("string"))).alias(
            "frame_key"
        ),
    )
