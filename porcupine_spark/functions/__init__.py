"""Scalar/array function library (JVM-side column expressions only)."""

from porcupine_spark.functions.arrays import seq1, word_ngrams
from porcupine_spark.functions.hashing import md5_bucket, md5_long60
from porcupine_spark.functions.topk import ranked_topk

__all__ = ["seq1", "word_ngrams", "md5_bucket", "md5_long60", "ranked_topk"]
