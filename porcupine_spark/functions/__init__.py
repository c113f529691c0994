"""Scalar/array function library (JVM-side column expressions only)."""

from porcupine_spark.functions.arrays import seq1, word_ngrams

__all__ = ["seq1", "word_ngrams"]
