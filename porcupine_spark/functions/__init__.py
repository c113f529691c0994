"""Scalar/array function library (JVM-side column expressions only)."""

from porcupine_spark.functions.arrays import seq1

__all__ = ["seq1"]
