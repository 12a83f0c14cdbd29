"""Embedding-vector column math via built-in higher-order functions.

``zip_with`` + ``aggregate`` keep the arithmetic JVM-side (no Python
UDF, no Arrow transfer); accumulation is a sequential left fold in
double, so results are deterministic and reproducible against a
sequential SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fsum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fsum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_fsum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL (not an ANSI DIVIDE_BY_ZERO error) for
    zero-magnitude vectors — one bad embedding must not kill the job."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def as_double(a: Column) -> Column:
    return a.cast("array<double>")
