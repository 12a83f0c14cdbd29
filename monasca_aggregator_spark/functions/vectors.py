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


# --- fixed-dimension (unrolled) variants -----------------------------
# F.aggregate/zip_with are INTERPRETED higher-order functions — they
# never enter whole-stage codegen, which makes an all-pairs similarity
# scan ~50-100× slower than the same arithmetic unrolled (measured:
# embedding_knn_accuracy 58.9 s → see plans/similarity.py).  When the
# dimension is a known constant, build the dot product as an explicit
# left-associated element_at chain: identical IEEE left-fold sums
# (same doubles as the sequential aggregate, so oracles keep passing),
# but plain codegen arithmetic.


# The unrolled chains are assembled as ONE SQL string handed to a
# single F.expr parse: building them op-by-op in Column algebra costs
# ~3 py4j round-trips per dimension per call site (~1 s of DataFrame
# BUILD time per cosine_fixed at dim=64 — measured r8 in the ANN
# builders), while the JVM-side parse of the identical expression is
# ~1 ms. element_at chains left-associate in the parser exactly like
# the Column form, so the plan (and every oracle hash) is unchanged.


import re as _re

_SIMPLE_NAME = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*$")


def _col_sql(c: Column) -> str | None:
    """Backquoted SQL reference when the column is a PLAIN name; None
    for computed expressions (those keep the Column-algebra path —
    their toString is not guaranteed round-trippable SQL)."""
    s = str(c._jc)
    return f"`{s}`" if _SIMPLE_NAME.match(s) else None


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    sa, sb = _col_sql(a), _col_sql(b)
    if sa is None or sb is None:
        expr = F.element_at(a, 1) * F.element_at(b, 1)
        for i in range(2, dim + 1):
            expr = expr + F.element_at(a, i) * F.element_at(b, i)
        return expr
    return F.expr(
        " + ".join(
            f"element_at({sa}, {i}) * element_at({sb}, {i})"
            for i in range(1, dim + 1)
        )
    )


def norm_fixed(a: Column, dim: int) -> Column:
    sa = _col_sql(a)
    if sa is None:
        expr = F.element_at(a, 1) * F.element_at(a, 1)
        for i in range(2, dim + 1):
            expr = expr + F.element_at(a, i) * F.element_at(a, i)
        return F.sqrt(expr)
    return F.expr(
        "sqrt("
        + " + ".join(
            f"element_at({sa}, {i}) * element_at({sa}, {i})"
            for i in range(1, dim + 1)
        )
        + ")"
    )


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    """`cosine` with the dimension pinned at plan-build time — same
    numerics (left-fold double sums), whole-stage-codegen speed.
    Vectors shorter than ``dim`` yield NULL (element_at past the end),
    matching the try_divide NULL-propagation contract."""
    return F.try_divide(
        dot_fixed(a, b, dim), norm_fixed(a, dim) * norm_fixed(b, dim)
    )


def dist2_fixed(a: Column, b: Column, dim: int) -> Column:
    """Unrolled squared euclidean distance (codegen, left-fold order —
    the cosine_fixed contract applied to distances)."""
    sa, sb = _col_sql(a), _col_sql(b)
    if sa is None or sb is None:
        d = F.element_at(a, 1) - F.element_at(b, 1)
        expr = d * d
        for i in range(2, dim + 1):
            d = F.element_at(a, i) - F.element_at(b, i)
            expr = expr + d * d
        return expr
    terms = [
        f"(element_at({sa}, {i}) - element_at({sb}, {i}))"
        f" * (element_at({sa}, {i}) - element_at({sb}, {i}))"
        for i in range(1, dim + 1)
    ]
    return F.expr(" + ".join(terms))
