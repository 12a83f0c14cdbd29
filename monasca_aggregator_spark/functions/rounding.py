"""Oracle-stable rounding.

Spark's ``round`` (BigDecimal HALF_UP on the double's exact binary
expansion) and DuckDB's ``round`` disagree on half-ULP boundaries (e.g.
0.49824999999999997 → 0.4982 vs 0.4983). For oracle comparison we
instead use ``floor(x * 10^d + 0.5) / 10^d`` spelled out identically on
both sides: identical input doubles then produce identical outputs by
construction, independent of either engine's round() implementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, digits: int = 4) -> Column:
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_stable_round(expr: str, digits: int = 4) -> str:
    scale = float(10**digits)
    return f"floor(({expr}) * {scale}::DOUBLE + 0.5::DOUBLE) / {scale}::DOUBLE"
