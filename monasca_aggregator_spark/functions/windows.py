"""Epoch-aligned tumbling event-time windows.

The reference buckets each metric into
``floor(timestamp_ms / (1000*windowSize))`` and stamps outputs with the
window *start* in epoch milliseconds
(reference: aggregation/aggregation_rule.go:52, :76). These helpers
reproduce that with pure integer column arithmetic — no UDFs, stays in
whole-stage codegen, and (being deterministic integer math) matches any
SQL oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ts_ms(ts: Column) -> Column:
    """Event time as epoch milliseconds (bigint)."""
    return F.unix_millis(ts)


def window_start_ms(ts: Column, window_size_sec: int) -> Column:
    """Window start in epoch ms — the reference's output timestamp unit.

    ms − pmod(ms, W): pure bigint arithmetic. (A `/` division would be
    DOUBLE division — exact at 2024-epoch magnitudes but an avoidable
    precision hazard; `Column./` has no integer form.)
    """
    ms = _ts_ms(ts)
    return ms - F.pmod(ms, F.lit(1000 * window_size_sec))


def window_id(ts: Column, window_size_sec: int) -> Column:
    """Window bucket id: floor(ms / (1000*size)) as bigint."""
    # numerator is an exact multiple of the divisor → division exact
    return (
        window_start_ms(ts, window_size_sec) / F.lit(1000 * window_size_sec)
    ).cast("bigint")


def window_start_sec(ts: Column, window_size_sec: int) -> Column:
    """Epoch-aligned window start in epoch seconds (bigint)."""
    return window_id(ts, window_size_sec) * F.lit(window_size_sec)
