"""Bounded-state heavy hitters via parallel Space-Saving (Metwally,
Agrawal & El Abbadi, "Efficient computation of frequent and top-k
elements in data streams", 2005; parallel merge per Cafaro & Tempesta,
2011 — public papers, implemented from scratch).

Rounds out the sketch family (HLL distinct, GK/t-digest quantiles)
with frequencies: exact top-k token counting needs a groupBy over the
full vocabulary — fine for text, pathological for high-cardinality
keys (URLs, user ids, n-grams) where the shuffle carries billions of
distinct groups. Space-Saving caps the state at ``capacity`` counters
per partition and still guarantees every item with true frequency
> N/capacity survives, with per-item overcount ≤ the counter's
recorded ``err``.

Plan shape at 100 TB:

  stage 1  mapInPandas    — one Space-Saving summary per partition
                            (≤ capacity rows emitted), NO shuffle of
                            raw tokens;
  stage 2  groupBy(token) — shuffles only ≤ capacity·n_partitions
                            summary rows; summing (count, err) gives
                            the standard merged upper/lower bounds;
  stage 3  top-k          — TakeOrdered on the merged estimates.

``count`` is an upper bound on true frequency and ``count − err`` a
lower bound; an item is a GUARANTEED heavy hitter when its lower
bound beats the k+1-th upper bound (checked in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _space_saving(tokens, capacity: int) -> dict[str, tuple[int, int]]:
    """Sequential Space-Saving: token → (count, err)."""
    state: dict[str, list[int]] = {}
    for t in tokens:
        if t in state:
            state[t][0] += 1
        elif len(state) < capacity:
            state[t] = [1, 0]
        else:
            # evict the minimum counter; inherit its count as error
            victim = min(state, key=lambda k: state[k][0])
            cnt = state.pop(victim)[0]
            state[t] = [cnt + 1, cnt]
    return {t: (c, e) for t, (c, e) in state.items()}


def heavy_hitters(
    df: DataFrame,
    token_col: str,
    *,
    k: int = 20,
    capacity: int = 1024,
) -> DataFrame:
    """Approximate top-``k`` most frequent values of ``token_col``
    with ≤ ``capacity`` counters of state per partition. Returns
    (token, count_hi, count_lo) ordered by count_hi desc — count_hi
    is the merged Space-Saving estimate (upper bound), count_lo =
    count_hi − summed error (lower bound)."""

    def _partials(batches):
        import pandas as pd

        # stream batches through one Space-Saving summary per partition
        state: dict[str, list[int]] = {}
        for pdf in batches:
            for t in pdf[token_col].dropna():
                if t in state:
                    state[t][0] += 1
                elif len(state) < capacity:
                    state[t] = [1, 0]
                else:
                    victim = min(state, key=lambda s: state[s][0])
                    cnt = state.pop(victim)[0]
                    state[t] = [cnt + 1, cnt]
        if state:
            yield pd.DataFrame(
                [(t, c, e) for t, (c, e) in state.items()],
                columns=["token", "cnt", "err"],
            )

    partials = df.select(F.col(token_col)).mapInPandas(
        _partials, schema="token string, cnt long, err long"
    )
    merged = partials.groupBy("token").agg(
        F.sum("cnt").alias("count_hi"),
        (F.sum("cnt") - F.sum("err")).alias("count_lo"),
    )
    return merged.orderBy(F.col("count_hi").desc(), F.col("token")).limit(k)


def explode_tokens(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens of a text column as one row per token."""
    return docs.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("token")
    ).filter(F.length("token") > 0)


def guaranteed_heavy_hitters(
    hitters: Sequence, k: int
) -> list:
    """Rows from ``heavy_hitters`` whose lower bound beats the (k+1)-th
    upper bound — provably in the true top set (diagnostic helper for
    choosing ``capacity``)."""
    rows = sorted(hitters, key=lambda r: -r.count_hi)
    if len(rows) <= k:
        return list(rows)
    threshold = rows[k].count_hi
    return [r for r in rows[:k] if r.count_lo > threshold]
