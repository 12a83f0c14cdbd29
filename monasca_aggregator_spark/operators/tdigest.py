"""Distributed t-digest quantile sketch (Dunning & Ertl, "Computing
extremely accurate quantiles using t-digests", 2019 — public paper;
implementation from scratch, no library).

Completes the quantile-sketch path SURVEY §2 18d opened with GK
(`approx_percentile`): unlike GK, t-digest centroids are *mergeable*
with no accuracy cliff, which is what a 1000-executor topology needs —
each task sketches its partition locally, and only O(δ) centroids per
group ever cross the wire.

Plan shape (the whole point at 100 TB):

  stage 1  mapInPandas       — per-partition partial digests, built
                               incrementally with a bounded buffer
                               (≈32δ values) so executor memory is
                               O(δ) per live group, NO shuffle;
  stage 2  groupBy(keys)     — shuffles ONLY centroid arrays
           .applyInPandas      (≤δ rows of (mean, weight) per partial,
                               vs the raw multiset for exact
                               percentiles), merge + interpolate.

The k₁ scale function k(q) = δ/2π·asin(2q−1) concentrates centroid
resolution at the tails, so extreme quantiles (p95/p99) carry the
smallest error — the reverse of equi-width histograms.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUFFER_FACTOR = 32  # values buffered per group before an incremental compress


def _k(q: np.ndarray | float, delta: float) -> np.ndarray | float:
    return delta / (2.0 * np.pi) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))


def _k_inv(k: np.ndarray | float, delta: float) -> np.ndarray | float:
    return (np.sin(np.clip(k * 2.0 * np.pi / delta, -np.pi / 2, np.pi / 2)) + 1.0) / 2.0


def compress(means: np.ndarray, weights: np.ndarray, delta: float):
    """Merge (mean, weight) points into ≤ ~δ centroids honoring the k₁
    size bound. Input need not be sorted; output is sorted by mean.

    Fully vectorized via k-space bucketing (the MergingDigest
    construction from the t-digest paper §2.2): each point's midpoint
    rank q maps to k(q); points sharing ⌊k⌋ merge into one centroid.
    The k₁ scale makes buckets tight at the tails, and |buckets| ≤ δ by
    construction — same bound as the sequential greedy fill, with no
    per-centroid Python loop (the old loop dominated merge wall time)."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="mergesort")
    m, w = means[order], weights[order]
    total = w.sum()
    q_mid = (np.cumsum(w) - w / 2.0) / total
    bucket = np.floor(_k(q_mid, delta)).astype(np.int64)
    # segment-reduce by bucket: weighted mean + weight per bucket
    _, start_idx = np.unique(bucket, return_index=True)
    seg_w = np.add.reduceat(w, start_idx)
    seg_mw = np.add.reduceat(m * w, start_idx)
    return seg_mw / seg_w, seg_w


def quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Interpolated quantile from a sorted-by-mean centroid list (the
    standard midpoint-rank interpolation)."""
    if means.size == 0:
        return float("nan")
    if means.size == 1:
        return float(means[0])
    total = float(weights.sum())
    target = q * total
    mid = np.cumsum(weights) - weights / 2.0
    if target <= mid[0]:
        return float(means[0])
    if target >= mid[-1]:
        return float(means[-1])
    i = int(np.searchsorted(mid, target))
    t = (target - mid[i - 1]) / (mid[i] - mid[i - 1])
    return float(means[i - 1] + t * (means[i] - means[i - 1]))


def _key_ddl(df: DataFrame, keys: Sequence[str]) -> str:
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"{k} {by_name[k]}" for k in keys)


def tdigest_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    qs: dict[str, float],
    *,
    delta: float = 100.0,
) -> DataFrame:
    """Per-group quantiles via two-stage t-digest: map-side partial
    digests (no shuffle of raw values), then a merge keyed by ``keys``
    where only centroid arrays move. ``qs`` maps output column name →
    quantile in (0, 1)."""
    keys = list(keys)
    key_ddl = _key_ddl(df, keys)
    partial_schema = f"{key_ddl}, means array<double>, weights array<double>"
    out_schema = key_ddl + ", " + ", ".join(f"{c} double" for c in qs)
    buf_cap = int(_BUFFER_FACTOR * delta)
    q_items = list(qs.items())

    def _partials(batches):
        import pandas as pd

        # key → (centroid means, centroid weights, raw-value buffer)
        state: dict[tuple, list] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(keys, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                vals = grp[value_col].dropna().to_numpy(dtype=float)
                if vals.size == 0:
                    continue
                ent = state.setdefault(key, [np.empty(0), np.empty(0), []])
                ent[2].extend(vals)
                if len(ent[2]) >= buf_cap:
                    bm = np.asarray(ent[2])
                    ent[0], ent[1] = compress(
                        np.concatenate([ent[0], bm]),
                        np.concatenate([ent[1], np.ones(bm.size)]),
                        delta,
                    )
                    ent[2] = []
        lazy_cap = int(4 * delta)
        rows = []
        for key, (m, w, buf) in state.items():
            if buf:
                bm = np.asarray(buf)
                if m.size == 0 and bm.size <= lazy_cap:
                    # lazy compression: a small buffer IS a valid digest
                    # (unit-weight centroids); skip the per-group
                    # compress here — the merge stage compresses once
                    # per group instead of once per (group, partition),
                    # which dominates wall time when groups are tiny
                    m, w = np.sort(bm), np.ones(bm.size)
                else:
                    m, w = compress(
                        np.concatenate([m, bm]),
                        np.concatenate([w, np.ones(bm.size)]),
                        delta,
                    )
            rows.append((*key, list(m), list(w)))
        if rows:
            yield pd.DataFrame(rows, columns=[*keys, "means", "weights"])

    def _merge_stream(batches):
        import pandas as pd

        # one Python call per PARTITION (repartition(keys) below
        # co-locates each group), streaming per-key centroid state
        # across Arrow batches — ~720 per-group applyInPandas calls
        # collapsed into 32 partition calls, which halved the stage.
        # Per-key state is re-compressed whenever its accumulated
        # partials exceed ~8δ points, so partition memory stays
        # O(#keys·δ) — not the sum of all uncompressed partials.
        merge_cap = int(8 * delta)
        state: dict[tuple, tuple[list, list, int]] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(keys, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                ms, ws, n_pts = state.get(key, ([], [], 0))
                for x, y in zip(grp["means"], grp["weights"]):
                    ms.append(np.asarray(x))
                    ws.append(np.asarray(y))
                    n_pts += ms[-1].size
                if n_pts > merge_cap:
                    m, w = compress(
                        np.concatenate(ms), np.concatenate(ws), delta
                    )
                    ms, ws, n_pts = [m], [w], m.size
                state[key] = (ms, ws, n_pts)
        rows = []
        for key, (ms, ws, _) in state.items():
            m, w = compress(np.concatenate(ms), np.concatenate(ws), delta)
            rows.append((*key, *[quantile(m, w, q) for _, q in q_items]))
        if rows:
            yield pd.DataFrame(rows, columns=[*keys, *[c for c, _ in q_items]])

    partials = df.select(*keys, value_col).mapInPandas(
        _partials, schema=partial_schema
    )
    return partials.repartition(*keys).mapInPandas(
        _merge_stream, schema=out_schema
    )


def exact_error_bound_note() -> str:
    """Rank-error expectation used by the accuracy tests: with the k₁
    scale at compression δ, observed rank error is well under 1/δ at
    mid quantiles and tighter at the tails."""
    return "rank_error << 1/delta"


def tdigest_digests(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    delta: float = 100.0,
) -> DataFrame:
    """Materialized per-key digests: (keys..., means, weights) — the
    persistable sketch table re-aggregation reads INSTEAD of raw data
    (same partial/merge pipeline as ``tdigest_quantiles``, stopping at
    the compressed digest instead of extracting quantiles)."""
    keys = list(keys)
    key_ddl = _key_ddl(df, keys)
    digest_schema = f"{key_ddl}, means array<double>, weights array<double>"
    # Same partial shape as tdigest_quantiles, built on the same
    # compress() primitives so digests are interchangeable between
    # the direct and rollup paths.
    partial = df.select(*keys, value_col)

    def _partials(batches):
        import pandas as pd

        state: dict[tuple, list] = {}
        buf_cap = int(_BUFFER_FACTOR * delta)
        for pdf in batches:
            for key, grp in pdf.groupby(keys, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                vals = grp[value_col].dropna().to_numpy(dtype=float)
                if vals.size == 0:
                    continue
                ent = state.setdefault(key, [np.empty(0), np.empty(0), []])
                ent[2].extend(vals)
                if len(ent[2]) >= buf_cap:
                    bm = np.asarray(ent[2])
                    ent[0], ent[1] = compress(
                        np.concatenate([ent[0], bm]),
                        np.concatenate([ent[1], np.ones(bm.size)]),
                        delta,
                    )
                    ent[2] = []
        rows = []
        for key, (m, w, buf) in state.items():
            if buf:
                bm = np.asarray(buf)
                m, w = compress(
                    np.concatenate([m, bm]),
                    np.concatenate([w, np.ones(bm.size)]),
                    delta,
                )
            rows.append((*key, list(m), list(w)))
        if rows:
            yield pd.DataFrame(rows, columns=[*keys, "means", "weights"])

    partials = partial.mapInPandas(_partials, schema=digest_schema)
    return (
        partials.repartition(*keys)
        .mapInPandas(
            _merge_digests_factory(keys, delta), schema=digest_schema
        )
    )


def _merge_digests_factory(keys: list, delta: float):
    def _merge(batches):
        import pandas as pd

        merge_cap = int(8 * delta)
        state: dict[tuple, tuple[list, list, int]] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(keys, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                ms, ws, n_pts = state.get(key, ([], [], 0))
                for x, y in zip(grp["means"], grp["weights"]):
                    ms.append(np.asarray(x))
                    ws.append(np.asarray(y))
                    n_pts += ms[-1].size
                if n_pts > merge_cap:
                    m, w = compress(
                        np.concatenate(ms), np.concatenate(ws), delta
                    )
                    ms, ws, n_pts = [m], [w], m.size
                state[key] = (ms, ws, n_pts)
        rows = []
        for key, (ms, ws, _) in state.items():
            m, w = compress(np.concatenate(ms), np.concatenate(ws), delta)
            rows.append((*key, list(m), list(w)))
        if rows:
            yield pd.DataFrame(rows, columns=[*keys, "means", "weights"])

    return _merge


def tdigest_merge_quantiles(
    digests: DataFrame,
    keys: Sequence[str],
    qs: dict[str, float],
    *,
    delta: float = 100.0,
) -> DataFrame:
    """Quantiles from a DIGEST table under (usually coarser) keys —
    the t-digest twin of `agg_distinct_rollup_hll`'s sketch
    re-aggregation: hourly digests roll up to daily quantiles by
    centroid merging alone; raw values are never revisited. Input
    must carry ``means``/``weights`` arrays plus ``keys``."""
    keys = list(keys)
    key_ddl = _key_ddl(digests, keys)
    out_schema = key_ddl + ", " + ", ".join(f"{c} double" for c in qs)
    q_items = list(qs.items())

    def _merge_q(batches):
        import pandas as pd

        merge_cap = int(8 * delta)
        state: dict[tuple, tuple[list, list, int]] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(keys, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                ms, ws, n_pts = state.get(key, ([], [], 0))
                for x, y in zip(grp["means"], grp["weights"]):
                    ms.append(np.asarray(x))
                    ws.append(np.asarray(y))
                    n_pts += ms[-1].size
                if n_pts > merge_cap:
                    m, w = compress(
                        np.concatenate(ms), np.concatenate(ws), delta
                    )
                    ms, ws, n_pts = [m], [w], m.size
                state[key] = (ms, ws, n_pts)
        rows = []
        for key, (ms, ws, _) in state.items():
            m, w = compress(np.concatenate(ms), np.concatenate(ws), delta)
            rows.append((*key, *[quantile(m, w, q) for _, q in q_items]))
        if rows:
            yield pd.DataFrame(
                rows, columns=[*keys, *[c for c, _ in q_items]]
            )

    return digests.repartition(*keys).mapInPandas(
        _merge_q, schema=out_schema
    )
