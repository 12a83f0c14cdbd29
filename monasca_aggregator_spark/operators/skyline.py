"""Distributed skyline (Pareto frontier) operator.

Classic two-phase MapReduce skyline (Börzsönyi et al. ICDE'01 dominance
semantics; partition-local skyline → merged global skyline):

1. **Local phase** — ``mapInPandas`` computes each partition's skyline.
   Dominated rows never leave their partition, so the shuffle carries
   only the per-partition frontiers.
2. **Global phase** — the union of local frontiers (tiny for
   correlated dimensions, bounded by the true skyline's superset) is
   coalesced into one task and filtered once more. The final frontier
   is exact: global-dominance of row x is witnessed by some row d that
   is itself locally non-dominated (dominance is transitive), so the
   local phase loses nothing.

Worst case (fully anti-correlated dimensions) the frontier IS the
dataset and phase 2 degenerates to a single-task scan — the caller
owns dimension choice; this operator is for the frontier-is-small
regime every practical "best quality for its cost" selection lives in.

Reference parity: the reference has no multi-criteria operator; this
extends the LLM-pipeline surface (document selection under competing
quality/cost axes).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def _pareto_mask(vals) -> "list[int]":
    """Indices of non-dominated rows. ``vals``: 2-D float ndarray with
    every dimension already normalized to MAXIMIZE. O(n·|skyline|)
    block-nested loop over a lexicographically sorted order — the sort
    guarantees no later row can dominate an earlier survivor, so one
    pass suffices."""
    import numpy as np

    n = len(vals)
    # sort rows lexicographically descending (first dim, then tie-breaks)
    order = np.lexsort(tuple(-vals[:, d] for d in range(vals.shape[1] - 1, -1, -1)))
    keep: list[int] = []
    frontier: list = []  # rows of kept values
    for i in order:
        v = vals[i]
        if frontier:
            fr = np.asarray(frontier)
            # d dominates v: all(d >= v) and any(d > v)
            dominated = bool(
                ((fr >= v).all(axis=1) & (fr > v).any(axis=1)).any()
            )
            if dominated:
                continue
        frontier.append(v)
        keep.append(int(i))
    return keep


def _skyline_2d(
    df: DataFrame, cols: Sequence[str], signs: Sequence[float]
) -> DataFrame:
    """Exact 2-D skyline as pure DataFrame ops (no Arrow stages).

    In signed (maximize-both) space, a point survives iff (a) its
    ``s1`` equals the max ``s1`` among points sharing its ``s0`` and
    (b) that group max STRICTLY exceeds the running max of group maxes
    over all strictly-greater ``s0`` — the classic 2-D sweep, folded
    to the aggregated domain: groupBy ``s0`` (one shuffle over
    |distinct s0| groups), one ordered window over the TINY aggregated
    relation (same aggregate-then-window pattern as the
    weighted-median rewrite), then a broadcast semi-join back. Rows
    with NULL/NaN dims are mutually non-dominated (matching
    ``_pareto_mask``'s NaN comparison semantics) and pass through
    unfiltered.

    Scale note: the single-task window runs over one row per distinct
    ``s0`` value — fine for the discrete/integer dims (token counts,
    cents) this operator selects on; a truly continuous first dim
    degrades it to n rows, where the generic two-phase path
    (``algo="generic"``) is the right tool.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    s0 = (F.col(cols[0]).cast("double") * F.lit(signs[0])).alias("__s0")
    s1 = (F.col(cols[1]).cast("double") * F.lit(signs[1])).alias("__s1")
    tagged = df.select("*", s0, s1)
    bad = (
        F.col("__s0").isNull()
        | F.col("__s1").isNull()
        | F.isnan("__s0")
        | F.isnan("__s1")
    )
    null_rows = tagged.filter(bad).drop("__s0", "__s1")
    pts = tagged.filter(~bad)
    per0 = pts.groupBy("__s0").agg(F.max("__s1").alias("__m1"))
    higher = (
        Window.orderBy(F.col("__s0").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per0.withColumn("__hi", F.max("__m1").over(higher))
        .filter(F.col("__hi").isNull() | (F.col("__m1") > F.col("__hi")))
        .select("__s0", F.col("__m1").alias("__s1"))
    )
    kept = pts.join(
        F.broadcast(frontier), ["__s0", "__s1"], "left_semi"
    ).drop("__s0", "__s1")
    return kept.unionByName(null_rows)


def skyline(
    df: DataFrame,
    dims: Sequence[tuple[str, str]],
    *,
    prefilter: bool = False,
    algo: str = "auto",
) -> DataFrame:
    """Rows not dominated on ``dims`` — [(column, "max"|"min"), ...].

    d dominates x iff d is ≥-as-good on every dim and strictly better
    on at least one (ties survive: two identical points are mutually
    non-dominated and both kept).

    ``prefilter=True`` adds an SFS-style (sort-filter-skyline family)
    reduction ahead of phase 1: ONE extra aggregation pass computes —
    as a broadcast 1-row aggregate, no driver collect — k REAL corner
    reference points (for each dim, the row maximizing that signed
    dim via ``max_by``), and a whole-stage-codegen JVM filter drops
    every row strictly dominated by ANY of them. Rows dominated by a
    real point are by definition off the frontier, so the result is
    exact; what it buys is that the O(n·|frontier|) Python dominance
    loop only ever sees the pre-filter's survivors — at 100 TB the
    Arrow stages receive a frontier-sized slice instead of the
    corpus. Rows with NULL dims pass the pre-filter untouched (NaN
    rows are mutually non-dominated in the exact phases too).

    The pre-filter is a single extra read of the input (the corner
    aggregate; the filter fuses into phase 1's scan) and keeps the
    whole plan lazy — no persist, no cached-partition lifetime for
    the caller to manage (the r3-ADVICE leak), and column pruning
    means the extra read touches only the dim columns.

    Default OFF: measured at sf0.1 (50k docs, local[32]) the extra
    job launch costs more than the Python loop it shrinks — job
    launch overhead dominates at small n. Turn it on when n is large
    enough that the local-phase dominance loop, not stage scheduling,
    is the bottleneck (the 100 TB regime it exists for).
    """
    for _, sense in dims:
        if sense not in ("max", "min"):
            raise ValueError(f"dim sense must be max|min, got {sense!r}")
    if algo not in ("auto", "generic"):
        raise ValueError(f"algo must be auto|generic, got {algo!r}")
    cols = [c for c, _ in dims]
    signs = [1.0 if s == "max" else -1.0 for _, s in dims]
    schema = df.schema

    if algo == "auto" and len(dims) == 2:
        # 2-D skylines have a fully JVM-side sweep formulation — no
        # Arrow stages, no Python dominance loop (see _skyline_2d)
        return _skyline_2d(df, cols, signs)

    if prefilter:
        from pyspark.sql import functions as F

        k = len(cols)
        signed = [
            (F.col(c).cast("double") * F.lit(sg)).alias(f"__s{i}")
            for i, (c, sg) in enumerate(zip(cols, signs))
        ]
        s = df.select(*signed)
        # k corner reference points in ONE pass: for every dim j, the
        # real row maximizing signed dim j (ties broken arbitrarily by
        # max_by — any real point is a valid dominator)
        refs = s.agg(
            *[
                F.max_by(
                    F.struct(*[F.col(f"__s{i}") for i in range(k)]),
                    F.col(f"__s{j}"),
                ).alias(f"__ref{j}")
                for j in range(k)
            ]
        )
        with_ref = df.crossJoin(F.broadcast(refs))
        dominated = F.lit(False)
        for j in range(k):
            ge = F.lit(True)
            gt = F.lit(False)
            for i, (c, sg) in enumerate(zip(cols, signs)):
                sv = F.col(c).cast("double") * F.lit(sg)
                rv = F.col(f"__ref{j}.__s{i}")
                ge = ge & (rv >= sv)
                gt = gt | (rv > sv)
            dominated = dominated | F.coalesce(ge & gt, F.lit(False))
        df = with_ref.filter(~dominated).drop(
            *[f"__ref{j}" for j in range(k)]
        )

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        vals = pdf[cols].to_numpy(dtype="float64") * np.asarray(signs)
        yield pdf.iloc[_pareto_mask(vals)]

    local = df.mapInPandas(_local, schema=schema)
    # Phase 2: one task over the (small) union of local frontiers.
    return local.coalesce(1).mapInPandas(_local, schema=schema)
