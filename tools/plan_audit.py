"""Whole-registry physical-plan audit.

Builds (but does not execute) the physical plan of EVERY registered
query at sf0.001 and fails if a hot path regressed to row-at-a-time
Python:

- ``BatchEvalPython`` (pickled row-by-row UDF) is never allowed.
- ``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` /
  ``MapInPandas`` (vectorized Arrow stages) are allowed only for
  queries on the explicit allowlist below — the operators whose
  semantics genuinely need Python (numpy matmuls, sketch folds,
  greedy re-ranks).  A new Arrow stage appearing anywhere else is a
  performance regression to catch in review, not silently ship.
- UNPARTITIONED ``Window`` nodes (no PARTITION BY → the whole input
  funnels through ONE task) are allowed only when the windowed
  relation is bounded by construction: the distributed-rank bucket
  histograms (auto-detected by their ``_grk_bucket`` marker) and the
  queries on ``UNPARTITIONED_WINDOW_ALLOWED``, each justified as a
  histogram / top-K / per-source-row relation.  An unpartitioned
  window over anything corpus-proportional is the canonical scale
  cliff (VERDICT r5 "What's wrong" #1) — this rule keeps that bug
  class from coming back.

Also counts scans whose parquet Scan node carries no ReadSchema
pruning (reads every column) — reported, not fatal, because a few
queries legitimately consume whole rows.

Usage: python tools/plan_audit.py [sf_dir]
Exit 1 on any violation; prints a per-query summary.

tests/test_plan_audit.py runs this in-process on a sample each suite
run; CI-grade full audits run it standalone.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

# Queries whose plans are EXPECTED to contain Arrow Python stages.
ARROW_ALLOWED = {
    # t-digest / sketch folds (numpy centroid merges)
    "agg_p95_tdigest",
    "agg_p95_tdigest_rollup",
    # partition-local numpy passes by design: per-series sequential
    # folds (Theil–Sen pair median, Holt–Winters recursion) over
    # COLLAPSED hourly series — Arrow batches, no row-at-a-time
    # Python.  (skyline_docs left this list in r4: its 2-D fast path
    # is a pure JVM sweep, no Arrow stages.)
    "metric_trend_theilsen",
    "metric_forecast_holtwinters",
    # same Holt–Winters per-series recursion, run twice for the MAE
    # bake-off against the gap-safe seasonal-naive baseline
    "metric_backtest_hw_vs_snaive",
    # block-matmul similarity / ANN / clustering families
    # (iterative operators like connected components, pagerank, BPE
    # and k-means TRAINING materialize their Python stages through
    # localCheckpoint/driver loops, so their FINAL plan is Arrow-free
    # and they are intentionally absent here)
    "dedup_embedding",
    # threshold-calibration sweep consumes the same block-matmul
    # exact pair generator as dedup_embedding (one histogram pass
    # over its output)
    "dedup_threshold_sweep",
    # (ann_recall_report left this list in r6: it now materializes its
    # ≤4-row report eagerly so its caches release, so the RETURNED
    # plan is a local relation — the Arrow work runs inside the build)
    # leave-one-out kNN vote: broadcast eval-sample matmul + per-row
    # top-k/vote in numpy (the JVM all-pairs formulation measured
    # 59-84 s at sf0.1 vs 0.9 s — plans/similarity.py r4 note)
    "embedding_knn_accuracy",
    # real stdlib-wave decode + numpy frame-RMS segmentation per clip
    # (r9 VAD): Arrow-batched binary payloads in, segment rows out —
    # the multimodal decode seam, same class as media_image_features
    "media_audio_vad",
    # nearest-centroid eval: per-partition int64 centroid partials +
    # broadcast L×d matmul assignment (the unrolled-JVM formulation
    # measured 7.3 s at sf0.1 vs 1.1 s — r6; exactness unchanged,
    # every sum is an integer)
    "embedding_centroid_accuracy",
    "dedup_semantic",
    "dedup_semantic_cells",
    "ann_ivf",
    "ann_ivf_kmeans",
    "ann_ivf_cells",
    "ann_pq",
    "ann_ivfpq",
    "ann_mmr",
    "embedding_pca",
    # pca_project's Arrow matmul (numpy batch projection) feeds the
    # lazily-cached joined raw+whitened relation; the r11 switch from
    # eager localCheckpoint to cache() keeps that lineage in the
    # returned plan (it briefly left this list while the relation was
    # checkpoint-truncated)
    "embedding_whiten_eval",
    # zlib / media (CPU-bound Python by nature)
    "text_compress_ratio",
    "media_image_features",
    # Space-Saving sketch partials
    "text_topk_sketch",
    # EWMA backfill (order-dependent pandas fold by design)
    "metric_ewma",
    # LTTB greedy downsampling (sequential per collapsed series)
    "metric_downsample_lttb",
    # first-fit-decreasing packing (sequential fold per shard)
    "pack_bins_ffd",
}

_PY_ARROW_MARKS = (
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "AggregateInPandas",
)

# Queries whose plans legitimately contain an UNPARTITIONED Window
# node: every entry windows a relation that is bounded by construction
# (never corpus-proportional), per the justification on its line.
# The distributed-rank histogram windows (operators/rank.py) are
# auto-allowed by their _grk_bucket marker and do not appear here.
UNPARTITIONED_WINDOW_ALLOWED = {
    # ---- histogram / bucket-table cumsums (≤ #buckets rows) ----
    "events_pareto_deciles",   # 10-row decile rollup cumulative share
    "revenue_lorenz_deciles",  # 10-row decile cumsum (rank itself is
                               # distributed via operators/rank.py)
    "dedup_threshold_sweep",   # 20-bin similarity histogram cumsum
    "orders_benford",          # 9-row first-digit histogram total
    "corpus_mannwhitney",      # rank-from-histogram over the bounded
                               # distinct-e0-length CDF per source
    "corpus_heaps_law",       # ≤ _HEAPS_K(10)-row decile-table cumsum
                               # over the lazily-cached kagg relation —
                               # bounded by ntile construction; the
                               # cache (vs the earlier localCheckpoint)
                               # keeps the window visible in the plan
    # ---- per-group aggregates of bounded cardinality ----
    "sample_budget_mix",       # water-filling over |sources| rows
    "orders_backlog",          # month-grid backlog (≤ #months rows)
    "orders_littles_law",      # same month-grid cumsum (r9)
    "events_cumulative_users", # running total over ≤ #days rows
    "events_ab_sprt",          # cumulative experiment monitor over
                               # the ≤ #days daily table (r11)
    "split_temporal_leakage",  # boundary percentile cumsum over the
                               # ≤ #days daily table (r11)
    "funnel_window_depth",     # reach cumsum over ≤ 4 depth levels
    "revenue_share_hierarchy", # share-of-total over |nations| rollup
    "events_survival_hazard",  # at-risk walk over ≤ #duration-day
                               # rows (span-bounded aggregate)
    # ---- documented algorithmic sweeps ----
    "skyline_docs",            # phase-2 dominance sweep over the
                               # partition-local Pareto survivors
                               # (frontier-sized by design; see
                               # plans/pipeline_ops.q_skyline_docs)
}


def _bracket_group_list(s: str) -> list[str]:
    """Top-level [...] groups in a formatted-plan Arguments line."""
    depth = 0
    groups: list[str] = []
    cur: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                cur = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _tree_nodes(plan: str) -> list[tuple[int, str, str, int]]:
    """Parse the formatted plan's tree header into preorder
    (indent, name, raw_line, node_id) tuples."""
    import re

    nodes: list[tuple[int, str, str, int]] = []
    in_tree = False
    for line in plan.splitlines():
        if line.startswith("== Physical Plan =="):
            in_tree = True
            continue
        if not in_tree:
            continue
        if not line.strip():
            break
        m = re.match(r"([ :+|-]*)([A-Za-z][A-Za-z0-9_ ]*?)\s*\((\d+)\)", line)
        if not m:
            break
        indent = len(m.group(1))
        name = m.group(2).split()[0]
        nodes.append((indent, name, line, int(m.group(3))))
    return nodes


def _group_limited(plan: str, node_id: int) -> bool:
    """True when the Window node's input is bounded by construction:
    walking its subtree in the tree header (through pass-through
    Sort/Exchange/Project/Filter nodes, and through broadcast joins
    via the STREAMED side — the build side is driver-memory-bounded
    by the broadcast contract, so it can't make a bounded streamed
    side corpus-proportional) reaches a WindowGroupLimit (Spark's
    rank-filter pushdown — every partition pre-limited to k rows), a
    TakeOrderedAndProject (distributed top-k), or a GlobalLimit /
    CollectLimit (``.limit(k)`` — exactly k rows), so the single-task
    window sees a bounded relation — not a scale cliff."""
    _PASS = {
        "Sort", "Exchange", "Project", "Filter",
        "AQEShuffleRead", "ColumnarToRow",
    }
    _BOUNDED = {
        "WindowGroupLimit", "TakeOrderedAndProject",
        "GlobalLimit", "CollectLimit",
    }
    _BCAST_JOINS = {"BroadcastHashJoin", "BroadcastNestedLoopJoin"}
    nodes = _tree_nodes(plan)
    by_id = {nid: i for i, (_, _, _, nid) in enumerate(nodes)}

    def kids(i: int) -> list[int]:
        d = nodes[i][0]
        out: list[int] = []
        child_d = None
        for j in range(i + 1, len(nodes)):
            dj = nodes[j][0]
            if dj <= d:
                break
            if child_d is None:
                child_d = dj
            if dj == child_d:
                out.append(j)
        return out

    def walk(i: int) -> bool:
        _, name, raw, _ = nodes[i]
        if name in _BOUNDED:
            return True
        ks = kids(i)
        if name in _PASS and len(ks) == 1:
            return walk(ks[0])
        if name in _BCAST_JOINS and len(ks) == 2:
            streamed = ks[0] if "BuildRight" in raw else ks[1]
            return walk(streamed)
        return False

    start = by_id.get(node_id)
    if start is None:
        return False
    ks = kids(start)
    return len(ks) == 1 and walk(ks[0])


def unpartitioned_windows(plan: str) -> list[str]:
    """Arguments lines of Window nodes whose spec has NO partition
    columns AND whose input is not already bounded.

    A Window node prints up to three top-level bracket groups:
    [exprs], [partitionSpec], [orderSpec] — partition-only and
    order-only specs both print two, so the order group is told apart
    by its ASC/DESC markers. Excluded as bounded-by-construction:
    windows carrying the operators/rank.py marker columns (bucket
    histograms, ≤ #buckets rows) and windows whose streamed subtree
    is limit-bounded (WindowGroupLimit / TakeOrderedAndProject /
    GlobalLimit — see _group_limited)."""
    import re

    out: list[str] = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        m = re.fullmatch(r"\((\d+)\) Window", line.strip())
        if not m:
            continue
        for j in range(i + 1, min(i + 6, len(lines))):
            if not lines[j].startswith("Arguments: "):
                continue
            args = lines[j]
            if "_grk_" in args or "_gcs_" in args:
                break  # distributed rank/cumsum histogram — bounded
            groups = _bracket_group_list(args[len("Arguments: "):])
            if len(groups) >= 3:
                break  # explicit partition spec
            if len(groups) == 2 and not re.search(
                r" (ASC|DESC) ", groups[1]
            ):
                break  # partition-only spec (no ORDER BY)
            if _group_limited(plan, int(m.group(1))):
                break
            out.append(args)
            break
    return out


def audit(sf_dir: str, names=None) -> list[str]:
    from monasca_aggregator_spark.registry import all_queries
    from monasca_aggregator_spark.session import get_spark

    spark = get_spark("plan-audit")
    queries = all_queries()
    problems: list[str] = []
    unpruned: list[str] = []
    for name, fn in queries.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 - report, don't mask
            problems.append(f"{name}: plan build failed: {exc}")
            continue
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if "BatchEvalPython" in plan:
            problems.append(f"{name}: BatchEvalPython (row-at-a-time)")
        if any(m in plan for m in _PY_ARROW_MARKS):
            if name not in ARROW_ALLOWED:
                problems.append(
                    f"{name}: unexpected Arrow Python stage "
                    "(add to ARROW_ALLOWED only if justified)"
                )
        elif name in ARROW_ALLOWED:
            # allowlist hygiene: entries that no longer need Arrow
            # should be removed so the fence stays tight
            problems.append(
                f"{name}: on ARROW_ALLOWED but plan has no Arrow stage"
            )
        unpart = unpartitioned_windows(plan)
        if unpart and name not in UNPARTITIONED_WINDOW_ALLOWED:
            problems.append(
                f"{name}: unpartitioned Window over a non-histogram "
                f"relation (single-task sort at scale): {unpart[0][:160]}"
            )
        elif not unpart and name in UNPARTITIONED_WINDOW_ALLOWED:
            problems.append(
                f"{name}: on UNPARTITIONED_WINDOW_ALLOWED but plan has "
                "no unpartitioned Window (remove to keep the fence tight)"
            )
        if "ReadSchema" in plan and "ReadSchema: struct<>" in plan:
            unpruned.append(name)
    if unpruned:
        print(f"note: empty ReadSchema (count-only scans): {unpruned}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = set(sys.argv[2:]) or None
    problems = audit(sf_dir, names)
    for p in problems:
        print(f"VIOLATION {p}")
    n = "all" if names is None else len(names)
    print(f"plan audit over {n} queries: {len(problems)} violations")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
