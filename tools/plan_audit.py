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
    # recall gate: measures lsh/ivf/kmeans/pq AS SHIPPED, and the
    # kmeans assignment + PQ codebook paths are Arrow by design
    "ann_recall_report",
    # leave-one-out kNN vote: broadcast eval-sample matmul + per-row
    # top-k/vote in numpy (the JVM all-pairs formulation measured
    # 59-84 s at sf0.1 vs 0.9 s — plans/similarity.py r4 note)
    "embedding_knn_accuracy",
    "dedup_semantic",
    "dedup_semantic_cells",
    "ann_ivf",
    "ann_ivf_kmeans",
    "ann_ivf_cells",
    "ann_pq",
    "ann_mmr",
    "embedding_pca",
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
