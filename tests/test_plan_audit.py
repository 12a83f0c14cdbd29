"""In-suite slice of tools/plan_audit.py: the full registry audit runs
standalone (~2 min); each suite run audits a representative sample —
one hot-path query per family plus one ARROW_ALLOWED member of each
kind — so a BatchEvalPython or stray Arrow-stage regression in the
common builders fails fast."""

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
}


def test_sampled_plan_audit(sf_small):
    problems = plan_audit.audit(sf_small, SAMPLE)
    assert not problems, "\n".join(problems)
