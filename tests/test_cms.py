"""Count-Min sketch (operators/cms.py): never-undercount guarantee,
error bound, merge algebra, and the broadcast probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.text import tokens
from monasca_aggregator_spark.operators.cms import (
    cms_estimate,
    cms_merge,
    count_min_table,
)
from monasca_aggregator_spark.sources.tables import load_table
from tests.conftest import SF_SMALL, explain_str


def _corpus_tokens(spark):
    docs = load_table(spark, SF_SMALL, "documents", fan_out=True)
    return docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")


def test_cms_never_undercounts_and_bounds_error(spark):
    tok = _corpus_tokens(spark).select("token")
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("true_c"))
    sketch = count_min_table(tok, "token", width=1024, depth=4)
    est = cms_estimate(sketch, exact, "token", width=1024, depth=4)
    joined = est.join(exact, "token").collect()
    n_total = sum(r.true_c for r in joined)
    assert all(r.est_count >= r.true_c for r in joined)  # CMS invariant
    # ε = e/w bound with prob 1-δ; empirically the overwhelming majority
    # of keys must sit within 2·N/w of truth
    bound = 2.0 * n_total / 1024
    bad = [r for r in joined if r.est_count - r.true_c > bound]
    assert len(bad) <= max(2, 0.01 * len(joined))


def test_cms_sketch_is_bounded(spark):
    tok = _corpus_tokens(spark).select("token")
    sketch = count_min_table(tok, "token", width=64, depth=3)
    rows = sketch.collect()
    assert len(rows) <= 64 * 3
    assert {r.d for r in rows} <= {0, 1, 2}
    total = tok.count()
    per_depth = {}
    for r in rows:
        per_depth[r.d] = per_depth.get(r.d, 0) + r.c
    # every depth row sees every insertion exactly once
    assert all(v == total for v in per_depth.values())


def test_cms_merge_equals_sketch_of_union(spark):
    tok = _corpus_tokens(spark)
    a = tok.filter(F.col("doc_id") % 2 == 0).select("token")
    b = tok.filter(F.col("doc_id") % 2 == 1).select("token")
    merged = cms_merge(
        count_min_table(a, "token", width=256, depth=3),
        count_min_table(b, "token", width=256, depth=3),
    )
    direct = count_min_table(tok.select("token"), "token", width=256, depth=3)
    m = {(r.d, r.bucket): r.c for r in merged.collect()}
    d = {(r.d, r.bucket): r.c for r in direct.collect()}
    assert m == d


def test_cms_probe_broadcasts_sketch(spark):
    tok = _corpus_tokens(spark).select("token")
    sketch = count_min_table(tok, "token")
    probes = tok.distinct()
    plan = explain_str(cms_estimate(sketch, probes, "token"))
    assert "BroadcastHashJoin" in plan
