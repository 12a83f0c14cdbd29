"""VERDICT r11 #7: settle the sf0.1 flatness question at a bigger
volume — run the top-N benched queries on the ×8 soak replica
(tools/soak_scale.py, disjoint shifted-key universes) at BOTH core
counts and record the 8-core/32-core wall ratio per query. A ratio
near 1 at ×8 volume would be a genuine parallelism ceiling; ratios
well above 1 confirm the sf0.1 flatness was overhead-domination.

Usage: SPARK_GRAFT_CPUS=8|32 python tools/scaling_x8.py out.json
Writes {query: best_of_3_sec} for the fixed query list.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

# top benched queries by honest (clearCache) sf0.1 cost, mixed
# families so the ratio table covers scans, self-joins, windows,
# Arrow passes and iterative ops
QUERIES = [
    "ann_recall_report", "dedup_simhash_estimate", "image_dhash_dedup",
    "graph_jaccard_linkpred", "graph_richclub", "graph_pagerank_exact",
    "graph_adamic_adar", "graph_link_prediction", "dedup_incremental",
    "dedup_minhash_estimate", "dedup_semantic", "copurchase_cosine_topk",
    "dedup_jaccard_prefix", "graph_kcore", "audit_referential",
    "graph_triangles", "basket_association_lift", "text_ppmi_svd",
    "dedup_incremental_near", "langid_calibration", "text_tfidf",
    "dedup_spans", "dedup_minhash", "text_search_bm25", "tpch_q3",
]


def main() -> int:
    out_path = sys.argv[1]
    from monasca_aggregator_spark.registry import all_queries
    from monasca_aggregator_spark.session import get_spark

    spark = get_spark("scaling-x8")
    sys.path.insert(0, str(_REPO / "tools"))
    import soak_scale

    soak_dir = "/tmp/soak_x8"
    soak_scale.BASE = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    soak_scale.build_replica(spark, soak_dir, 8)
    qs = all_queries()
    for name in QUERIES:  # warm-up at the small SF
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception as exc:  # pragma: no cover
            print(f"# warm {name}: {exc}", file=sys.stderr)
    res = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, soak_dir).count()
            best = min(best, time.time() - t0)
        res[name] = round(best, 3)
        print(f"# {name}: {best:.3f}", file=sys.stderr)
    payload = {
        "parallelism": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
        "queries": res,
    }
    Path(out_path).write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
