"""Bench protocol A/B (VERDICT r11 #1): measure the size of the r11
cache-amortization artifact by timing every BENCH_QUERIES query under
BOTH protocols in one session, same tree, back to back:

  pass 1 ("r11 protocol"): warm best-of-3, NO clearCache — lazy
    cache() intermediates persist across the 3 runs and across
    queries, so the reported min excludes materialization of every
    cached subtree (and identical-lineage relations leak work across
    queries).
  pass 2 ("r12 protocol"): warm best-of-3 with
    spark.catalog.clearCache() before EVERY timed run — every run
    pays its full cost from the parquet inputs.

Pass order means pass 2 runs in a warmer session (JIT, parquet footer
caches), which can only UNDERSTATE the amortization delta — the
direction of the bias is safe for the conclusion.

Writes tools/../BENCH_PROTOCOL_AB.json with per-query pairs and the
two totals. Run with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as usual.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> int:
    from bench import BENCH_QUERIES

    from monasca_aggregator_spark.registry import all_queries
    from monasca_aggregator_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-protocol-ab")
    queries = all_queries()

    warm_dir = "/root/testdata/sf0.001"
    for name in BENCH_QUERIES:
        try:
            queries[name](spark, warm_dir).count()
        except Exception as exc:  # pragma: no cover
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    def _pass(clear: bool) -> dict[str, float]:
        spark.catalog.clearCache()
        out: dict[str, float] = {}
        for name in BENCH_QUERIES:
            fn = queries[name]
            best = float("inf")
            for _ in range(3):
                if clear:
                    spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            out[name] = round(best, 3)
            print(f"# {'clear' if clear else 'noclr'} {name}: {best:.3f}",
                  file=sys.stderr)
        return out

    old = _pass(clear=False)
    new = _pass(clear=True)
    per = {
        k: {
            "no_clearcache_sec": old[k],
            "clearcache_sec": new[k],
            "delta_sec": round(new[k] - old[k], 3),
        }
        for k in old
    }
    worst = dict(
        sorted(per.items(), key=lambda kv: -kv[1]["delta_sec"])[:20]
    )
    payload = {
        "sf_dir": sf_dir,
        "parallelism": spark.sparkContext.defaultParallelism,
        "total_no_clearcache_sec": round(sum(old.values()), 3),
        "total_clearcache_sec": round(sum(new.values()), 3),
        "worst_20_amortized": worst,
        "per_query": per,
    }
    (_REPO / "BENCH_PROTOCOL_AB.json").write_text(
        json.dumps(payload, indent=1)
    )
    print(json.dumps({k: payload[k] for k in (
        "total_no_clearcache_sec", "total_clearcache_sec", "parallelism"
    )}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
