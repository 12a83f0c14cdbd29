"""Per-query optimization profiler (r11/r12 optimization rounds).

Times one or more registry queries standalone under the bench protocol
(sf0.001 warm-up pass, warm best-of-3 of `.count()` at the target SF,
clearCache() before every timed run — the r12 protocol) and optionally
dumps `.explain("formatted")` to plans/<round>/<query>_<tag>.txt so
before/after plan evidence can be committed.

Usage:
  python tools/profile_query.py [--explain TAG] [--sf DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--explain",
        default=None,
        help="write plans/<round>/<query>_<TAG>.txt with explain('formatted')",
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--round", default="r12", help="plans/<round>/ target dir")
    args = ap.parse_args()

    from monasca_aggregator_spark.registry import all_queries
    from monasca_aggregator_spark.session import get_spark

    spark = get_spark("profile-query")
    queries = all_queries()

    plans_dir = _REPO / "plans" / args.round
    if args.explain:
        plans_dir.mkdir(parents=True, exist_ok=True)

    warm_dir = "/root/testdata/sf0.001"
    for name in args.queries:
        fn = queries[name]
        try:
            fn(spark, warm_dir).count()
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        runs = []
        n = 0
        for _ in range(args.runs):
            # r12 protocol (VERDICT r11 #1): every timed run starts from
            # an empty cache so lazy cache() can't amortize across runs.
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn(spark, args.sf).count()
            runs.append(time.time() - t0)
        best = min(runs)
        print(
            f"{name}: best {best:.3f}s runs="
            f"[{', '.join(f'{r:.3f}' for r in runs)}] rows={n}"
        )
        if args.explain:
            df = fn(spark, args.sf)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = plans_dir / f"{name}_{args.explain}.txt"
            out.write_text(text)
            print(f"  plan -> {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
