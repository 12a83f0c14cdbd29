"""Count base-table FileScans per benched query's INITIAL physical plan.

A query whose plan scans the same big parquet table N>1 times is a
multi-consumer re-scan candidate (guide §2.4) — unless the duplicate
subtree sits under an InMemoryRelation (cached: executes once).

Usage: python tools/scan_census.py [sf_dir] [min_scans]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    min_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import bench
    from monasca_aggregator_spark.registry import all_queries
    from monasca_aggregator_spark.session import get_spark

    spark = get_spark("scan-census")
    queries = all_queries()
    rows = []
    for name in bench.BENCH_QUERIES:
        try:
            df = queries[name](spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}", file=sys.stderr)
            continue
        # formatted explain: "Scan parquet [cols]" nodes reference the
        # location; count per table directory name
        tables = re.findall(r"Location:.*?/(\w+)\.parquet", text)
        c = Counter(tables)
        hot = {t: n for t, n in c.items() if n >= min_scans}
        if hot:
            inmem = text.count("InMemoryRelation")
            rows.append((sum(hot.values()), name, dict(c), inmem))
        # keep the cache registry from accumulating across 300 queries
        spark.catalog.clearCache()
    rows.sort(reverse=True)
    for total, name, c, inmem in rows:
        print(f"{name:38s} {c} inmem={inmem}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
