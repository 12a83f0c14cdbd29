"""Dump `.explain("formatted")` for named queries to plans/r11/.

Usage: python tools/dump_plans.py TAG query [query ...]
       python tools/dump_plans.py --sf DIR TAG query ...
Plan build only — no execution (queries that run bounded driver jobs
at build time still run those).
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    tag, names = args[0], args[1:]

    from monasca_aggregator_spark.registry import all_queries
    from monasca_aggregator_spark.session import get_spark

    spark = get_spark("dump-plans")
    queries = all_queries()
    out_dir = _REPO / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            print(f"{name}: FAILED {exc}", file=sys.stderr)
            continue
        p = out_dir / f"{name}_{tag}.txt"
        p.write_text(text)
        n_ex = text.count("Exchange")
        print(
            f"{name}: {p.name} exchanges~{n_ex} "
            f"smj={text.count('SortMergeJoin')} "
            f"bhj={text.count('BroadcastHashJoin')} "
            f"arrow={text.count('ArrowEvalPython') + text.count('MapInPandas') + text.count('FlatMapGroupsInPandas')}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
