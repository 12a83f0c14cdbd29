"""Scale soak: replicate the test tables ×N (keys shifted so join
cardinalities scale linearly) and run registry queries at ×1 and ×N.

This is the "would the plan survive 100×?" check at the largest scale
the host affords: per-query wall time should scale ~linearly in rows
for scans/aggs and stay shuffle-bound (not blow up quadratically or
hit a single-partition bottleneck) for joins/windows.

Usage: python tools/soak_scale.py [factor] [query ...]
Writes replicated parquet to /tmp/soak_x{factor} once (reused across
runs), prints one line per query: name, rows, ×1 time, ×N time, ratio.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
DEFAULT_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q18",
    "agg_rollup",
    "agg_multi_rule",
    "moving_avg_user",
    "events_daily_user",
    "range_join_ship",
    "pack_chunks",
]

# key columns shifted by replica × stride so FK relations replicate
# (each replica is a disjoint, internally-consistent universe)
_SHIFT = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
_STRIDE = 100_000_000


def build_replica(spark, out_dir: str, factor: int) -> None:
    from monasca_aggregator_spark.sources.tables import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = Path(BASE) / f"{t}.parquet"
        if not src.exists():
            continue
        dst = Path(out_dir) / f"{t}.parquet"
        if dst.exists():
            continue
        df = load_table(spark, BASE, t)
        shifts = _SHIFT.get(t, ())
        if shifts:
            parts = []
            for i in range(factor):
                part = df
                for c in shifts:
                    part = part.withColumn(
                        c, F.col(c) + F.lit(i * _STRIDE)
                    )
                parts.append(part)
            rep = parts[0]
            for p in parts[1:]:
                rep = rep.unionByName(p)
        else:
            rep = df  # dims without keys to shift stay as-is
        rep.write.mode("overwrite").parquet(str(dst))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = sys.argv[2:] or DEFAULT_QUERIES
    out_dir = f"/tmp/soak_x{factor}"

    from monasca_aggregator_spark.registry import all_queries
    from monasca_aggregator_spark.session import get_spark

    spark = get_spark("soak")
    build_replica(spark, out_dir, factor)
    queries = all_queries()

    print(f"{'query':24} {'rows_xN':>10} {'x1_s':>7} {'xN_s':>7} {'ratio':>6}")
    for name in only:
        # queries that cache (multi_rule) would otherwise accumulate
        # cached relations across the run and skew later timings
        spark.catalog.clearCache()
        fn = queries[name]
        fn(spark, BASE).count()  # warm both plans
        t0 = time.time()
        fn(spark, BASE).count()
        t1 = time.time()
        n = fn(spark, out_dir).count()
        t2 = time.time()
        base_s, rep_s = t1 - t0, t2 - t1
        ratio = rep_s / base_s if base_s > 0 else float("inf")
        print(
            f"{name:24} {n:>10} {base_s:>7.2f} {rep_s:>7.2f} {ratio:>6.1f}"
        )


if __name__ == "__main__":
    main()
