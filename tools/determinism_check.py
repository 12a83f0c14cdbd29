"""Partitioning-determinism harness: every oracle-backed query must
produce the IDENTICAL normalized value hash under different shuffle
partitioning (32 vs 7 partitions — different parallelism, different
partial-aggregation and window-feed order).

This is the failure class that breaks the driver's oracle hashes
without failing any single-run test: float summation order, window
ties without a total order, arbitrary first()/limit() picks. A query
that hashes differently across partitionings is nondeterministic and
WILL eventually mismatch its oracle.

Usage: python tools/determinism_check.py [sf_dir] [query ...]
(defaults: sf0.01, every oracle-backed query)
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import __spark_entry__ as entrymod  # noqa: E402
from monasca_aggregator_spark.session import get_spark  # noqa: E402


def _norm_hash(rows, columns) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            elif isinstance(v, bool):
                v = str(int(v))
            vals.append(str(v))
        lines.append("\x1f".join(vals))
    lines.sort()
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries = entrymod.queries()
    oracle_keys = set(entrymod.oracle_sql())
    names = sys.argv[2:] or [k for k in queries if k in oracle_keys]

    spark = get_spark("determinism")
    hashes: dict[str, dict[int, str]] = {}
    for parts in (32, 7):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        spark.catalog.clearCache()
        for name in names:
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            h = _norm_hash([tuple(r) for r in df.collect()], df.columns)
            hashes.setdefault(name, {})[parts] = h
            print(
                f"{name:32} parts={parts:3} {h[:12]} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
    bad = [n for n, hs in hashes.items() if len(set(hs.values())) != 1]
    if bad:
        print(f"NONDETERMINISTIC under repartitioning: {bad}")
        sys.exit(1)
    print(f"{len(names)} queries hash-stable across partitionings")


if __name__ == "__main__":
    main()
