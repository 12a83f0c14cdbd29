"""Local replica of the driver's DuckDB-oracle correctness harness.

Runs every __spark_entry__.queries() entry at a given SF, runs the
matching oracle_sql() through DuckDB on the same parquet, and compares
row count, sorted column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import __spark_entry__ as entrymod  # noqa: E402
from monasca_aggregator_spark.session import get_spark  # noqa: E402
from monasca_aggregator_spark.sources.tables import TABLES  # noqa: E402


def _normalize(rows: list[tuple], columns: list[str]) -> str:
    """Order-insensitive hash over column-name-sorted values."""
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
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark("check-correctness")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only rows={len(srows)} ({dt:.1f}s)")
            continue
        orel = con.sql(oracles[name])
        ocols = orel.columns
        orows = orel.fetchall()
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            sh, oh = _normalize(srows, scols), _normalize(orows, ocols)
            if sh != oh:
                problems.append(f"hash spark={sh} oracle={oh}")
        if problems:
            failures += 1
            print(f"{name:24s} FAIL {'; '.join(problems)} ({dt:.1f}s)")
            _debug_diff(srows, scols, orows, ocols)
        else:
            print(f"{name:24s} OK rows={len(srows)} ({dt:.1f}s)")
    spark.stop()
    return 1 if failures else 0


def _debug_diff(srows, scols, orows, ocols, limit: int = 5) -> None:
    if sorted(scols) != sorted(ocols):
        return
    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])

    def norm(rows, order):
        out = set()
        for row in rows:
            out.add(
                tuple(
                    f"{row[i]:.9g}" if isinstance(row[i], float) else str(row[i])
                    for i in order
                )
            )
        return out

    s, o = norm(srows, sorder), norm(orows, oorder)
    for r in list(s - o)[:limit]:
        print("   spark-only:", r)
    for r in list(o - s)[:limit]:
        print("   oracle-only:", r)


if __name__ == "__main__":
    sys.exit(main())
