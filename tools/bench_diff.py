"""Per-query regression diff between two bench JSON records.

The driver writes BENCH_r{N}.json each round; this prints the queries
whose wall time moved more than a threshold between two records (or
appeared/disappeared), so a perf regression is a diff line, not a
guess. Accepts either the raw one-line bench.py output or the
driver's wrapper record ({"parsed": {...}}).

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold_ratio]
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    # driver wrapper or raw line
    line = next(
        (ln for ln in text.splitlines() if ln.startswith('{"metric"')),
        None,
    )
    d = json.loads(line if line else text)
    if "parsed" in d and d["parsed"]:
        d = d["parsed"]
    return d


def main() -> None:
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old.get("queries", {}), new.get("queries", {})
    # driver-wrapper records only carry the worst-5 in `queries`; the
    # real total rides in `n_queries` (VERDICT r7 nit #2)
    on = old.get("n_queries", len(oq))
    nn = new.get("n_queries", len(nq))
    print(
        f"total: {old.get('value')}s -> {new.get('value')}s "
        f"({on} -> {nn} queries"
        + (
            f", per-query detail for {len(oq)} -> {len(nq)})"
            if (on, nn) != (len(oq), len(nq))
            else ")"
        )
    )
    rows = []
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            rows.append((float("inf"), f"+ {name:32} NEW {nq[name]:.2f}s"))
        elif name not in nq:
            rows.append((float("inf"), f"- {name:32} GONE (was {oq[name]:.2f}s)"))
        else:
            a, b = oq[name], nq[name]
            ratio = b / a if a > 0 else float("inf")
            if ratio >= thresh or ratio <= 1 / thresh:
                mark = "▲" if ratio > 1 else "▼"
                rows.append(
                    (ratio, f"{mark} {name:32} {a:.2f}s -> {b:.2f}s ({ratio:.1f}x)")
                )
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)
    if not rows:
        print(f"no per-query moves beyond {thresh}x")


if __name__ == "__main__":
    main()
