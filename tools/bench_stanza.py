"""Emit the SURVEY §6 refresh stanza from BENCH_FULL.json — the
numbers-bearing sentence is generated from the same file the driver
records, so the doc and the bench can't drift (VERDICT r4/r5 nit
class: §6 said 203/107.2 s while the file said 205/111.1 s).

Usage: python tools/bench_stanza.py [round_tag]
Prints the stanza skeleton to stdout; prose context (host factor,
perf-work notes) is added by hand around the emitted numbers.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "rN"
    full = json.loads((_REPO / "BENCH_FULL.json").read_text())
    q = full["queries"]
    n = len(q)
    total = round(sum(q.values()), 1)
    worst = sorted(q.items(), key=lambda kv: -kv[1])[:5]
    worst_s = ", ".join(f"{k} {v:.1f} s" for k, v in worst)
    proto = full.get("protocol", "warm_best_of_3").replace("_", " ")
    lines = [
        f"**{tag} refresh (local[32]):** {n} headline queries at "
        f"sf{full.get('sf')} in **{total} s {proto}** "
        f"(BENCH_FULL.json; worst-5: {worst_s}).",
    ]
    if "engine_sec" in full:
        lines.append(
            f"Engine stanza {full['engine_sec']} s + calibration "
            f"gates {full['gates_sec']} s; host canary tpch_q1 "
            f"{full.get('host_canary_tpch_q1_sec')} s."
        )
    soak = full.get("soak")
    if soak:
        # each entry's GATE metric: pair-normalized queries gate on
        # ratio_per_pair, everything else on the (median) raw ratio
        ratios = {
            k: v.get(
                "ratio_median_of_3",
                v.get("ratio_per_pair", v.get("ratio")),
            )
            for k, v in soak["queries"].items()
            if "ratio" in v
        }
        if ratios:
            wk, wv = max(ratios.items(), key=lambda kv: kv[1])
            exceeded = [
                k
                for k, v in soak["queries"].items()
                if "ratio" in v
                and "expected_max" in v
                and ratios[k] > v["expected_max"]
            ]
            lines.append(
                f"Soak ×{soak['factor']}: worst gate value {wv} "
                f"({wk}); expected-ratio gate exceeded: "
                f"{exceeded if exceeded else 'none'}."
            )
    if "--counts" in sys.argv:
        import subprocess

        sys.path.insert(0, str(_REPO))
        from monasca_aggregator_spark import registry

        q = registry.all_queries()
        o = registry.all_oracles()
        collected = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/",
             "--collect-only", "-q"],
            capture_output=True, text=True, cwd=_REPO,
        ).stdout.strip().splitlines()
        n_tests = next(
            (ln for ln in reversed(collected) if "test" in ln), "?"
        )
        lines.append(
            f"Registry: {len(q)} queries / {len(o)} oracle-backed / "
            f"{len(q) - len(o)} rows-only; pytest: {n_tests}."
        )
        # Suite-count convention (VERDICT r9 #3): if a saved full-run
        # log exists (pytest tests/ -q | tee PYTEST_LAST.txt), emit
        # its verbatim summary as "X passed / Y skipped of Z
        # collected (kafka file included)" so §6 can't drift from a
        # real run.
        last = _REPO / "PYTEST_LAST.txt"
        if last.exists():
            import re

            txt = last.read_text()
            m_pass = re.search(r"(\d+) passed", txt)
            m_skip = re.search(r"(\d+) skipped", txt)
            m_coll = re.search(r"collected (\d+) items", txt)
            if m_pass:
                p = int(m_pass.group(1))
                s = int(m_skip.group(1)) if m_skip else 0
                z = int(m_coll.group(1)) if m_coll else p + s
                lines.append(
                    f"Suite: {p} passed / {s} skipped of {z} "
                    f"collected (kafka file included; PYTEST_LAST.txt)."
                )
    print(" ".join(lines))
    return 0


if __name__ == "__main__":
    sys.exit(main())
