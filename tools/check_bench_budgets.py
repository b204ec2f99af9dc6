#!/usr/bin/env python3
"""Per-query wall-time budget gate over a Bench artifact — the
PlanAudit pattern applied to time: machinery creep in a query (a train
or index rebuild sneaking into a serving gate) becomes a red exit code
instead of a verdict trend-line.

Usage:
  check:  python3 tools/check_bench_budgets.py target/bench.json
  record: python3 tools/check_bench_budgets.py target/bench.json --record

Budgets live in tools/bench_budgets.txt as "<query> <budget_seconds>".
The check compares each query's MIN across passes (queries_min — the
closest observable to intrinsic cost on a contended host; the
BASELINE.md round-7 rule) against its budget. Violations:
  - a query in the artifact with no recorded budget (new queries must
    be budgeted when they land);
  - min-of-passes over budget.
A budgeted query missing from the artifact is reported but not fatal
(partial bench runs are a normal local workflow).

--record writes budgets from the artifact with headroom
max(2.5 * min, min + 1.0) rounded up to 0.1 s — generous enough that
host jitter never trips it, tight enough that re-attaching a multi-
second train to a serving query does.
"""
import json
import math
import sys

BUDGETS = "tools/bench_budgets.txt"


def load_budgets(path):
    budgets = {}
    try:
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if not ln or ln.startswith("#"):
                    continue
                name, sec = ln.rsplit(" ", 1)
                budgets[name] = float(sec)
    except FileNotFoundError:
        pass
    return budgets


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    art = json.load(open(sys.argv[1]))
    mins = art.get("queries_min") or art.get("queries")
    if not mins:
        print("[budget] artifact has no queries_min/queries map")
        return 2
    record = "--record" in sys.argv[2:]
    if record:
        lines = ["# Bench per-query budget: <query> <max min-of-passes seconds>",
                 "# Regenerate from a QUIET-HOST artifact with:",
                 "#   python3 tools/check_bench_budgets.py target/bench.json --record"]
        for name in sorted(mins):
            b = max(2.5 * mins[name], mins[name] + 1.0)
            lines.append(f"{name} {math.ceil(b * 10) / 10:.1f}")
        with open(BUDGETS, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"[budget] recorded {len(mins)} budgets to {BUDGETS}")
        return 0
    budgets = load_budgets(BUDGETS)
    if not budgets:
        print(f"[budget] no budgets at {BUDGETS} — record first")
        return 1
    violations = []
    for name in sorted(mins):
        if name not in budgets:
            violations.append(f"{name}: no recorded budget "
                              "(budget new queries when they land)")
        elif mins[name] > budgets[name]:
            violations.append(f"{name}: min-of-passes {mins[name]:.3f}s "
                              f"> budget {budgets[name]:.1f}s")
    for name in sorted(budgets):
        if name not in mins:
            print(f"[budget] note: {name} budgeted but absent from artifact")
    for v in violations:
        print(f"[budget] VIOLATION {v}")
    print(f"[budget] {len(mins)} queries checked, "
          f"{len(violations)} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
