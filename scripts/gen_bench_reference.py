#!/usr/bin/env python3
"""Regenerate bench_reference.json — the committed per-query
reference-time table BenchSchedule's r17 levers consume (first-sweep
ascending-cost order, load-factor fit estimates, per-query watchdog).

Usage: gen_bench_reference.py OUT.json ARTIFACT.json [ARTIFACT.json ...]

Each artifact is a graft.Bench output line (or a file whose first
parseable JSON line is one). The reference for a query is the MIN ok
run time observed across all given artifacts — the quiet-host
approximation. Degraded-window artifacts are safe inputs: a min can
only improve, never inflate. Queries absent everywhere are simply
omitted (BenchSchedule treats them as new rows)."""
import json
import sys


def per_query_min(path):
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            for q, runs in d.get("runs", {}).items():
                ok = [r for r in runs if isinstance(r, (int, float)) and r >= 0]
                if ok:
                    out[q] = min(out.get(q, float("inf")), min(ok))
            for q, v in d.get("queries", {}).items():
                if isinstance(v, (int, float)) and v >= 0:
                    out[q] = min(out.get(q, float("inf")), v)
    return out


def main():
    out_path, arts = sys.argv[1], sys.argv[2:]
    best = {}
    for a in arts:
        for q, v in per_query_min(a).items():
            best[q] = min(best.get(q, float("inf")), v)
    with open(out_path, "w") as f:
        f.write("{\n")
        items = sorted(best.items())
        for i, (q, v) in enumerate(items):
            comma = "," if i < len(items) - 1 else ""
            f.write(f'  "{q}": {round(v, 3)}{comma}\n')
        f.write("}\n")
    print(f"wrote {len(best)} reference times to {out_path}")


if __name__ == "__main__":
    main()
