#!/usr/bin/env python3
"""Diff two Bench JSON lines (e.g. BENCH_r1.json vs a local run): per-query
delta sorted by regression, plus totals. Development tool (driver-side env).

Usage: python3 tools/bench_compare.py <old.json> <new.json>
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            rows.append((float("inf"), f"{name:32s} NEW      {b:8.2f}s"))
        elif b is None:
            rows.append((float("-inf"), f"{name:32s} REMOVED {a:8.2f}s"))
        else:
            rows.append((b - a, f"{name:32s} {a:8.2f}s -> {b:8.2f}s  ({b - a:+.2f}s)"))
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)
    print(f"\ntotal: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] - old['value']:+.1f}s)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
