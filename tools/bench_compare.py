#!/usr/bin/env python3
"""Dev tool: diff two Bench JSON lines (files containing the {"metric":...}
line) and print per-query deltas sorted by regression size.

Usage: python3 tools/bench_compare.py old.json new.json [threshold_pct]
"""
import json, sys


def load(p):
    s = open(p).read().strip()
    return json.loads(s[s.index("{"):])


old, new = load(sys.argv[1]), load(sys.argv[2])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s")
rows = []
for q in sorted(set(old["queries"]) | set(new["queries"])):
    a, b = old["queries"].get(q), new["queries"].get(q)
    if a is None or b is None:
        rows.append((float("inf"), f"{q:30s} {'ADDED' if a is None else 'REMOVED'}"))
    else:
        pct = (b - a) / a * 100 if a else 0.0
        if abs(pct) >= thr:
            rows.append((-pct, f"{q:30s} {a:6.2f} -> {b:6.2f}  ({pct:+.0f}%)"))
for _, line in sorted(rows):
    print(line)
