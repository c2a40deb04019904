#!/usr/bin/env python3
"""Compare two Bench JSON lines (BENCH_r{N}.json) query by query.

Usage: python3 tools/bench_compare.py PREV.json CURR.json [--threshold 1.3]

Prints per-query deltas sorted worst-first and flags regressions above the
threshold; p50_top5 entries (3-rep medians for the most expensive queries)
are compared when both files carry them — the min-of-reps table is noisy,
the p50 table is what a regression claim should cite.
"""
import json, sys

threshold = 1.3
argv = sys.argv[1:]
args = []
i = 0
while i < len(argv):
    if argv[i] == "--threshold":
        threshold = float(argv[i + 1])
        i += 2
    else:
        args.append(argv[i])
        i += 1
if len(args) != 2:
    sys.exit(__doc__)

def load(path):
    """Accept either a raw Bench line or the driver's BENCH_r{N}.json wrapper
    (which embeds the line inside a 'tail' text field)."""
    doc = json.load(open(path))
    if "queries" in doc:
        return doc
    tail = doc.get("tail", "")
    start = tail.rfind('{"metric"')
    if start < 0:
        sys.exit(f"{path}: no bench line found")
    end = tail.find("\n", start)
    return json.loads(tail[start:end if end > 0 else len(tail)])


prev = load(args[0])
curr = load(args[1])


def compare(tag, p, c):
    rows = []
    for q in sorted(set(p) & set(c)):
        ratio = c[q] / p[q] if p[q] > 0 else float("inf")
        rows.append((ratio, q, p[q], c[q]))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > threshold]
    print(f"== {tag}: {len(rows)} shared queries, {len(flagged)} over {threshold}x ==")
    for ratio, q, pv, cv in rows[:10]:
        mark = " <-- REGRESSION" if ratio > threshold else ""
        print(f"  {q:32s} {pv:8.3f}s -> {cv:8.3f}s  ({ratio:5.2f}x){mark}")
    only_new = sorted(set(c) - set(p))
    if only_new:
        print(f"  new queries: {', '.join(only_new)}")
    return flagged


flagged = compare("queries (min-of-reps)", prev.get("queries", {}), curr.get("queries", {}))
if "p50_top5" in prev and "p50_top5" in curr:
    flagged += compare("p50_top5 (3-rep medians)", prev["p50_top5"], curr["p50_top5"])

print(f"\ntotal: {prev.get('value', 0):.1f}s -> {curr.get('value', 0):.1f}s")
sys.exit(1 if flagged else 0)
