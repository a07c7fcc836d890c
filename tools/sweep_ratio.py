#!/usr/bin/env python3
"""Emit the sf1/sf0.1 per-query wall-time ratio table for NOTES.md.

Usage: tools/sweep_ratio.py <bench_sf0.1.json> <bench_sf1.json> [ratio_flag]

Both inputs are graft.Bench full-JSON lines (first line of the
SPARK_GRAFT_BENCH_OUT file). Prints a markdown table of every query with
its sf0.1 time, sf1 time, and ratio, sorted by ratio descending, flagging
ratios above `ratio_flag` (default 15 — the super-linear-residue bar from
the round-11 verdict). Queries under 0.2 s at sf0.1 are floored to 0.2 s
for the ratio (per-query fixed overhead dominates below that; a 0.05->0.9 s
"18x" is scheduling noise, not an algorithmic residue) — the raw times are
printed either way so nothing is hidden.
"""
import json, sys

flag = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
small = json.loads(open(sys.argv[1]).readline())
big = json.loads(open(sys.argv[2]).readline())
qs, qb = small["queries"], big["queries"]
FLOOR = 0.2

rows = []
for name in sorted(qb):
    a, b = qs.get(name), qb.get(name)
    if a is None or b is None:
        rows.append((float("inf"), name, a, b))
        continue
    rows.append((b / max(a, FLOOR), name, a, b))

rows.sort(key=lambda r: -r[0])
over = [r for r in rows if r[0] > flag]
print(f"| query | sf0.1 s | sf1 s | ratio |")
print(f"|---|---|---|---|")
for ratio, name, a, b in rows:
    mark = " **(>%g×)**" % flag if ratio > flag and ratio != float("inf") else ""
    fa = "FAIL" if a is None else f"{a:.2f}"
    fb = "FAIL" if b is None else f"{b:.2f}"
    fr = "—" if ratio == float("inf") else f"{ratio:.1f}×"
    print(f"| {name}{mark} | {fa} | {fb} | {fr} |")
print()
print(f"{len(over)} queries above {flag}x; totals: "
      f"sf0.1 {sum(v for v in qs.values() if v):.1f} s, "
      f"sf1 {sum(v for v in qb.values() if v):.1f} s, "
      f"aggregate ratio "
      f"{sum(v for v in qb.values() if v)/sum(v for v in qs.values() if v):.1f}x")
