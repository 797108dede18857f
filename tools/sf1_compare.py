#!/usr/bin/env python3
"""Compare a BENCH_SF1 run (top-20 heaviest queries at sf1) against the
committed sf0.1 full-suite run, flagging super-linear rows.

Usage: python3 tools/sf1_compare.py BENCH_SF1.json [BENCH_FULL.json]
The data is 10x, so a ratio around <=10 is linear-or-better; rows past
SUPRA (default 12, i.e. 10x + spread) deserve investigation.
"""
import json
import sys

sf1 = json.load(open(sys.argv[1]))
base = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BENCH_FULL.json"))
supra = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0

rows = []
for q, t1 in sorted(sf1["queries"].items()):
    t0 = base["queries"].get(q)
    if t0 is None or t0 <= 0 or t1 <= 0:
        rows.append((q, t0, t1, None))
    else:
        rows.append((q, t0, t1, t1 / t0))

print(f"| query | sf0.1 s | sf1 s | ratio (10x data) |")
print(f"|---|---|---|---|")
flagged = []
for q, t0, t1, r in sorted(rows, key=lambda x: -(x[3] or 0)):
    rs = f"{r:.1f}x" if r else "n/a"
    print(f"| {q} | {t0 if t0 else '?'} | {t1:.2f} | {rs} |")
    if r and r > supra:
        flagged.append((q, r))
print()
if flagged:
    print(f"SUPER-LINEAR (> {supra}x on 10x data): " +
          ", ".join(f"{q} {r:.1f}x" for q, r in flagged))
else:
    print(f"all rows <= {supra}x on 10x data — linear or better")
