#!/usr/bin/env python3
"""Compare a BENCH_SF1 run (top-20 heaviest queries at sf1) against the
committed sf0.1 full-suite run, flagging super-linear rows.

Usage: python3 tools/sf1_compare.py BENCH_SF1.json [BENCH_FULL.json]
The data is 10x, so a ratio around <=10 is linear-or-better; rows past
SUPRA (default 12, i.e. 10x + spread) deserve investigation.

Round 19: the sf0.1 denominator uses the ADJUDICATED value when the
run carries one — a contended official number inflates the denominator
and HIDES super-linear rows (r18's sim_ann_join read 8.5x against a
0.608 contended denominator; the honest 0.323 quiet value reads ~14x).
And rows that are DECLARED EXACT at full probe carry their own
cost-model bound instead of the linear one: sim_ann_join runs nprobe =
nlist by declaration (so the DuckDB oracle can replay it brute-force),
which is |A| x |B| = 100x work for 10x data BY CONSTRUCTION — the
bounded-nprobe production form is the `ann_join_cross` soak shape
(7.6x at the top decade). Such a row only flags past its own model.
"""
import json
import sys

# query -> (bound, reason): declared-exact rows whose cost model is not
# linear in the data. Bound chosen at cost-model + spread; a row past
# even this is a real defect, not the declared trade.
DECLARED_EXACT = {
    "sim_ann_join": (30.0, "full probe by declaration (nprobe = nlist): "
                           "|A| x |B| work, 100x for 10x data by "
                           "construction; production form is bounded "
                           "nprobe (ann_join_cross soak, 7.6x/decade)"),
}

sf1 = json.load(open(sys.argv[1]))
base = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BENCH_FULL.json"))
supra = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0

adj = base.get("adjudicated", {})

rows = []
for q, t1 in sorted(sf1["queries"].items()):
    t0 = adj.get(q, base["queries"].get(q))
    if t0 is None or t0 <= 0 or t1 <= 0:
        rows.append((q, t0, t1, None))
    else:
        rows.append((q, t0, t1, t1 / t0))

print(f"| query | sf0.1 s | sf1 s | ratio (10x data) |")
print(f"|---|---|---|---|")
flagged = []
for q, t0, t1, r in sorted(rows, key=lambda x: -(x[3] or 0)):
    bound = DECLARED_EXACT.get(q, (supra, None))[0]
    note = " (declared exact)" if q in DECLARED_EXACT else ""
    rs = f"{r:.1f}x{note}" if r else "n/a"
    print(f"| {q} | {t0 if t0 else '?'} | {t1:.2f} | {rs} |")
    if r and r > bound:
        flagged.append((q, r, bound))
print()
if flagged:
    print("SUPER-LINEAR (past per-row bound): " +
          ", ".join(f"{q} {r:.1f}x (bound {b:.0f}x)" for q, r, b in flagged))
    sys.exit(1)
else:
    print(f"all rows within bounds (linear rows <= {supra}x on 10x data; "
          "declared-exact rows within their cost model)")
