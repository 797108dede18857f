#!/usr/bin/env bash
# The standing sf1 scale gate (round 18 — one command, run once per round):
# 10x the bench scale through the real entry points. Generates the sf1
# parquet if absent, benches the gate query set, writes BENCH_SF1.json,
# and flags super-linear drift against the committed sf0.1 full-suite run.
#
# Gate set = the top-20 sf0.1-heaviest queries (the round-17 selection)
# PLUS the known sf1-sensitive rows that sf0.1 cost ranking misses:
# dd_editdist_pairs (id-expansion output scaling) and the whole mm_*
# family (per-row codec work — both round-18 finds lived here).
#
# Usage: tools/sf1_gate.sh            (from the repo root)
#        SUPRA=14 tools/sf1_gate.sh   (override the drift threshold)
set -euo pipefail
cd "$(dirname "$0")/.."

# the _complete sentinel (not bare dir-exists) distinguishes a full
# generation from a GEN_TABLES partial one into the same path
[ -f target/testdata/sf1/_complete ] || python3 tools/gen_sf1.py

# Round 19 (advisor finding): the top-20 is RE-DERIVED from the current
# BENCH_FULL.json on every run — reading it back from BENCH_SF1.json (the
# gate's own output) froze the selection after the first run, so a query
# that became sf0.1-heavy in a later round never entered the sf1 gate.
# The previous BENCH_SF1.json query list is UNIONED in so known
# sf1-sensitive rows that drop out of the top-20 stay gated.
TOP20=$(python3 -c 'import json; q=json.load(open("BENCH_FULL.json"))["queries"]; print(",".join(sorted(sorted(q, key=lambda k: -q[k])[:20])))')
PREV=$(python3 -c 'import json; print(",".join(sorted(json.load(open("BENCH_SF1.json"))["queries"])))' 2>/dev/null) || PREV=""
MM=$(python3 -c 'import json; print(",".join(sorted(k for k in json.load(open("BENCH_FULL.json"))["queries"] if k.startswith("mm_"))))')
GATE=$(python3 -c "print(','.join(sorted(set(filter(None, '$TOP20,$PREV,$MM,dd_editdist_pairs'.split(','))))))")

SPARK_GRAFT_SF_DIR="$PWD/target/testdata/sf1" \
SPARK_GRAFT_BASELINE=/dev/null \
SPARK_GRAFT_OUT=BENCH_SF1.json \
SPARK_GRAFT_ONLY="$GATE" \
  sbt -batch 'runMain graft.Bench' 2>&1 | grep '"metric"' | head -1

python3 tools/sf1_compare.py BENCH_SF1.json BENCH_FULL.json "${SUPRA:-12}"
