#!/usr/bin/env bash
# 4-way concurrency chaos over the sf1 gate set (round 18): same query
# list as tools/sf1_gate.sh, run dedicated then through a 4-thread pool
# in ONE session, flagging any query whose FINAL adaptive plan changes
# shape (broadcast demotion, coalesce collapse, agg fallback) under the
# multi-tenant posture. Writes CHAOS_SF1.json.
set -euo pipefail
cd "$(dirname "$0")/.."
[ -d target/testdata/sf1 ] || python3 tools/gen_sf1.py
GATE=$(python3 -c 'import json; print(",".join(sorted(json.load(open("BENCH_SF1.json"))["queries"])))')
SPARK_GRAFT_SF_DIR="$PWD/target/testdata/sf1" SPARK_GRAFT_ONLY="$GATE" \
  sbt -batch 'runMain graft.Chaos' 2>&1 | grep -E '"metric":"chaos"|\[chaos\]'
