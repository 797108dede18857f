#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
(separately), then compare each query's parquet output against the DuckDB
oracle SQL on the same tables. Rows sorted, columns sorted by name, floats
rounded to 6 significant digits before comparison."""
import json, math, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        if v == 0: return "0"
        return f"{v:.6g}"
    if isinstance(v, bool): return str(int(v))
    return str(v)

def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq): continue
    files = glob.glob(f"{pq}/*.parquet")
    if not files:
        fails.append((name, "no parquet output")); continue
    sdf = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
    scols = [d[0] for d in sdf.description]; srows = sdf.fetchall()
    if name not in oracle:
        skips.append((name, len(srows))); continue
    try:
        odf = con.execute(oracle[name])
        ocols = [d[0] for d in odf.description]; orows = odf.fetchall()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    sc, sr = canon_rows(scols, srows)
    oc, orr = canon_rows(ocols, orows)
    if sc != oc:
        fails.append((name, f"schema mismatch spark={sc} oracle={oc}"))
    elif sr != orr:
        diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
        fails.append((name, f"rows: spark={len(sr)} oracle={len(orr)} first_diffs={diff}"))
    else:
        passes.append((name, len(sr)))

for n, c in passes: print(f"PASS {n} ({c} rows)")
for n, c in skips: print(f"SKIP {n} (rows-only: {c} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass, {len(skips)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)
