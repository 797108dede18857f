#!/usr/bin/env python3
"""Generate an sf1 dataset (10x sf0.1) for the scale gate — dev tooling
only (the engine never reads this code; pyspark/duckdb/pyarrow are the
driver-side toolchain).

Output: target/testdata/sf1/*.parquet (gitignored; ~10x sf0.1 volume).

Scaling model, table by table:
  - region/nation: fixed dimensions, copied verbatim (TPC-H semantics).
  - customer/supplier/part/orders/lineitem: 10 copies with consistent
    key offsets (copy i shifts every FK by i*max(table key)), so
    referential integrity holds and join/agg volume grows 10x.
    Attribute values repeat across copies — fine for a volume gate.
  - events: 10 copies; event_id offset, ts shifted per copy by the full
    original span (+1 day) so the user base stays fixed while history
    grows 10x — per-user sessions/retention state deepens, the honest
    way an events table grows.
  - documents: copies 1..9 are SYNTHESIZED (frequency-weighted word
    sampling per source doc, numpy seeded per copy) rather than
    duplicated: a verbatim or rotated copy would make every doc a
    9-way near-duplicate and blow the dd_*/tp_* pair queries up
    super-linearly BY CONSTRUCTION, which would invalidate the gate.
    Word-frequency and doc-length distributions are preserved;
    lang/source carry over from the source doc.
  - embeddings: copies 1..9 perturb each source vector with Gaussian
    noise of magnitude equal to the vector's norm, renormalized to the
    original norm (cosine to the source ~0.7 — below every near-dup
    threshold, so sim_* pair counts grow ~linearly), keeping the
    cluster-ish geometry and the label distribution.
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/testdata/sf1"
COPIES = int(os.environ.get("GEN_COPIES", "10"))
# GEN_TABLES=embeddings,documents generates only those tables (round 19:
# the sf10 step needs a real 100x embeddings parquet without paying for
# a 60M-row lineitem or the documents synthesis loop). Default: all.
TABLES = set(os.environ.get("GEN_TABLES", "all").split(","))


def want(name):
    return "all" in TABLES or name in TABLES


os.makedirs(DST, exist_ok=True)

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")


# Row-group sizing: a single giant row group serializes the whole
# table behind ONE Spark scan task (splits are byte ranges, but a
# reader only takes row groups whose midpoint falls in its range) —
# the first full-suite sf1 run measured every doc-map-bound query at
# ~10x because the 50k-doc table was one row group. Real tables ship
# as many files/row groups; mirror that.
ROW_GROUP = {"documents": 2048, "embeddings": 2048}


def write_like(name, query, tbl=None):
    """Run `query` (over {src} views) and write DST/name.parquet cast to
    the SOURCE schema, so Tables.requireSchema and the events ts
    encoding (timestamp[us], NTZ) survive generation."""
    if not want(name):
        return
    src_schema = pq.read_schema(f"{SRC}/{name}.parquet")
    if tbl is None:
        tbl = con.sql(query).arrow()
    cols = [tbl.column(f.name).cast(f.type) for f in src_schema]
    out = pa.table(cols, schema=pa.schema([(f.name, f.type) for f in src_schema]))
    pq.write_table(out, f"{DST}/{name}.parquet", compression="snappy",
                   row_group_size=ROW_GROUP.get(name, 65536))
    print(f"  {name}: {out.num_rows} rows")


for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

print(f"generating {DST} ({COPIES}x {SRC})")

# fixed dims
for t in ["region", "nation"]:
    write_like(t, f"SELECT * FROM {t}")

# offset stride = max + 1: ids start at 0, so a bare max collides the
# last id of copy i with the first id of copy i+1 (caught by the PQ
# unique-id guard on the first sf1 bench run)
maxes = {k: con.sql(s).fetchone()[0] + 1 for k, s in {
    "C": "SELECT max(c_custkey) FROM customer",
    "S": "SELECT max(s_suppkey) FROM supplier",
    "P": "SELECT max(p_partkey) FROM part",
    "O": "SELECT max(o_orderkey) FROM orders",
    "E": "SELECT max(event_id) FROM events",
    "D": "SELECT max(doc_id) FROM documents",
    "V": "SELECT max(vec_id) FROM embeddings",
}.items()}
span_days = con.sql(
    "SELECT date_diff('day', min(ts), max(ts)) + 1 FROM events").fetchone()[0]

copies = f"(SELECT unnest(range({COPIES})) AS n) i"

write_like("customer", f"""
  SELECT c_custkey + i.n*{maxes['C']} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment FROM customer, {copies}""")
write_like("supplier", f"""
  SELECT s_suppkey + i.n*{maxes['S']} AS s_suppkey, s_name, s_nationkey,
         s_acctbal FROM supplier, {copies}""")
# p_name gets a per-copy suffix: verbatim-duplicated names make the
# fuzzy-linkage query's name->id fan-out grow with copies SQUARED (a
# generator artifact, not a data property — real 10x growth brings
# mostly NEW names), and the suffix keeps the distinct-name set, and
# so the Levenshtein verify, scaling ~linearly instead
write_like("part", f"""
  SELECT p_partkey + i.n*{maxes['P']} AS p_partkey,
         CASE WHEN i.n = 0 THEN p_name
              ELSE p_name || ' c' || i.n::varchar END AS p_name,
         p_brand, p_type, p_size, p_retailprice FROM part, {copies}""")
write_like("orders", f"""
  SELECT o_orderkey + i.n*{maxes['O']} AS o_orderkey,
         o_custkey + i.n*{maxes['C']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders, {copies}""")
write_like("lineitem", f"""
  SELECT l_orderkey + i.n*{maxes['O']} AS l_orderkey,
         l_partkey + i.n*{maxes['P']} AS l_partkey,
         l_suppkey + i.n*{maxes['S']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM lineitem, {copies}""")
write_like("events", f"""
  SELECT event_id + i.n*{maxes['E']} AS event_id,
         ts + to_days((i.n*{span_days})::int) AS ts,
         user_id, event_type, value, props
  FROM events, {copies}""")

# ---- documents: synthesized copies ------------------------------------
if want("documents"):
    rows = con.sql(
        "SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id"
    ).fetchall()
    pool = []
    lengths = []
    for _, text, _, _ in rows:
        ws = text.split()
        pool.extend(ws)
        lengths.append(len(ws))
    pool = np.array(pool, dtype=object)
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    for did, text, lang, source in rows:  # copy 0: originals
        doc_ids.append(did); texts.append(text)
        langs.append(lang); sources.append(source); n_chars.append(len(text))
    for i in range(1, COPIES):
        rng = np.random.default_rng(42_000 + i)
        for (did, _, lang, source), ln in zip(rows, lengths):
            words = rng.choice(pool, size=max(1, ln))
            t = " ".join(words.tolist())
            doc_ids.append(did + i * maxes["D"]); texts.append(t)
            langs.append(lang); sources.append(source); n_chars.append(len(t))
    src_schema = pq.read_schema(f"{SRC}/documents.parquet")
    doc_tbl = pa.table({
        "doc_id": pa.array(doc_ids), "text": pa.array(texts),
        "lang": pa.array(langs), "source": pa.array(sources),
        "n_chars": pa.array(n_chars)})
    doc_tbl = pa.table([doc_tbl.column(f.name).cast(f.type) for f in src_schema],
                       schema=pa.schema([(f.name, f.type) for f in src_schema]))
    pq.write_table(doc_tbl, f"{DST}/documents.parquet", compression="snappy",
                   row_group_size=ROW_GROUP["documents"])
    print(f"  documents: {doc_tbl.num_rows} rows")

# ---- embeddings: perturbed copies -------------------------------------
if want("embeddings"):
    emb = con.sql(
        "SELECT vec_id, embedding, label FROM embeddings ORDER BY vec_id"
    ).fetchall()
    vecs = np.array([e[1] for e in emb], dtype=np.float64)
    ids = np.array([e[0] for e in emb])
    labels = np.array([e[2] for e in emb])
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    out_ids, out_vecs, out_labels = [ids], [vecs], [labels]
    for i in range(1, COPIES):
        rng = np.random.default_rng(77_000 + i)
        g = rng.standard_normal(vecs.shape)
        g = g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-12) * norms
        v = vecs + g
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12) * norms
        out_ids.append(ids + i * maxes["V"])
        out_vecs.append(v)
        out_labels.append(labels)
    src_schema = pq.read_schema(f"{SRC}/embeddings.parquet")
    emb_tbl = pa.table({
        "vec_id": pa.array(np.concatenate(out_ids)),
        "embedding": pa.array(
            [r.astype(np.float32) for v in out_vecs for r in v],
            type=pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(out_labels))})
    emb_tbl = pa.table([emb_tbl.column(f.name).cast(f.type) for f in src_schema],
                       schema=pa.schema([(f.name, f.type) for f in src_schema]))
    pq.write_table(emb_tbl, f"{DST}/embeddings.parquet", compression="snappy",
                   row_group_size=ROW_GROUP["embeddings"])
    print(f"  embeddings: {emb_tbl.num_rows} rows")

# Completeness sentinel (round 19): only a FULL generation stamps it —
# a GEN_TABLES partial run into the same DST must not make dir-exists
# consumers (tools/sf1_gate.sh) treat the directory as a complete
# dataset.
if "all" in TABLES:
    with open(f"{DST}/_complete", "w") as f:
        f.write(f"copies={COPIES} src={SRC}\n")
print("done")
