#!/usr/bin/env python3
"""sf1 generator: 10x keyed blowup of /root/testdata/sf0.1 -> /tmp/sf1.

FK-consistent key offsets per copy k=0..9 (every copy's keyspace is
disjoint, joins stay 1:1 with the original fan-out). documents get a
per-copy WORD-PREFIX transform: token distributions WITHIN a copy are
identical to the original corpus (SimHash distances / shingle overlap /
quality scores preserved), token sets ACROSS copies are disjoint (no
artificial cross-copy near-dup collision regime — round-12 BASELINE
records the constant-filler-token first attempt that compressed SimHash
distances and exploded banded candidates 22x before this form replaced
it). embeddings get per-(vec,dim,copy) pseudo-noise so copies are
decorrelated in cosine space.

Usage: python3 tools/gen_sf1.py [src] [out] [K]
"""
import duckdb, sys, time

t0 = time.time()
src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute("PRAGMA threads=24")
def q(s): con.execute(s)

for t in ["region", "nation"]:
    q(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

mx = {}
for t, k in [("part", "p_partkey"), ("supplier", "s_suppkey"),
             ("customer", "c_custkey"), ("orders", "o_orderkey"),
             ("events", "event_id"), ("events", "user_id"),
             ("documents", "doc_id"), ("embeddings", "vec_id")]:
    mx[k] = con.sql(f"SELECT max({k})+1 FROM '{src}/{t}.parquet'").fetchone()[0]

rep = f"(SELECT unnest(range({K})) AS k)"
q(f"""COPY (SELECT p_partkey + k*{mx['p_partkey']} AS p_partkey, p_name, p_brand,
  p_type, CAST(p_size AS INT) AS p_size, p_retailprice
  FROM '{src}/part.parquet', {rep}) TO '{out}/part.parquet' (FORMAT PARQUET)""")
q(f"""COPY (SELECT s_suppkey + k*{mx['s_suppkey']} AS s_suppkey, s_name,
  s_nationkey, s_acctbal FROM '{src}/supplier.parquet', {rep})
  TO '{out}/supplier.parquet' (FORMAT PARQUET)""")
q(f"""COPY (SELECT c_custkey + k*{mx['c_custkey']} AS c_custkey, c_name,
  c_nationkey, c_acctbal, c_mktsegment FROM '{src}/customer.parquet', {rep})
  TO '{out}/customer.parquet' (FORMAT PARQUET)""")
q(f"""COPY (SELECT o_orderkey + k*{mx['o_orderkey']} AS o_orderkey,
  o_custkey + k*{mx['c_custkey']} AS o_custkey, o_orderstatus, o_totalprice,
  o_orderdate, o_orderpriority FROM '{src}/orders.parquet', {rep})
  TO '{out}/orders.parquet' (FORMAT PARQUET)""")
q(f"""COPY (SELECT l_orderkey + k*{mx['o_orderkey']} AS l_orderkey,
  l_partkey + k*{mx['p_partkey']} AS l_partkey,
  l_suppkey + k*{mx['s_suppkey']} AS l_suppkey,
  l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, l_shipdate FROM '{src}/lineitem.parquet', {rep})
  TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
q(f"""COPY (SELECT event_id + k*{mx['event_id']} AS event_id, ts,
  user_id + k*{mx['user_id']} AS user_id, event_type, value, props
  FROM '{src}/events.parquet', {rep}) TO '{out}/events.parquet' (FORMAT PARQUET)""")
# word-PREFIX per copy (see module doc)
q(f"""COPY (SELECT doc_id + k*{mx['doc_id']} AS doc_id,
  CASE WHEN k=0 THEN text
       ELSE regexp_replace(text, '([^ ]+)', 'c' || k || '\\1', 'g') END AS text,
  lang, source,
  length(CASE WHEN k=0 THEN text
       ELSE regexp_replace(text, '([^ ]+)', 'c' || k || '\\1', 'g') END) AS n_chars
  FROM '{src}/documents.parquet', {rep})
  TO '{out}/documents.parquet' (FORMAT PARQUET)""")
q(f"""COPY (SELECT vec_id + k*{mx['vec_id']} AS vec_id,
  CASE WHEN k=0 THEN embedding ELSE
    list_transform(list_zip(embedding, range(1, len(embedding)+1)),
      x -> CAST(x[1] + ((hash(vec_id*131 + x[2]*31 + k) % 1000) / 1000.0 - 0.5) * 0.2 AS FLOAT))
  END AS embedding, label
  FROM '{src}/embeddings.parquet', {rep}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
print("done", round(time.time() - t0, 1), "s")
for t in ["lineitem", "documents", "embeddings", "events"]:
    print(t, con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0])
