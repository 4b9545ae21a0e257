#!/usr/bin/env python3
"""100x graph-scale fixture generator (driver-side tooling, like
gen_scale.py — round-11 verdict directive #7).

Builds a directory whose LINEITEM and EVENTS are REPLICAS disjoint-key
copies of the source's (l_orderkey/l_partkey/l_suppkey and
event_id/user_id offset by 10M per replica), so the co-purchase /
part-supplier graphs the iterative family reads (q169 k-core, q184
weighted PageRank, q217 HITS, q227 BFS) become REPLICAS isolated
components: edge counts, per-round join volume and peel work scale
exactly REPLICAS x with ZERO cross-replica edges (gen_scale.py's
no-cross-talk contract, pushed to 100x), while round counts stay fixed
by the component-identical structure. Every other table copies as-is
(q227's seed suppliers s_suppkey<=3 live in replica 0 — a fixed-seed
BFS on a 100x graph is the honest workload: constant frontier, 100x
edge table per hop).

DuckDB does the replication (vectorized cross join with range(R),
streaming parquet write) — the pylist loops in gen_scale.py do not
survive 60M rows.

Usage: python3 tools/gen_scale_graph.py [SRC] [DST] [REPLICAS]
Defaults: /root/testdata/sf0.1 /tmp/sf10graph 100
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10graph"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 100
OFF = 10_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
  COPY (
    SELECT l_orderkey + r.r * {OFF} AS l_orderkey,
           l_partkey  + r.r * {OFF} AS l_partkey,
           l_suppkey  + r.r * {OFF} AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate
    FROM read_parquet('{SRC}/lineitem.parquet')
    CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
    ORDER BY r.r
  ) TO '{DST}/lineitem.parquet' (FORMAT parquet)
""")
n = con.execute(
    f"SELECT count(*) FROM read_parquet('{DST}/lineitem.parquet')"
).fetchone()[0]
print(f"lineitem: {n} rows")

con.execute(f"""
  COPY (
    SELECT event_id + r.r * {OFF} AS event_id, ts,
           user_id + r.r * {OFF} AS user_id, event_type, value, props
    FROM read_parquet('{SRC}/events.parquet')
    CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
    ORDER BY r.r
  ) TO '{DST}/events.parquet' (FORMAT parquet)
""")
n = con.execute(
    f"SELECT count(*) FROM read_parquet('{DST}/events.parquet')"
).fetchone()[0]
print(f"events: {n} rows")

for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "documents", "embeddings"):
    shutil.copyfile(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(DST, f"{t}.parquet"))
    print(f"{t}: copied")
print(f"done: {DST} at {REPLICAS}x")
