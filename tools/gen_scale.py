#!/usr/bin/env python3
"""Scale-up fixture generator (driver-side tooling, like check.py).

Builds an sf1-style directory from /root/testdata/sf0.1 by replicating the
two LLM-pipeline tables 10x in a way that keeps the WORKLOAD structure
scaling linearly, so wall-time ratios measure the ENGINE's scaling, not an
accidental change in problem shape:

- documents: replica r keeps replica 0's text verbatim for r=0 and suffixes
  every whitespace token with "~r<r>" for r>0 ("~" keeps a base token from
  ever colliding with a suffixed one; an explicit vocabulary-disjointness
  assert backs that up). Within a replica the near-dup/containment/shingle
  structure is IDENTICAL to sf0.1; across replicas token sets are disjoint,
  so shingle/minhash/containment pair counts scale exactly 10x (no
  O(replicas^2) cross-talk). doc_id offsets by 10M per replica; n_chars
  recomputed.
- embeddings: replica 0 verbatim; replicas r>0 are fresh seeded unit-norm
  64-dim Gaussians (the fixture's own distribution — BASELINE.md documents
  it as near-random), labels uniform over the same 0..9 space. vec_id
  offsets by 10M. Cell/bucket populations thus grow ~10x, which is the
  documented Sigma-block^2 stress the scale-up run is meant to expose.
- every other table is copied as-is (the heavy family doesn't read them;
  copying keeps the directory a drop-in SPARK_GRAFT_SF_DIR).

Deterministic: fixed seeds, no timestamps. Output defaults to /tmp/sf1.
"""
import os
import re
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFFSET = 10_000_000

os.makedirs(DST, exist_ok=True)

# documents ----------------------------------------------------------------
d = pq.read_table(os.path.join(SRC, "documents.parquet"))
doc_id = d.column("doc_id").to_pylist()
text = d.column("text").to_pylist()
lang = d.column("lang").to_pylist()
source = d.column("source").to_pylist()

base_vocab = set()
for t in text:
    base_vocab.update(t.split())

ids, texts, langs, sources, nchars = [], [], [], [], []
for r in range(REPLICAS):
    if r == 0:
        rep = text
    else:
        suf = f"~r{r}"
        rep = [re.sub(r"(\S+)", lambda m: m.group(1) + suf, t) for t in text]
        clash = {w + suf for w in base_vocab} & base_vocab
        assert not clash, (
            f"replica {r}: suffixed tokens collide with base vocabulary "
            f"(pair counts would scale super-linearly): {sorted(clash)[:5]}"
        )
    ids.extend(i + r * OFFSET for i in doc_id)
    texts.extend(rep)
    langs.extend(lang)
    sources.extend(source)
    nchars.extend(len(t) for t in rep)

pq.write_table(
    pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(nchars, pa.int64()),
        }
    ),
    os.path.join(DST, "documents.parquet"),
)
print(f"documents: {len(ids)} rows")

# embeddings ---------------------------------------------------------------
e = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
vec_id = np.array(e.column("vec_id").to_pylist(), dtype=np.int64)
emb = np.array(e.column("embedding").to_pylist(), dtype=np.float32)
label = np.array(e.column("label").to_pylist(), dtype=np.int32)
n, dim = emb.shape

all_ids, all_emb, all_lab = [vec_id], [emb], [label]
for r in range(1, REPLICAS):
    rng = np.random.default_rng(424200 + r)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    all_ids.append(vec_id + r * OFFSET)
    all_emb.append(v.astype(np.float32))
    all_lab.append(rng.integers(0, 10, size=n).astype(np.int32))

ids_a = np.concatenate(all_ids)
emb_a = np.concatenate(all_emb)
lab_a = np.concatenate(all_lab)
pq.write_table(
    pa.table(
        {
            "vec_id": pa.array(ids_a, pa.int64()),
            "embedding": pa.array(list(emb_a), pa.list_(pa.float32())),
            "label": pa.array(lab_a, pa.int32()),
        }
    ),
    os.path.join(DST, "embeddings.parquet"),
)
print(f"embeddings: {len(ids_a)} rows")

# lineitem -----------------------------------------------------------------
# Replicated with DISJOINT key spaces per replica (orderkey/partkey/suppkey
# all offset), so the basket/co-purchase/shipment graphs are REPLICAS hard
# copies with zero cross-replica edges: co-purchase edge counts, k-core
# peel work (q169), weighted-PageRank graph size (q184) and triple volume
# (q185) all scale exactly REPLICAS x — the same no-cross-talk contract as
# the documents table above.
li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
li_cols = {c: li.column(c).to_pylist() for c in li.schema.names}
out_cols = {c: [] for c in li.schema.names}
for r in range(REPLICAS):
    off = r * OFFSET
    for c, vals in li_cols.items():
        if c in ("l_orderkey", "l_partkey", "l_suppkey"):
            out_cols[c].extend(v + off for v in vals)
        else:
            out_cols[c].extend(vals)
pq.write_table(
    pa.table({c: pa.array(out_cols[c], li.schema.field(c).type)
              for c in li.schema.names}),
    os.path.join(DST, "lineitem.parquet"),
)
print(f"lineitem: {len(out_cols['l_orderkey'])} rows")

# events -------------------------------------------------------------------
# Replicated with offset user_id/event_id (timestamps kept): REPLICAS x
# users with identical per-user timelines — sessionization, interval
# merge (q189), debounce (q190) and attribution scale linearly with
# per-key work unchanged.
ev = pq.read_table(os.path.join(SRC, "events.parquet"))
ev_cols = {c: ev.column(c).to_pylist() for c in ev.schema.names}
out_ev = {c: [] for c in ev.schema.names}
for r in range(REPLICAS):
    off = r * OFFSET
    for c, vals in ev_cols.items():
        if c in ("user_id", "event_id"):
            out_ev[c].extend(v + off for v in vals)
        else:
            out_ev[c].extend(vals)
pq.write_table(
    pa.table({c: pa.array(out_ev[c], ev.schema.field(c).type)
              for c in ev.schema.names}),
    os.path.join(DST, "events.parquet"),
)
print(f"events: {len(out_ev['event_id'])} rows")

# passthrough tables -------------------------------------------------------
SCALED = ("documents.parquet", "embeddings.parquet", "lineitem.parquet",
          "events.parquet")
for f in sorted(os.listdir(SRC)):
    if f.endswith(".parquet") and f not in SCALED:
        shutil.copy(os.path.join(SRC, f), os.path.join(DST, f))
        print(f"copied {f}")
print(f"done -> {DST}")
