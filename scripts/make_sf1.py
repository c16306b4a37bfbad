#!/usr/bin/env python3
"""Synthesize an sf1-scale test dir from sf0.1 — 10 disjoint key-shifted
shards (VERDICT r09 #2 / r11 #5: empirical superlinearity check beyond
plan gates). Deterministic, no RNG: copy 0 is the source verbatim; copy
i>0 offsets every key column by i*stride (stride = max(key)+1 from the
source) so referential integrity (orders→customer, lineitem→orders/part/
supplier, embeddings↔documents) holds within each shard and shards never
collide.

Shard decorrelation (so per-copy structure matches sf0.1 instead of
making every row a 10x duplicate, which would quadratically explode the
near-dup/embed-dedup outputs and measure a DIFFERENT workload):
  - documents copy i>0: every whitespace token gets a '~i' suffix (still
    one token to the \\s+ tokenizers; vocab scales 10x, per-shard df
    distribution identical to sf0.1). n_chars recomputed.
  - embeddings copy i>0: label offset by i*(max_label+1) — the
    label-blocked pair queries never mix shards.
Queries keyed on literal ids (vec_id < 10 ANN probes, BM25 literal
terms) keep their sf0.1-sized query sets and hit shard 0 — the realistic
fixed-query-set-over-bigger-corpus serving shape.

Usage: python3 scripts/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1]
(Driver-side tooling only — the shipped Scala library does not use it.)
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = 10

import os
import shutil

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)

# key columns to offset, per table; each name offsets by ITS OWN domain
# stride (computed from the table that owns the key) so foreign keys stay
# aligned across tables within a shard
OWNERS = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("documents", "doc_id"),  # vec_id aligns with doc_id
    "label": ("embeddings", "label"),
}

tables = {}
for name in ("region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings"):
    tables[name] = pq.read_table(f"{src}/{name}.parquet")

strides = {}
for col, (tab, owner_col) in OWNERS.items():
    key = (tab, owner_col)
    if key not in strides:
        strides[key] = max(tables[tab].column(owner_col).to_pylist()) + 1

def shard(table, name, i):
    if i == 0:
        return table
    cols = {}
    for field in table.schema:
        col = table.column(field.name)
        if field.name in OWNERS:
            stride = strides[OWNERS[field.name]]
            cols[field.name] = pa.array(
                [None if v is None else v + i * stride
                 for v in col.to_pylist()], field.type)
        elif name == "documents" and field.name == "text":
            cols[field.name] = pa.array(
                [" ".join(f"{t}~{i}" for t in v.split())
                 for v in col.to_pylist()], field.type)
        else:
            cols[field.name] = col
    if name == "documents":
        cols["n_chars"] = pa.array(
            [len(v) for v in cols["text"].to_pylist()],
            table.schema.field("n_chars").type)
    return pa.table([cols[f.name] for f in table.schema],
                    schema=table.schema)

for name, table in tables.items():
    if name in ("region", "nation"):
        pq.write_table(table, f"{dst}/{name}.parquet")
        continue
    shards = [shard(table, name, i) for i in range(COPIES)]
    merged = pa.concat_tables(shards)
    pq.write_table(merged, f"{dst}/{name}.parquet")
    print(f"{name}: {table.num_rows} -> {merged.num_rows} rows")
print(f"wrote {dst}")
