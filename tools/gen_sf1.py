#!/usr/bin/env python3
"""Deterministic sf1 synthesis: scale /root/testdata/sf0.1 10x into
target/sf1 by key-shifted replication, preserving referential integrity
and per-table distributions. Committed so the sf1 scaling point is
reproducible (the r10 generator was never committed; ratios computed
from THIS generator's data are internally consistent with boards
measured the same round).

Transform, per table:
- region / nation: copied as-is (dimensions don't grow with sf).
- customer / supplier / part / orders / lineitem / events: 10 replicas;
  every 64-bit key column (primary and foreign alike) shifts by
  r * (max_key + 1) so joins stay consistent inside each replica and
  keys never collide across replicas. Timestamps, measures and category
  strings are left untouched: the time window gets 10x denser, the
  category histogram keeps its shape.
- documents: id-shifted replicas; replica r > 0 appends a replica tag
  token to the text, modelling boilerplate variants of the same page —
  each original doc becomes a 10-clique of near-duplicates, so near-dup
  pair counts grow LINEARLY in corpus size (cliques of constant size),
  which is the regime banded dedup must handle. n_chars is updated to
  match the mutated text.
- embeddings: id-shifted replicas; replica r > 0 gets one dimension
  deterministically perturbed (+0.03 * r on dim (7 * r) % dims), the
  embedding-space analogue of the text tag: near-dup cliques of size
  10, linear pair growth.

Usage: python3 tools/gen_sf1.py [src_dir] [out_dir]
Defaults: /root/testdata/sf0.1 -> /root/repo/target/sf1
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10

COPY = ["region", "nation"]
# per table: the int64 key columns to shift, all by the same per-replica
# offset derived from that table's PRIMARY key domain
SHIFT = {
    "customer": {"primary": "c_custkey", "keys": ["c_custkey"]},
    "supplier": {"primary": "s_suppkey", "keys": ["s_suppkey"]},
    "part": {"primary": "p_partkey", "keys": ["p_partkey"]},
    # foreign keys shift by the REFERENCED table's offset so the join
    # graph stays intact inside each replica
    "orders": {"primary": "o_orderkey", "keys": ["o_orderkey"],
               "foreign": {"o_custkey": "customer"}},
    # l_orderkey is a FOREIGN key of orders (shifts by orders' stride so
    # the order-lineitem join survives even when max(l_orderkey) !=
    # max(o_orderkey)); lineitem has no shifted primary of its own but
    # offsets() still needs a domain column, so keep primary for stride
    # bookkeeping only.
    "lineitem": {"primary": "l_orderkey", "keys": [],
                 "foreign": {"l_orderkey": "orders",
                             "l_partkey": "part", "l_suppkey": "supplier"}},
    "events": {"primary": "event_id", "keys": ["event_id", "user_id"]},
    "documents": {"primary": "doc_id", "keys": ["doc_id"]},
    "embeddings": {"primary": "vec_id", "keys": ["vec_id"]},
}


def offsets(src):
    """Per-table replica stride = max(primary) + 1."""
    out = {}
    for t, spec in SHIFT.items():
        tab = pq.read_table(f"{src}/{t}.parquet", columns=[spec["primary"]])
        out[t] = pc.max(tab.column(0)).as_py() + 1
    return out


def replicate(src, out, table, stride):
    tab = pq.read_table(f"{src}/{table}.parquet")
    spec = SHIFT[table]
    chunks = []
    for r in range(REPLICAS):
        t = tab
        for k in spec["keys"]:
            idx = t.schema.get_field_index(k)
            t = t.set_column(idx, k, pc.add(t.column(k), r * stride[table]))
        for k, ref in spec.get("foreign", {}).items():
            idx = t.schema.get_field_index(k)
            t = t.set_column(idx, k, pc.add(t.column(k), r * stride[ref]))
        if table == "documents" and r > 0:
            idx = t.schema.get_field_index("text")
            text = pc.binary_join_element_wise(
                t.column("text").cast(pa.string()), f"rep{r}", " ")
            t = t.set_column(idx, "text", text)
            nidx = t.schema.get_field_index("n_chars")
            t = t.set_column(nidx, "n_chars",
                             pc.utf8_length(text).cast(pa.int64()))
        if table == "embeddings" and r > 0:
            import numpy as np
            emb = t.column("embedding").combine_chunks()
            arr = np.asarray(emb.values, dtype=np.float32).copy()
            dims = len(arr) // len(t)
            arr[(7 * r) % dims::dims] += np.float32(0.03 * r)
            vals = pa.array(arr, type=pa.float32())
            lists = pa.ListArray.from_arrays(emb.offsets, vals)
            t = t.set_column(t.schema.get_field_index("embedding"),
                             "embedding", lists)
        chunks.append(t)
    merged = pa.concat_tables(chunks)
    # ~32 row groups per table (floor 4096 rows): Spark parallelizes a
    # parquet FILE only at row-group boundaries, so the old 1<<20
    # (single-group documents/events/embeddings) serialized every sf1
    # scan stage onto ONE task — a data-layout artifact, not an engine
    # cost (real corpora arrive in many files/groups). Capping at ~32
    # groups keeps iterative operators (BFS/label rounds re-scan their
    # checkpointed scan-partitioned frames every round) from drowning in
    # per-task overhead at local[8].
    pq.write_table(merged, f"{out}/{table}.parquet",
                   row_group_size=max(4096, len(merged) // 32))
    print(f"{table}: {len(tab)} -> {len(merged)} rows")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
    import os
    os.makedirs(out, exist_ok=True)
    stride = offsets(src)
    for t in COPY:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                       f"{out}/{t}.parquet")
        print(f"{t}: copied")
    for t in SHIFT:
        replicate(src, out, t, stride)


if __name__ == "__main__":
    main()
