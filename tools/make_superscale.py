#!/usr/bin/env python
"""Generate a K×-replicated copy of a fixture SF directory for
super-scale benching (round-6 verdict #5).

Replication preserves referential integrity: every key column gets a
per-replica offset of 10M (the same offset scheme as
tests/test_growth.py), so joins land within a replica and the join/agg
cardinality structure scales exactly K×.  ``documents.text`` is
word-prefixed per replica (disjoint shingle spaces) so near-dup
candidate generation scales by corpus structure rather than creating
K-way twin groups — the honest linearity measurement.  Dimension
tables with fixed value domains (region, nation) are NOT replicated:
at any scale there are still 25 nations — which also keeps
broadcast-dim plans representative.

Usage: python tools/make_superscale.py [K] [src_sf_dir] [dst_dir]
Defaults: K=10, src=/root/testdata/sf0.1, dst=/tmp/superscale_10x
"""

from __future__ import annotations

import re
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 10_000_000

# key columns to offset per replica, per table
OFFSETS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(src: str, dst: str, k: int) -> None:
    """Stream each replica straight to a ParquetWriter: peak memory is
    ONE replica regardless of k (the round-7 concat_tables version
    materialized all k replicas — fine at 10×, not at 100×)."""
    import os

    os.makedirs(dst, exist_ok=True)
    for name, keys in OFFSETS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        if not keys:  # fixed-domain dims: copy once
            pq.write_table(t, f"{dst}/{name}.parquet")
            print(f"{name}: {t.num_rows} rows (dim, not replicated)")
            continue
        writer = pq.ParquetWriter(f"{dst}/{name}.parquet", t.schema)
        for i in range(k):
            rep = t
            for col in keys:
                idx = rep.schema.get_field_index(col)
                field = rep.schema.field(col)
                shifted = pc.add(rep.column(col), i * OFF).cast(field.type)
                rep = rep.set_column(idx, field, shifted)
            if name == "documents" and i > 0:
                idx = rep.schema.get_field_index("text")
                texts = rep.column("text").to_pylist()
                pref = [re.sub(r"(\w+)", rf"r{i}_\1", s) for s in texts]
                rep = rep.set_column(
                    idx, rep.schema.field("text"), pa.array(pref, type=pa.string())
                )
            writer.write_table(rep)
        writer.close()
        print(f"{name}: {t.num_rows} -> {t.num_rows * k} rows")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/superscale_10x"
    replicate(src, dst, k)
