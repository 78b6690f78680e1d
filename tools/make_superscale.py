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
Defaults: K=100, src=/root/testdata/sf0.1, dst=/tmp/superscale_100x
(the documented 100x pipeline every consumer tool defaults to).
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
    # any fixture table NOT in OFFSETS would silently vanish from the
    # replicated dataset — fail loud instead (the fixture has grown
    # before: events/documents/embeddings are post-TPC-H additions)
    on_disk = {
        f[:-len(".parquet")]
        for f in os.listdir(src)
        if f.endswith(".parquet")
    }
    unlisted = sorted(on_disk - set(OFFSETS))
    if unlisted:
        raise SystemExit(
            f"source tables not in OFFSETS (add them): {unlisted}"
        )
    for name, keys in OFFSETS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        if not keys:  # fixed-domain dims: copy once
            pq.write_table(t, f"{dst}/{name}.parquet")
            print(f"{name}: {t.num_rows} rows (dim, not replicated)")
            continue
        # context manager: an exception mid-replication (disk full at
        # ~1.5 GB, schema surprise) must not leave a footerless
        # present-but-unreadable parquet for the next consumer run
        with pq.ParquetWriter(f"{dst}/{name}.parquet", t.schema) as writer:
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
                    pref = [
                        None if s is None else re.sub(r"(\w+)", rf"r{i}_\1", s)
                        for s in texts
                    ]
                    rep = rep.set_column(
                        idx,
                        rep.schema.field("text"),
                        pa.array(pref, type=pa.string()),
                    )
                    # the fixture documents an exact invariant
                    # n_chars == length(text) (FIXTURES.md; llm.py's
                    # text_lang_stats publishes n_mismatch as that
                    # integrity probe) — the prefix pass grows every
                    # word, so n_chars MUST be recomputed or ~all
                    # replicated docs violate the documented contract
                    nidx = rep.schema.get_field_index("n_chars")
                    nfield = rep.schema.field("n_chars")
                    nvals = pa.array(
                        [None if s is None else len(s) for s in pref]
                    ).cast(nfield.type)
                    rep = rep.set_column(nidx, nfield, nvals)
                writer.write_table(rep)
        print(f"{name}: {t.num_rows} -> {t.num_rows * k} rows")


if __name__ == "__main__":
    # defaults match the documented 100x pipeline (README + every
    # consumer tool defaults to /tmp/superscale_100x) — the old
    # K=10 / _10x defaults sent no-arg runs to a path nothing reads
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    if k < 1:
        raise SystemExit(f"K must be >= 1, got {k}")
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/superscale_100x"
    replicate(src, dst, k)
