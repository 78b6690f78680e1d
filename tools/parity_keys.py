#!/usr/bin/env python
"""Run the driver-contract DuckDB parity check for NAMED keys only.

Same machinery as tools/dryrun_sweep.py (import ``__spark_entry__``,
run each named key against its ``oracle_sql()`` oracle through
``tests.parity.assert_parity``), but for an explicit key list instead
of the sweep-ordered prefix — the per-change verification loop of an
optimization round.

Usage::

    python tools/parity_keys.py graph_connected_components
    python tools/parity_keys.py --sf /root/testdata/sf0.1 key1 key2
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    if not args:
        print("usage: parity_keys.py [--sf DIR] KEY [KEY ...]")
        return 2

    sys.path.insert(0, _REPO)
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark_caffe_spark import get_spark
    from tests.parity import assert_parity

    import duckdb

    spark = get_spark("parity-keys")
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    t0 = time.time()
    green = 0
    for key in args:
        if key not in qs:
            print(f"{key} UNKNOWN KEY", flush=True)
            continue
        tk = time.time()
        try:
            assert_parity(qs[key](spark, sf_dir), con, osql[key], key)
            green += 1
            print(f"{key} OK ({time.time() - tk:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001 — report, keep going
            print(f"{key} FAIL {str(ex)[:300]}", flush=True)
    print(f"PARITY: {green}/{len(args)} green in {time.time() - t0:.0f}s")
    return 0 if green == len(args) else 1


if __name__ == "__main__":
    sys.exit(main())
