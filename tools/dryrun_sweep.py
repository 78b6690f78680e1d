#!/usr/bin/env python
"""Dry-run the driver's budget-limited correctness sweep locally.

Replays EXACTLY what the grading driver does each round, before the
driver does it: import ``__spark_entry__``, take the first N keys of
``queries()`` (the sweep-ordered registry — code-changed keys first,
then stalest evidence), run each against its ``oracle_sql()`` DuckDB
oracle at sf0.01 through the same normalize/compare path the local
suite uses (``tests.parity.assert_parity``), and print one summary
line for PERF.md: ``DRYRUN: G/N green in Xs``.

Usage::

    python tools/dryrun_sweep.py            # first 50 keys (the budget)
    python tools/dryrun_sweep.py 60         # widen past the budget
    python tools/dryrun_sweep.py 10 /root/testdata/sf0.01

Every failing key prints its position, name, and the first 200 chars
of the mismatch, so a red row is actionable before the driver records
it in CORRECTNESS_r{N}.json.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    sys.path.insert(0, _REPO)
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark_caffe_spark import get_spark
    from tests.parity import assert_parity

    import duckdb

    spark = get_spark("dryrun-sweep")
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    keys = list(qs)[:n]
    t0 = time.time()
    green = 0
    for i, key in enumerate(keys):
        try:
            assert_parity(qs[key](spark, sf_dir), con, osql[key], key)
            green += 1
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            print(f"[{i}] {key} FAIL {str(ex)[:200]}", flush=True)
    print(f"DRYRUN: {green}/{len(keys)} green in {time.time() - t0:.0f}s")
    return 0 if green == len(keys) else 1


if __name__ == "__main__":
    sys.exit(main())
