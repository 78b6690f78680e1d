#!/usr/bin/env python
"""Dump explain("formatted") for NAMED keys to plans/<dir>/<key>_<tag>.txt.

Usage::

    python tools/dump_plan.py r18 after dedup_minhash [key ...]
    python tools/dump_plan.py r18 before --sf /root/testdata/sf0.1 key
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 3:
        print("usage: dump_plan.py ROUND_DIR TAG [--sf DIR] KEY [KEY ...]")
        return 2
    round_dir, tag = args[0], args[1]
    rest = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and rest[0] == "--sf":
        sf_dir = rest[1]
        rest = rest[2:]

    sys.path.insert(0, _REPO)
    from pyspark_caffe_spark import get_spark
    from pyspark_caffe_spark.queries import QUERIES

    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(_REPO, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    for key in rest:
        df = QUERIES[key](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
