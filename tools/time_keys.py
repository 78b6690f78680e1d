#!/usr/bin/env python
"""Time NAMED keys exactly the way bench.py does (noop sink, warm
process, median of N) — the per-change A/B loop of an optimization
round.  Prints one JSON line: {"key": {"med": s, "min": s}, ...}.

Usage::

    python tools/time_keys.py graph_connected_components
    SPARK_GRAFT_BENCH_REPS=5 python tools/time_keys.py --sf DIR k1 k2
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_caffe_spark import get_spark
from pyspark_caffe_spark.queries import QUERIES


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    if not args:
        print("usage: time_keys.py [--sf DIR] KEY [KEY ...]")
        return 2

    spark = get_spark("time-keys")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["agg_hash_groupby"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict[str, float]] = {}
    for key in args:
        spark.sparkContext.setJobDescription(f"time_keys: {key}")
        samples: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        out[key] = {
            "med": round(statistics.median(samples), 3),
            "min": round(samples[0], 3),
        }
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
