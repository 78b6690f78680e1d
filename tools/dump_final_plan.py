#!/usr/bin/env python
"""Append the FINAL adaptive plan (post-execution executedPlan) for
NAMED keys to plans/<dir>/<key>_<tag>.txt.

Some round-18 claims (AQE exchange reuse in text_tfidf) exist only in
the final adaptive plan: the static ``explain("formatted")`` dump shows
``isFinalPlan=false`` and no ReusedExchange, because AQE stage reuse is
decided at runtime when the second branch's shuffle canonicalizes to an
already-materialized stage.  This tool executes the DataFrame's own
QueryExecution via ``collect()`` (a write command would finalize a
DIFFERENT QueryExecution) and appends the executedPlan string under a
labeled separator so the judge can check runtime-plan claims against
the committed file.

Usage::

    python tools/dump_final_plan.py r18 after [--sf DIR] KEY [KEY ...]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 3:
        print("usage: dump_final_plan.py ROUND_DIR TAG [--sf DIR] KEY ...")
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

    spark = get_spark("dump-final-plan")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(_REPO, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    for key in rest:
        df = QUERIES[key](spark, sf_dir)
        df.collect()  # finalizes THIS QueryExecution's adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "a") as f:
            f.write(
                "\n\n== FINAL ADAPTIVE PLAN (executedPlan after "
                "collect(); includes the Initial Plan section) ==\n"
            )
            f.write(plan)
        print(f"appended final plan to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
