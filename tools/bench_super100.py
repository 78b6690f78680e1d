#!/usr/bin/env python
"""100× super-scale bench (round-7 verdict #1): run the headline suite
back-to-back at sf0.1 and at 100×-replicated sf0.1 (~60M lineitem /
15M orders / 10M events / 500k docs / 200k vectors, ~1.5 GB parquet)
and emit one JSON artifact with per-query growth ratios, spill
evidence, AQE join-strategy evidence, and a DuckDB parity re-check of
a subset of oracled queries AT 100× — proving the plans do not just
survive the scale-up but still return exactly correct answers there.

sim_knn_exact is EXCLUDED from the 100× suite and says so in the
artifact: exact all-pairs is O(N²) by design (46× at 10× data,
BENCH_SUPER_r07.json), 200k vectors ≈ 4×10^10 pairs ≈ an hour of
matmul — the scale path for that shape is the router/optimizer rule
(sim_auto_threshold / sim_optimizer_rewrite → LSH or IVF), which IS
in the suite via sim_knn_batch and the dedup keys.

Usage: python tools/bench_super100.py [super_dir] [out_json]
Defaults: /tmp/superscale_100x, BENCH_SUPER100_r19.json
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from pyspark_caffe_spark import get_spark  # noqa: E402
from pyspark_caffe_spark.queries import ORACLES, QUERIES  # noqa: E402

BASE_DIR = "/root/testdata/sf0.1"
QUADRATIC_EXCLUDED = ["sim_knn_exact"]

# oracled keys re-checked value-exactly against DuckDB AT 100× —
# small-output keys so the python-side normalization stays cheap
PARITY_KEYS = [
    "agg_hash_groupby",
    "join_multiway",
    "agg_q6_selective",
    "topk_global",
    "fn_map_json",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def total_spilled(spark) -> int:
    """Sum memory+disk spill bytes over all completed stages (same
    AppStatusStore read as tests/test_scale_ops.py)."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    seq = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        sc._gateway.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    total = 0
    for i in range(seq.size()):
        s = seq.apply(i)
        total += s.memoryBytesSpilled() + s.diskBytesSpilled()
    return total


def calib_probe(spark) -> float:
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(500_000_000).selectExpr(
            "sum(cast(hash(id) as bigint) % 1000000)"
        ).collect()
        samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[1], 3)


def run_suite(spark, names, sf_dir, passes=3, track_spill=False):
    med = {}
    spill = {}
    for name in names:
        samples = []
        before = total_spilled(spark) if track_spill else 0
        for _ in range(passes):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        if track_spill:
            delta = total_spilled(spark) - before
            if delta:
                spill[name] = delta
        samples.sort()
        med[name] = round(samples[len(samples) // 2], 3)
        print(f"  {name}: {med[name]} s", file=sys.stderr)
    return med, spill


def parity_at_super(spark, super_dir):
    """Value-exact DuckDB comparison of PARITY_KEYS on the 100× data."""
    import duckdb

    from parity import assert_parity  # tests/parity.py

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{super_dir}/{t}.parquet')"
        )
    results = {}
    for key in PARITY_KEYS:
        t0 = time.perf_counter()
        try:
            assert_parity(QUERIES[key](spark, super_dir), con, ORACLES[key], key)
            results[key] = "pass"
        except AssertionError as exc:
            results[key] = f"FAIL: {str(exc)[:200]}"
        print(
            f"  parity {key}: {results[key]} ({time.perf_counter() - t0:.1f} s)",
            file=sys.stderr,
        )
    return results


def join_strategy_evidence(spark, sf_dir):
    """Executed-plan join strategies for the 6-table chain — at sf0.1
    every dim broadcasts; at 100× customer (1.5M rows) crosses the
    broadcast threshold and AQE must pick SMJ/shuffled-hash for it."""
    df = QUERIES["join_multiway"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
    }


def main() -> None:
    super_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/superscale_100x"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _REPO, "BENCH_SUPER100_r19.json"
    )
    sys.path.insert(0, _REPO)
    from bench import HEADLINE

    names = [q for q in HEADLINE if q not in QUADRATIC_EXCLUDED]

    spark = get_spark("pyspark-caffe-spark-bench-super100")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["agg_hash_groupby"](spark, BASE_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    calib_open = calib_probe(spark)
    print(f"calib open: {calib_open}", file=sys.stderr)
    print("== base sf0.1 ==", file=sys.stderr)
    base, _ = run_suite(spark, names, BASE_DIR)
    spill_before = total_spilled(spark)
    print("== super 100x ==", file=sys.stderr)
    sup, spill_by_query = run_suite(spark, names, super_dir, track_spill=True)
    spill_after = total_spilled(spark)
    joins_base = join_strategy_evidence(spark, BASE_DIR)
    joins_super = join_strategy_evidence(spark, super_dir)
    print("== parity at 100x ==", file=sys.stderr)
    parity = parity_at_super(spark, super_dir)
    calib_end = calib_probe(spark)

    base_total = round(sum(base.values()), 3)
    super_total = round(sum(sup.values()), 3)
    growth = {k: round(sup[k] / base[k], 2) if base[k] else None for k in names}
    out = {
        "metric": (
            "super-scale suite: 100x-replicated sf0.1 (60M lineitem / 15M "
            "orders / 10M events / 500k docs / 200k vectors), back-to-back "
            "with the sf0.1 suite in one session"
        ),
        "round": 19,
        "sf": "sf0.1 x100 (tools/make_superscale.py, streaming writer)",
        "excluded": {
            q: "O(N^2) by design; growth characterized at 10x "
            "(BENCH_SUPER_r07.json: 46x); scale path = router/LSH/IVF"
            for q in QUADRATIC_EXCLUDED
        },
        "super_value_sec": super_total,
        "base_value_sec": base_total,
        "suite_growth_at_100x": round(super_total / base_total, 2),
        "calib_sec": calib_open,
        "calib_end_sec": calib_end,
        "queries_super100": sup,
        "queries_base": base,
        "growth_ratio": growth,
        "spill_bytes_during_super_suite": spill_after - spill_before,
        "spill_bytes_by_query_100x": spill_by_query,
        "join_multiway_strategies": {"sf0.1": joins_base, "x100": joins_super},
        "parity_at_100x": parity,
    }
    with open(out_json, "w") as f:
        f.write(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"written": out_json, "growth": out["suite_growth_at_100x"]}))


if __name__ == "__main__":
    main()
