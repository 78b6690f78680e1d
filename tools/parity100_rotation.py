#!/usr/bin/env python
"""PARITY100 exclusion-rotation quota (round-9 verdict #8).

The 100× batch sweep (parity_super100.py) excludes 23 keys for
reasoned cost, but a permanent exclusion list ossifies: nothing ever
re-examines whether the reason still holds or whether a bounded
version of the check is affordable.  This tool is the per-round
quota: EVERY round, 2–3 excluded keys are upgraded to a full-parity
or digest-tier check — either run directly at 100× (when the original
exclusion reason turns out to price the SCAN, not the work: the
roundtrip keys filter to a few-thousand-row slice before writing) or
on a BOUNDED SLICE of the 100× data that still exceeds the sf0.1
fixture severalfold.  Results land in PARITY100_ROTATION_r{N}.json;
the streaming quota lives in parity_super100_streaming.py.

Round-9 quota:
* scan_csv_roundtrip / scan_json_roundtrip / scan_xml_roundtrip —
  run DIRECTLY at 100×: their "rewrites 60M rows" exclusion reason
  was wrong (each filters to ≤ ~4k rows before the write; only the
  scan is 100×-sized), so these graduate to full value-hash parity.
* sim_auto_threshold — the router key (exact tier + forced-LSH tier
  in one plan) on an 8192-vector slice: 4× the sf0.1 corpus, 16× the
  pair count, while the quadratic DuckDB oracle stays ~2e9 flops.

Usage: python tools/parity100_rotation.py [super_dir] [out_json]
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


def main() -> None:
    super_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/superscale_100x"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _REPO, "PARITY100_ROTATION_r09.json"
    )
    import duckdb

    from parity import assert_parity

    spark = get_spark("parity100-rotation")
    spark.sparkContext.setLogLevel("ERROR")

    # bounded embeddings slice for the quadratic-oracle key
    slice_dir = "/tmp/superscale_100x_emb8k"
    os.makedirs(slice_dir, exist_ok=True)
    emb_pq = os.path.join(slice_dir, "embeddings.parquet")
    pre = duckdb.connect()
    if not os.path.exists(emb_pq):
        pre.execute(
            f"COPY (SELECT * FROM read_parquet('{super_dir}/embeddings.parquet') "
            f"WHERE vec_id < 8192 ORDER BY vec_id) TO '{emb_pq}' (FORMAT PARQUET)"
        )
    pre.close()
    # non-embeddings tables: symlink the FULL 100× versions (keys like
    # dedup_embed_cosine join embeddings→documents; the quadratic part
    # is the sliced embeddings side, the join side can stay full-size)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"]:
        srcp = os.path.join(super_dir, f"{t}.parquet")
        link = os.path.join(slice_dir, f"{t}.parquet")
        if os.path.exists(srcp):
            if os.path.lexists(link):
                os.remove(link)
            os.symlink(srcp, link)

    # bounded documents slice for the span-mining key (its exclusion
    # prices a 500k-doc cross-doc span self-join; 20k docs = 4× the
    # sf0.1 corpus is the same upgrade ratio as the embeddings slice)
    doc_dir = "/tmp/superscale_100x_docs20k"
    os.makedirs(doc_dir, exist_ok=True)
    doc_pq = os.path.join(doc_dir, "documents.parquet")
    pre = duckdb.connect()
    if not os.path.exists(doc_pq):
        pre.execute(
            f"COPY (SELECT * FROM read_parquet('{super_dir}/documents.parquet') "
            f"ORDER BY doc_id LIMIT 20000) TO '{doc_pq}' (FORMAT PARQUET)"
        )
    pre.close()

    # bounded EVENTS slice for float-column upgrades: user_id % 50
    # keeps WHOLE per-user histories (window keys need complete
    # partitions), ~2% of the 10M-row 100× table — big enough that
    # per-user chains run far past the 20-term EWMA frame, small
    # enough for a python-side full value hash.
    ev_dir = "/tmp/superscale_100x_ev2pct"
    os.makedirs(ev_dir, exist_ok=True)
    ev_pq = os.path.join(ev_dir, "events.parquet")
    pre = duckdb.connect()
    if not os.path.exists(ev_pq):
        pre.execute(
            f"COPY (SELECT * FROM read_parquet('{super_dir}/events.parquet') "
            f"WHERE user_id % 50 = 0 ORDER BY event_id) TO '{ev_pq}' "
            "(FORMAT PARQUET)"
        )
    pre.close()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        srcp = os.path.join(super_dir, f"{t}.parquet")
        link = os.path.join(ev_dir, f"{t}.parquet")
        if os.path.exists(srcp):
            if os.path.lexists(link):
                os.remove(link)
            os.symlink(srcp, link)

    # (key, data dir, note) — the quota for this round.  Round 9
    # over-delivered on the 2-3/round minimum: the ENTIRE
    # quadratic-exclusion class runs at the 8192-vector slice (4× the
    # sf0.1 corpus, 16× the pair count, quadratic DuckDB oracle still
    # ~2e9 flops), so every "excluded at 200k" key now carries bounded
    # over-fixture-scale parity evidence.
    sliced = "8192-vector bounded slice (4x the sf0.1 corpus)"
    QUOTA = [
        ("scan_csv_roundtrip", super_dir,
         "direct at 100x: write is a ~4k-row slice, only the scan is 60M"),
        ("scan_json_roundtrip", super_dir,
         "direct at 100x: write is a 2k-row slice"),
        ("scan_xml_roundtrip", super_dir,
         "direct at 100x: write is a sub-1k-row slice"),
        ("sim_auto_threshold", slice_dir, sliced),
        ("sim_knn_exact", slice_dir, sliced),
        ("sim_threshold_join", slice_dir, sliced),
        ("sim_optimizer_rewrite", slice_dir, sliced),
        ("sim_bipartite_auto", slice_dir, sliced),
        ("dedup_embed_cosine", slice_dir, sliced),
        ("sim_lsh_bucketed", slice_dir, sliced),
        ("sim_knn_lsh", slice_dir, sliced + " (MLlib approxSimilarityJoin)"),
        ("text_common_spans", doc_dir,
         "20k-document bounded slice (4x the sf0.1 corpus)"),
        # not an excluded key — a digest-tier upgrade: the main sweep's
        # digest skips FLOAT columns, and ewma IS the float output, so
        # this slice re-checks the full value hash (ewma included) on
        # complete per-user histories at 100× chain lengths
        ("win_ewma", ev_dir,
         "user-sliced 100x events (whole user histories, ~2% of rows): "
         "full value hash INCLUDING the float ewma column the main "
         "sweep's digest tier skips"),
    ]

    results: dict[str, dict] = {}
    # resume: keep green rows from a prior run; re-run FAIL/ERROR/new
    if os.path.exists(out_json):
        try:
            with open(out_json) as f:
                prior = json.load(f).get("results", {})
            results = {k: v for k, v in prior.items() if v.get("status") == "pass"}
            print(f"resume: {len(results)} green keys carried over", file=sys.stderr)
        except (OSError, ValueError):
            pass
    for key, data_dir, note in QUOTA:
        if key in results:
            continue
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            p = os.path.join(data_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        t0 = time.perf_counter()
        try:
            df = QUERIES[key](spark, data_dir)
            n = df.count()
            assert_parity(df, con, ORACLES[key], key)
            results[key] = {
                "status": "pass", "rows": n, "note": note,
                "sec": round(time.perf_counter() - t0, 1),
            }
        except AssertionError as exc:
            results[key] = {
                "status": "FAIL", "detail": str(exc)[:400], "note": note,
                "sec": round(time.perf_counter() - t0, 1),
            }
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            results[key] = {
                "status": "ERROR", "note": note,
                "detail": f"{type(exc).__name__}: {str(exc)[:300]}",
                "sec": round(time.perf_counter() - t0, 1),
            }
        finally:
            con.close()
        print(f"{key}: {results[key]['status']} "
              f"({results[key]['sec']} s)", file=sys.stderr)

    counts: dict[str, int] = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    out = {
        "metric": "PARITY100 exclusion-rotation quota (bounded upgrades "
                  "of permanently-excluded keys)",
        "round": 9,
        "counts": counts,
        "results": results,
    }
    with open(out_json, "w") as f:
        f.write(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"written": out_json, "counts": counts}))


if __name__ == "__main__":
    main()
