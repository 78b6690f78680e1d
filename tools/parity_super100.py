#!/usr/bin/env python
"""Broad value-parity sweep AT 100× scale (round 8): re-run the full
DuckDB value-exact comparison for every swept key on the
100×-replicated sf0.1 dataset, not the sf0.01 the driver uses.

Why: the round-8 100× spot-check caught a real scale-only bug
(agg_hash_groupby's double sums diverging in the 4th decimal at
~3e11 magnitudes — invisible at sf0.01).  This sweep hunts for more
of that class: rounding on big-magnitude float aggregates, window
frames over 100× partitions, join results crossing broadcast/SMJ
strategy changes, overflow in hash gates.

Scope: every registered key EXCEPT the quadratic-ORACLE class (exact
all-pairs similarity / embedding dedup — the 200k-vector DuckDB
oracle is 2e10 dot products; every key in the class passes full
value-hash parity on an 8192-vector slice in parity100_rotation.py)
and text_common_spans (500k-doc span self-join; 20k-doc slice
evidence likewise).  Round 9 graduated the ENTIRE streaming family
and the text-format roundtrips into this sweep — measured affordable
(2.6-113 s/key at 10M events).  Oversized results compare via the
exact-digest tier (digest_exprs).  Every skip is recorded with its
reason — no silent truncation.

Usage: python tools/parity_super100.py [super_dir] [out_json]
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

ROW_CAP = 200_000

# keys excluded up front, with the reason recorded in the artifact
EXCLUDE = {
    # quadratic-in-corpus by design (200k vectors → 2e10 pairs).
    # Round-9 rotation coverage: EVERY key in this class passed full
    # value-hash parity on an 8192-vector bounded slice (4× the sf0.1
    # corpus, 16× the pairs) in parity100_rotation.py
    # (PARITY100_ROTATION_r09.json) — the exclusion here prices the
    # 200k quadratic ORACLE, not an untested operator.
    "sim_knn_exact": "O(N^2) exact all-pairs by design",
    "sim_threshold_join": "O(N^2) exact all-pairs by design",
    "sim_optimizer_rewrite": "routes to the O(N^2) exact tier by contract",
    "dedup_embed_cosine": "O(N^2) exact embedding all-pairs by design",
    "sim_knn_lsh": "MLlib approxSimilarityJoin at 200k vectors: hours-class",
    "sim_lsh_bucketed": "banded all-bucket pair gen at 200k vectors: heavy",
    "sim_auto_threshold": "routes to LSH pair-gen at this size: heavy",
    "sim_bipartite_auto": "ORACLE is the quadratic side: 1e10 DuckDB dot products",
    # streaming replay: rewrites the 10M-row events table per key.
    # Round-9 coverage: stream_dedup / stream_stateful / stream_tumbling
    # and the WHOLE streaming family (12 keys incl. recovery, interval
    # join, watermark late-drop) run at 100× DENSITY on a 2M-event
    # contiguous slice in parity_super100_streaming.py (all green,
    # PARITY100_STREAMING_r09.json) — the exclusion here prices the
    # full-table replay infra, not an untested operator.
    # Round 9 graduated the cheap half of the streaming family into
    # the main sweep (tumbling/sliding/session/union/join_static/
    # foreachbatch run directly on the 10M-event table — measured
    # affordable after stream_session_drain digest-matched 9.55M
    # sessions and stream_dedup_watermark replayed 20M rows here).
    # The rest stay excluded for genuine replay/state cost, each with
    # density-sliced coverage in parity_super100_streaming.py.

    # scan_csv/json/xml_roundtrip: EX-exclusions.  Round 9's rotation
    # quota (parity100_rotation.py) showed the r8 reasons were wrong —
    # each key filters to a few-thousand-row slice BEFORE writing, so
    # the 100× cost is one scan.  They now run in the main sweep.
    "text_common_spans": "cross-doc span self-join at 500k docs: heavy",
}


def digest_exprs(schema) -> tuple[list[str], list[str]]:
    """Order-insensitive EXACT digest expression lists (Spark, DuckDB)
    for a result schema: row count plus, per column, the non-null
    count and — where an exact cross-engine sum exists — a
    DECIMAL(38,0) sum of the value / its length / its epoch-micros.
    Integer decimal sums are exact in both engines, so a digest
    mismatch is always a real divergence; float columns contribute
    only their null layout.  Shared by the oversized-result tier of
    the batch sweep and the round-9 streaming parity harness."""
    s_exprs, d_exprs = ["COUNT(*)"], ["COUNT(*)"]
    for f in schema.fields:
        c = f.name
        t = f.dataType.simpleString()
        s_exprs.append(f"COUNT(`{c}`)")
        d_exprs.append(f'COUNT("{c}")')
        if t in ("tinyint", "smallint", "int", "bigint"):
            s_exprs.append(f"SUM(CAST(`{c}` AS DECIMAL(38,0)))")
            d_exprs.append(f'SUM(CAST("{c}" AS DECIMAL(38,0)))')
        elif t == "boolean":
            s_exprs.append(f"SUM(CAST(`{c}` AS INT))")
            d_exprs.append(f'SUM(CAST("{c}" AS INT))')
        elif t == "string":
            s_exprs.append(f"SUM(CAST(LENGTH(`{c}`) AS DECIMAL(38,0)))")
            d_exprs.append(f'SUM(CAST(LENGTH("{c}") AS DECIMAL(38,0)))')
        elif t.startswith("timestamp"):
            # NTZ → TIMESTAMP cast is identity in this UTC-pinned
            # session; unix_micros only takes LTZ
            s_exprs.append(
                f"SUM(CAST(UNIX_MICROS(CAST(`{c}` AS TIMESTAMP)) "
                "AS DECIMAL(38,0)))"
            )
            d_exprs.append(f'SUM(CAST(EPOCH_US("{c}") AS DECIMAL(38,0)))')
        elif t == "date":
            s_exprs.append(
                f"SUM(CAST(DATEDIFF(`{c}`, DATE '1970-01-01') "
                "AS DECIMAL(38,0)))"
            )
            d_exprs.append(
                f'SUM(CAST(("{c}" - DATE \'1970-01-01\') AS DECIMAL(38,0)))'
            )
    return s_exprs, d_exprs


def main() -> None:
    super_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/superscale_100x"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _REPO, "PARITY100_r09.json"
    )
    import duckdb

    from parity import assert_parity

    spark = get_spark("parity-super100")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{super_dir}/{t}.parquet')"
        )

    def flush(results: dict) -> None:
        # incremental write after EVERY key: a killed sweep keeps all
        # completed evidence (a 30-min quadratic-oracle surprise cost a
        # full run's results before this)
        counts: dict[str, int] = {}
        for r in results.values():
            counts[r["status"]] = counts.get(r["status"], 0) + 1
        with open(out_json, "w") as f:
            f.write(json.dumps({
                "metric": "registry-wide DuckDB value-parity sweep at 100x sf0.1",
                "round": 9,
                "sf": "sf0.1 x100",
                "row_cap": ROW_CAP,
                "complete": False,
                "counts": counts,
                "results": results,
            }, indent=1) + "\n")

    # resume: keep green results from an earlier (possibly killed or
    # session-crashed) run; re-run only FAIL/ERROR/missing keys
    results: dict[str, dict] = {}
    if os.path.exists(out_json):
        try:
            with open(out_json) as f:
                prior = json.load(f).get("results", {})
            results = {
                k: v for k, v in prior.items()
                if v.get("status") in ("pass", "digest_pass")
            }
            print(f"resume: {len(results)} green keys carried over", file=sys.stderr)
        except (OSError, ValueError):
            pass

    def ensure_alive():
        nonlocal spark
        try:
            spark.range(1).count()
        except Exception:
            # a prior key OOM'd the JVM: rebuild the session so one bad
            # key cannot void the rest of the sweep
            print("SparkContext dead — rebuilding session", file=sys.stderr)
            from pyspark.sql import SparkSession

            active = SparkSession.getActiveSession()
            if active is not None:
                try:
                    active.stop()
                except Exception:
                    pass
            spark = get_spark("parity-super100-revived")
            spark.sparkContext.setLogLevel("ERROR")

    for key in QUERIES:
        if key in results:
            continue
        if key in EXCLUDE:
            results[key] = {"status": "excluded", "reason": EXCLUDE[key]}
            continue
        if key not in ORACLES:
            results[key] = {"status": "excluded", "reason": "no oracle"}
            continue
        ensure_alive()
        t0 = time.perf_counter()
        try:
            df = QUERIES[key](spark, super_dir)
            n = df.count()
            if n > ROW_CAP:
                # too big to hash python-side: compare an ORDER-
                # INSENSITIVE EXACT DIGEST instead — row count plus,
                # per column, the non-null count and (where an exact
                # cross-engine sum exists) a DECIMAL(38,0) sum of the
                # value / its length / its epoch-micros.  Integer
                # decimal sums are exact in both engines, so a digest
                # mismatch is always a real divergence; float columns
                # contribute only their null layout (their value check
                # is what the ≤ROW_CAP full-hash path is for).
                s_exprs, d_exprs = digest_exprs(df.schema)
                s_digest = [
                    None if v is None else int(v)
                    for v in df.selectExpr(*s_exprs).collect()[0]
                ]
                d_digest = [
                    None if v is None else int(v)
                    for v in con.execute(
                        f"SELECT {', '.join(d_exprs)} FROM ({ORACLES[key]})"
                    ).fetchone()
                ]
                match = s_digest == d_digest
                results[key] = {
                    "status": "digest_pass" if match else "digest_FAIL",
                    "rows": n,
                    "digest_terms": len(s_digest),
                    "sec": round(time.perf_counter() - t0, 1),
                }
                if not match:
                    results[key]["spark_digest"] = s_digest
                    results[key]["oracle_digest"] = d_digest
                print(f"{key}: {results[key]['status']} ({n} rows, "
                      f"{len(s_digest)} terms)", file=sys.stderr)
                continue
            assert_parity(df, con, ORACLES[key], key)
            results[key] = {
                "status": "pass",
                "rows": n,
                "sec": round(time.perf_counter() - t0, 1),
            }
        except AssertionError as exc:
            results[key] = {
                "status": "FAIL",
                "detail": str(exc)[:400],
                "sec": round(time.perf_counter() - t0, 1),
            }
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            results[key] = {
                "status": "ERROR",
                "detail": f"{type(exc).__name__}: {str(exc)[:300]}",
                "sec": round(time.perf_counter() - t0, 1),
            }
        print(f"{key}: {results[key]['status']} "
              f"({results[key].get('sec')} s)", file=sys.stderr)
        flush(results)

    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    out = {
        "metric": "registry-wide DuckDB value-parity sweep at 100x sf0.1",
        "round": 9,
        "sf": "sf0.1 x100",
        "row_cap": ROW_CAP,
        "complete": True,
        "counts": counts,
        "results": results,
    }
    with open(out_json, "w") as f:
        f.write(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"written": out_json, "counts": counts}))


if __name__ == "__main__":
    main()
