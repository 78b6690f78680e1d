#!/usr/bin/env python
"""Streaming digest parity AT 100× density (round-9 verdict #4).

The batch sweep (parity_super100.py) runs the streaming family
directly on the FULL 100× events table since round 10 (zero
exclusions); THIS harness is the affordable-cadence complement it
grew from: a SAMPLED REPLAY — a ~2M-event CONTIGUOUS slice of the
100× events table (the first six days, so the events/hour density is
exactly the 100× density; a row-sampled slice would thin the density
and change session/watermark behavior) — drained through FULL
Structured Streaming availableNow pipelines and compared EXACTLY
against DuckDB batch twins on the same slice, with the per-event
outputs ALSO value-hashed on an LCG 1/16 gate (the full sweep's
digest tier cannot check float values row-for-row):

* ``stream_dedup`` — the registered key itself: the slice is
  rewritten with every event duplicated, streamed through
  ``dropDuplicates`` with a full drain; output is the 2M-row slice →
  exact-digest tier (decimal counts/sums per column, a mismatch is
  always a real divergence).
* ``stream_stateful`` — the registered key: per-user running totals
  via ``applyInPandasWithState`` (RocksDB-backed GroupState) over the
  slice; 150k user rows → full value-hash parity.
* ``stream_session_drain`` — the REGISTERED complete-mode
  session_window drain key (this harness's round-9 inline drain
  graduated into the registry; the harness now calls the registered
  key so the two can never diverge); 1.9M session rows →
  exact-digest tier plus the LCG value slice.
* ``stream_tumbling`` — the registered key: watermarked 1-hour
  tumbling counts, full drain; small output → full value-hash.
* round-9 extension: the REST of the streaming family runs verbatim
  on the slice too — sliding windows, the 3-file watermark
  late-drop replay, the watermarked stream-stream interval join, the
  stream×static broadcast join (customer symlinked from the full
  100× dataset), foreachBatch, the two-source union, the
  checkpoint-restart recovery pair, and the watermark-bounded dedup —
  so every excluded streaming key carries 100×-density drain
  evidence, not just the four the verdict named.

Round-11 upgrade (round-10 verdict #5): the four keys whose drained
output is PER-EVENT (~2M rows — inherently above the 200k value-hash
cap, so digest is the ceiling for the FULL output) now ALSO get a
bounded-slice FULL VALUE HASH: an LCG hash gate (the same
cross-engine-exact mix sample_seeded uses) keeps ~1/16 of the output
rows (~120k ≤ cap) in BOTH engines, and that slice is value-hashed
column-for-column.  Digest proves the whole output's counts/sums;
the slice proves actual VALUES row-for-row on an unbiased 1/16th.

Usage: python tools/parity_super100_streaming.py [super_dir] [out_json]
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

from parity_super100 import ROW_CAP, _TABLES, digest_exprs  # noqa: E402

CUTOFF = "2024-01-07"  # first 6 of 30 days ≈ 2M of the 10M 100× events

from pyspark_caffe_spark.queries.scale_ops import _CC_LCG_SQL  # noqa: E402

#: cross-engine-exact LCG hash gate — the SAME library mix the CC /
#: sample_seeded keys use (imported, not re-hardcoded, so the parity
#: slice can never silently diverge from library semantics): keeps
#: ~1/16 of rows, unbiased w.r.t. the id column, identical text runs
#: as a Spark SQL filter and inside the DuckDB oracle wrapper.
_LCG_GATE = _CC_LCG_SQL + " % 16 = 3"

#: per-event-output keys (full output > ROW_CAP → digest tier) and the
#: gate column for their bounded-slice full value hash.
SLICE_GATES = {
    "stream_dedup": _LCG_GATE.format(col="event_id"),
    "stream_dedup_watermark": _LCG_GATE.format(col="event_id"),
    "stream_recovery": _LCG_GATE.format(col="event_id"),
    "stream_session_drain": _LCG_GATE.format(col="user_id"),
}


def main() -> None:
    super_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/superscale_100x"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _REPO, "PARITY100_STREAMING_r19.json"
    )
    import duckdb

    from parity import assert_parity

    # --- build the density-preserving slice (idempotent, with the
    # same staleness guards build_slice_dirs grew in round 14: the
    # slice dir is keyed by super_dir so two datasets never share a
    # cache; the slice rebuilds when the source parquet is newer OR
    # the spec changed OR a prior COPY was killed mid-write — the spec
    # sidecar is written only after a successful COPY) ---
    import hashlib

    slice_dir = f"{super_dir.rstrip('/')}_stream_slice"
    os.makedirs(slice_dir, exist_ok=True)
    slice_pq = os.path.join(slice_dir, "events.parquet")
    src_pq = os.path.join(super_dir, "events.parquet")
    slice_sql = (
        f"SELECT * FROM read_parquet('{src_pq}') "
        f"WHERE ts < TIMESTAMP '{CUTOFF}' ORDER BY event_id"
    )
    spec_file = os.path.join(slice_dir, "_SLICE_SPEC_events")
    spec_hash = hashlib.sha256(slice_sql.encode()).hexdigest()
    try:
        spec_stale = open(spec_file).read().strip() != spec_hash
    except (OSError, UnicodeDecodeError):
        # round-17: a torn spec write can leave partial multi-byte
        # sequences; degrade to stale (rebuild) like any unreadable
        # spec, never crash the staleness gate
        spec_stale = True
    con = duckdb.connect()
    stale = os.path.exists(slice_pq) and (
        spec_stale
        or (
            os.path.exists(src_pq)
            and os.path.getmtime(src_pq) > os.path.getmtime(slice_pq)
        )
    )
    if stale:
        os.remove(slice_pq)
    if not os.path.exists(slice_pq):
        con.execute(f"COPY ({slice_sql}) TO '{slice_pq}' (FORMAT PARQUET)")
        with open(spec_file, "w") as f:
            f.write(spec_hash + "\n")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{slice_pq}')"
    )
    # non-events tables: symlink the FULL 100× versions into the slice
    # dir (stream×static joins need them); oracle views point the same
    # way — events is the slice, everything else the full table.
    # Table list shared with the batch sweep so a future fixture table
    # cannot be missing only here.
    for t in [t for t in _TABLES if t != "events"]:
        srcp = os.path.join(super_dir, f"{t}.parquet")
        link = os.path.join(slice_dir, f"{t}.parquet")
        if os.path.exists(srcp):
            if os.path.lexists(link):
                os.remove(link)
            os.symlink(srcp, link)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{srcp}')"
            )
    n_slice = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]

    spark = get_spark("parity-super100-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    def flush(results: dict, complete: bool = False) -> dict:
        # incremental write after EVERY key (round-14 self-review —
        # this harness runs ~13 heavy back-to-back drains in one JVM;
        # a crash at key 11 of 13 used to lose the whole sweep) and
        # ONE payload definition for the finished and killed shapes
        counts: dict[str, int] = {}
        for r in results.values():
            counts[r["status"]] = counts.get(r["status"], 0) + 1
        with open(out_json, "w") as f:
            f.write(json.dumps({
                "metric": "streaming availableNow-drain parity at 100x "
                          "density (contiguous 6-day slice of the 100x "
                          "events table; per-event outputs also "
                          "value-hashed on an LCG 1/16 slice)",
                "round": 19,
                "slice_rows": n_slice,
                "slice_cutoff": CUTOFF,
                "row_cap": ROW_CAP,
                "complete": complete,
                "counts": counts,
                "results": results,
            }, indent=1) + "\n")
        return counts

    # resume green results from a killed run — with the same staleness
    # guard as the batch sweep: prior evidence is discarded whenever
    # the slice (or its source) is newer than the results file
    results: dict[str, dict] = {}
    if os.path.exists(out_json):
        newest_src = max(
            (os.path.getmtime(p) for p in (slice_pq, src_pq) if os.path.exists(p)),
            default=0,
        )
        if os.path.getmtime(out_json) < newest_src:
            print(
                "resume: results file predates the slice — discarding "
                "prior results",
                file=sys.stderr,
            )
        else:
            try:
                with open(out_json) as f:
                    prior = json.load(f).get("results", {})
                results = {
                    k: v for k, v in prior.items()
                    if v.get("status") in ("pass", "digest_pass", "slice_pass")
                }
                # round-15 (advisory): a digest parent is only as
                # complete as its __slice companion — the companion is
                # produced INSIDE the parent's record() call, so a
                # carried parent whose companion is absent or red
                # would never re-attempt the slice while the final
                # write still stamps complete:true.  Carry the pair
                # together or not at all: an 'excluded' companion (a
                # recorded slice-over-cap outcome) carries with its
                # parent; anything else drops the parent so the rerun
                # regenerates both records.
                for key, v in list(results.items()):
                    if key in SLICE_GATES and v.get("status") == "digest_pass":
                        comp = prior.get(key + "__slice")
                        if comp and comp.get("status") == "excluded":
                            results[key + "__slice"] = comp
                        elif not (comp and comp.get("status") == "slice_pass"):
                            results.pop(key + "__slice", None)
                            del results[key]
                print(
                    f"resume: {len(results)} green results carried over",
                    file=sys.stderr,
                )
            except (OSError, ValueError, AttributeError, TypeError):
                # round-17: json.load succeeding on `[]`/`null`/string
                # tops (or results rows that aren't dicts) raised
                # AttributeError past the old guard — same class the
                # r14 bench-history loader fixed.  A torn artifact
                # degrades to a fresh sweep, never a crashed resume.
                pass

    def record(key: str, df, oracle_sql: str) -> None:
        t0 = time.perf_counter()
        try:
            n = df.count()
            if n > ROW_CAP:
                s_exprs, d_exprs = digest_exprs(df.schema)
                s_digest = [
                    None if v is None else int(v)
                    for v in df.selectExpr(*s_exprs).collect()[0]
                ]
                d_digest = [
                    None if v is None else int(v)
                    for v in con.execute(
                        f"SELECT {', '.join(d_exprs)} FROM ({oracle_sql})"
                    ).fetchone()
                ]
                match = s_digest == d_digest
                results[key] = {
                    "status": "digest_pass" if match else "digest_FAIL",
                    "rows": n,
                    "digest_terms": len(s_digest),
                    "ceiling": "per-event output > row cap: digest is the "
                               "full-output ceiling; see __slice for values",
                    "sec": round(time.perf_counter() - t0, 1),
                }
                if not match:
                    results[key]["spark_digest"] = s_digest
                    results[key]["oracle_digest"] = d_digest
                gate = SLICE_GATES.get(key)
                if match and gate is not None:
                    # bounded-slice FULL VALUE HASH on ~1/16 of the
                    # output (round-10 verdict #5): the digest above
                    # proves whole-output counts/sums; this proves
                    # row-for-row values on an unbiased LCG-gated slice
                    t1 = time.perf_counter()
                    skey = key + "__slice"
                    try:
                        sdf = df.filter(gate)
                        n2 = sdf.count()
                        if n2 > ROW_CAP:
                            results[skey] = {
                                "status": "excluded",
                                "reason": f"slice still {n2} rows > cap",
                            }
                        else:
                            assert_parity(
                                sdf, con,
                                f"SELECT * FROM ({oracle_sql}) WHERE {gate}",
                                skey,
                            )
                            results[skey] = {
                                "status": "slice_pass",
                                "rows": n2,
                                "slice": "LCG-gated 1/16 of the drained "
                                         "output, full value hash",
                                "sec": round(time.perf_counter() - t1, 1),
                            }
                    except AssertionError as exc:
                        results[skey] = {
                            "status": "slice_FAIL",
                            "detail": str(exc)[:400],
                            "sec": round(time.perf_counter() - t1, 1),
                        }
                    except Exception as exc:  # noqa: BLE001
                        results[skey] = {
                            "status": "ERROR",
                            "detail": f"{type(exc).__name__}: {str(exc)[:300]}",
                            "sec": round(time.perf_counter() - t1, 1),
                        }
                    print(f"{skey}: {results[skey]['status']} "
                          f"({results[skey].get('rows', '?')} rows)",
                          file=sys.stderr)
            else:
                assert_parity(df, con, oracle_sql, key)
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
              f"({results[key].get('rows', '?')} rows, "
              f"{results[key]['sec']} s)", file=sys.stderr)
        flush(results)

    # --- registered keys, run verbatim against the slice dir.
    # stream_session_drain is the registered complete-mode
    # session_window drain (this harness's round-9 inline copy
    # graduated into the registry; calling the key keeps them from
    # diverging).  A key missing from the registry is RECORDED as
    # excluded, never silently skipped — a rename/typo/conditional
    # registration must be visible in the artifact, not shrink it. ---
    for key in (
        "stream_dedup", "stream_stateful", "stream_tumbling",
        "stream_sliding", "stream_watermark_late", "stream_join_stream",
        "stream_join_static", "stream_foreachbatch", "stream_union",
        "stream_recovery", "stream_dedup_watermark", "stream_session_drain",
    ):
        if key in results:
            continue
        if key not in QUERIES or key not in ORACLES:
            results[key] = {
                "status": "excluded",
                "reason": "not registered (rename? conditional registration?)",
            }
            print(f"{key}: excluded (not registered)", file=sys.stderr)
            flush(results)
            continue
        try:
            df = QUERIES[key](spark, slice_dir)
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            results[key] = {"status": "ERROR",
                            "detail": f"{type(exc).__name__}: {str(exc)[:300]}",
                            "sec": None}
            print(f"{key}: ERROR (build)", file=sys.stderr)
            flush(results)
            continue
        record(key, df, ORACLES[key])

    counts = flush(results, complete=True)
    print(json.dumps({"written": out_json, "counts": counts}))


if __name__ == "__main__":
    main()
