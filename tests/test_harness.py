"""Guards on the driver-contract harness itself (__spark_entry__).

The sweep-order logic decides WHICH keys get driver evidence each
round (the driver checks ~50 keys/round in ``queries()`` order), so a
silent ordering regression strands keys without CORRECTNESS rows for
rounds at a time — exactly what happened to ml_kmeans/ml_train_mllib
in r01–r04.  These tests pin the ordering contract against synthetic
CORRECTNESS fixtures so it can't drift.
"""

from __future__ import annotations

import importlib.util
import json
from unittest import mock


import __spark_entry__ as entry
from pyspark_caffe_spark import tables
from pyspark_caffe_spark.queries import ORACLES, QUERIES


def _order_with_rows(monkeypatch, rows: dict) -> list[str]:
    monkeypatch.setattr(entry, "_driver_rows", lambda: rows)
    # the code-changed re-sweep set varies per round; ordering tests
    # that aren't ABOUT it must not depend on its current content
    # (test_sweep_order_rechecks_code_changed_keys installs its own
    # synthetic set AFTER calling this helper)
    monkeypatch.setattr(entry, "_CODE_CHANGED", {})
    return list(entry.queries())


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED_HASH = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "no_oracle"}


def test_sweep_order_red_then_unswept_then_green(monkeypatch):
    """Red keys first, never-swept second, green last."""
    keys = list(QUERIES)
    red_key, green_key = keys[0], keys[1]
    unswept_key = keys[2]
    rows = {k: dict(GREEN) for k in keys}
    rows[red_key] = dict(RED_HASH)
    del rows[unswept_key]
    order = _order_with_rows(monkeypatch, rows)
    assert order[0] == red_key
    assert order[1] == unswept_key
    assert set(order[2:]) == set(keys) - {red_key, unswept_key}


def test_sweep_order_never_swept_before_green(monkeypatch):
    """A key with NO driver row in any round must precede every green
    key — this is the exact regression that left ml_kmeans unswept."""
    keys = list(QUERIES)
    rows = {k: dict(GREEN) for k in keys}
    for never_swept in ("ml_kmeans", "ml_train_mllib"):
        rows.pop(never_swept, None)
    order = _order_with_rows(monkeypatch, rows)
    first_green = next(i for i, k in enumerate(order) if rows.get(k))
    for never_swept in ("ml_kmeans", "ml_train_mllib"):
        assert order.index(never_swept) < first_green


def test_sweep_order_graduated_rows_only_resweeps(monkeypatch):
    """A rows-only row whose key HAS a hash oracle now (graduated —
    since round 6 EVERY key has one) must re-sweep (group 1).  The
    registry's rows-only set is empty, so the no-oracle branch is
    exercised by faking one key out of ORACLES."""
    keys = list(QUERIES)
    oracled, faked_unoracled = keys[0], keys[1]
    assert oracled in ORACLES
    fake_oracles = {k: v for k, v in ORACLES.items() if k != faked_unoracled}
    monkeypatch.setattr(entry, "ORACLES", fake_oracles)
    rows = {k: dict(GREEN) for k in QUERIES}
    rows[oracled] = dict(ROWS_ONLY)
    rows[faked_unoracled] = dict(ROWS_ONLY)
    order = _order_with_rows(monkeypatch, rows)
    greens = [k for k in QUERIES if k not in (oracled, faked_unoracled)]
    assert order.index(oracled) < min(order.index(k) for k in greens)
    # unoracled rows-only that ran clean: nothing new to learn
    assert order.index(faked_unoracled) > order.index(oracled)


def test_sweep_order_expensive_sinks_within_group(monkeypatch):
    """_EXPENSIVE_LAST keys sort after cheap keys of the same group so
    a wall-clock-budgeted sweep maximizes keys checked before cutoff."""
    rows: dict = {}  # nothing swept: everything is group 1
    order = _order_with_rows(monkeypatch, rows)
    cheap_max = max(
        order.index(k) for k in QUERIES if k not in entry._EXPENSIVE_LAST
    )
    exp_min = min(
        order.index(k) for k in entry._EXPENSIVE_LAST if k in QUERIES
    )
    assert cheap_max < exp_min


def test_sweep_order_green_keys_stalest_first(monkeypatch):
    """Within the green group, keys whose surviving CORRECTNESS row is
    oldest re-sweep first — the driver checks ~50 keys/round, so
    without this, r01-stamped evidence never refreshes."""
    keys = [k for k in QUERIES if k not in entry._EXPENSIVE_LAST]
    old_key, fresh_key = keys[0], keys[1]
    rows = {k: {**GREEN, "_round": 5} for k in QUERIES}
    rows[old_key] = {**GREEN, "_round": 1}
    rows[fresh_key] = {**GREEN, "_round": 5}
    order = _order_with_rows(monkeypatch, rows)
    assert order.index(old_key) < order.index(fresh_key)
    # oldest green key precedes every same-cost green key of round 5
    assert order.index(old_key) == min(
        order.index(k) for k in keys
    )


def test_driver_rows_latest_round_wins_with_deterministic_tiebreak(
    monkeypatch, tmp_path
):
    """r10 must beat r2 (numeric, not lexicographic order), and two
    files with the SAME round number (r4 vs r04) resolve by path so the
    winner is deterministic regardless of glob order."""
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"k": {"v": "r2"}}))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps({"k": {"v": "r10"}}))
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps({"t": {"v": "zero-padded"}}))
    (tmp_path / "CORRECTNESS_r4.json").write_text(json.dumps({"t": {"v": "bare"}}))
    monkeypatch.setattr(entry, "_REPO_DIR", str(tmp_path))
    rows = entry._driver_rows()
    assert rows["k"] == {"v": "r10", "_round": 10}
    # same round number: lexicographically later path wins — the value
    # matters less than that it NEVER flips between runs
    assert rows["t"] == {"v": "bare", "_round": 4}


def test_stream_tws_gate_matches_dependency():
    """stream_tws registers iff google.protobuf is importable — the
    gate is feature-detection, not dead code.  In this container the
    dependency is absent, so the key must be absent too (and
    stream_stateful covers the stateful-streaming capability)."""
    from pyspark_caffe_spark.queries import streaming as streaming_mod

    has_pb = importlib.util.find_spec("google") is not None and (
        importlib.util.find_spec("google.protobuf") is not None
    )
    assert streaming_mod._HAS_TWS_DEPS == has_pb
    assert ("stream_tws" in QUERIES) == has_pb
    if has_pb:  # when deps exist the key must also carry its oracle
        assert "stream_tws" in ORACLES


def test_ensure_session_confs_memoized_but_verifying(spark):
    """The memoized fast path must still VERIFY (read-only gets) and
    re-correct external drift: a grading harness resetting
    session.timeZone on the live session mid-run would silently skew
    every timestamp if memoization skipped the check entirely
    (ADVICE r5)."""
    tables.ensure_session_confs(spark)
    assert spark in tables._CONFIGURED_SESSIONS

    # memoized + in-sync: must not SET (sets invalidate cached plans)
    calls: list = []
    real_set = spark.conf.set
    with mock.patch.object(
        spark.conf, "set", side_effect=lambda *a: calls.append(a)
    ):
        tables.ensure_session_confs(spark)
    assert calls == [], "set() called although confs were already correct"

    # externally drifted: the next ensure must restore both confs
    real_set("spark.sql.session.timeZone", "America/New_York")
    try:
        tables.ensure_session_confs(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        real_set("spark.sql.session.timeZone", "UTC")


def test_recycle_session_resets_process_globals(monkeypatch):
    """``recycle_session`` (round-10 verdict #6: the JVM-hygiene
    recipe promoted from tools/parity_super100.py into the library)
    must stop live sessions — including extra handles passed via
    ``also_stop`` — shut down the py4j gateway, null every pyspark
    process global ``getOrCreate`` consults, and return whatever
    ``get_spark`` builds.  All of it exception-tolerantly: the whole
    point is to run while the JVM is in an arbitrary state of dead
    (here, ``getActiveSession`` raising and one session whose
    ``stop()`` raises — both observed failure modes of a dead
    gateway).  Pure monkeypatch unit test: no real JVM is restarted
    (a real recycle costs ~15 s and would kill the shared fixture)."""
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    import pyspark_caffe_spark.session as sess

    stopped: list[str] = []

    class FakeSession:
        def __init__(self, name: str, raise_on_stop: bool = False):
            self.name, self.raise_on_stop = name, raise_on_stop

        def stop(self):
            stopped.append(self.name)
            if self.raise_on_stop:
                raise RuntimeError("py4j socket closed")

    class FakeGateway:
        down = False

        def shutdown(self):
            self.down = True

    def raising_get_active():
        raise RuntimeError("dead gateway: reflection failed")

    gw = FakeGateway()
    inst = FakeSession("instantiated", raise_on_stop=True)
    extra = FakeSession("extra")
    sentinel = object()

    monkeypatch.setattr(
        SparkSession, "getActiveSession", staticmethod(raising_get_active)
    )
    monkeypatch.setattr(SparkSession, "_instantiatedSession", inst, raising=False)
    monkeypatch.setattr(SparkSession, "_activeSession", inst, raising=False)
    monkeypatch.setattr(SparkSession, "_defaultSession", inst, raising=False)
    monkeypatch.setattr(SparkContext, "_gateway", gw, raising=False)
    monkeypatch.setattr(SparkContext, "_jvm", object(), raising=False)
    monkeypatch.setattr(
        SparkContext, "_active_spark_context", object(), raising=False
    )
    monkeypatch.setattr(sess, "get_spark", lambda app_name, cpus=None: sentinel)

    out = sess.recycle_session("test-recycle", also_stop=(extra,))

    assert out is sentinel, "must return whatever get_spark builds"
    assert stopped == ["extra", "instantiated"], stopped
    assert gw.down, "gateway.shutdown() not called"
    for attr in ("_gateway", "_jvm", "_active_spark_context"):
        assert getattr(SparkContext, attr) is None, attr
    for attr in ("_instantiatedSession", "_activeSession", "_defaultSession"):
        assert getattr(SparkSession, attr) is None, attr

    # hasattr guard (round-11 advice): a global the installed pyspark
    # does NOT define (_defaultSession was removed upstream; 4.1.2 has
    # only _instantiatedSession/_activeSession) must not be fabricated
    # as a dead class attribute by the reset loop.
    monkeypatch.delattr(SparkSession, "_defaultSession", raising=False)
    sess.recycle_session("test-recycle-2")
    assert not hasattr(SparkSession, "_defaultSession"), (
        "reset loop fabricated a class attribute pyspark never defines"
    )


def test_sweep_order_rechecks_code_changed_keys(monkeypatch):
    """A green driver row that validates OLDER code than the tree
    (entry._CODE_CHANGED maps key → round its implementation changed)
    must re-sweep ahead of the green pool — and stop doing so once a
    row from that round (or later) exists.  Uses a synthetic
    _CODE_CHANGED so the pin survives the real set changing every
    round."""
    keys = [k for k in QUERIES if k not in entry._EXPENSIVE_LAST]
    changed, need = keys[3], 7
    # stale green row (validates pre-change code) → group 1 (front)
    rows = {k: {**GREEN, "_round": need - 1} for k in QUERIES}
    monkeypatch.setattr(entry, "_driver_rows", lambda: rows)
    monkeypatch.setattr(entry, "_CODE_CHANGED", {changed: need})
    order = list(entry.queries())
    assert order.index(changed) == 0, (
        f"{changed} (row r{need - 1} < change r{need}) must re-sweep first"
    )
    # fresh green row (validates the changed code) → back to group 2
    rows2 = {k: {**GREEN, "_round": 1} for k in QUERIES}
    rows2[changed] = {**GREEN, "_round": need}
    monkeypatch.setattr(entry, "_driver_rows", lambda: rows2)
    order = list(entry.queries())
    assert order.index(changed) > len(keys) // 2, (
        "a row at/after the change round must rejoin normal staleness order"
    )


def test_bench_drift_detector_pure_functions(tmp_path, monkeypatch):
    """bench.py's per-key steal detector (round-11 verdict ask #1):
    history medians exclude contended runs, the drift check counts only
    the SLOW direction, and the history file round-trips with its cap.
    Pure functions — no Spark session involved."""
    import bench

    runs = [
        {"queries": {"a": 1.0, "b": 2.0}, "contended": False},
        {"queries": {"a": 1.2, "b": 2.2}, "contended": False},
        # contended run must NOT ratchet the reference upward
        {"queries": {"a": 9.0, "b": 9.0}, "contended": True},
    ]
    ref = bench._history_medians(runs)
    assert ref == {"a": 1.1, "b": 2.1}
    # all-contended history still yields a reference (fallback to all)
    assert bench._history_medians([runs[2]]) == {"a": 9.0, "b": 9.0}

    # slow direction only: a 30%-slower key drifts, a faster key never
    drifted = bench._drifting_keys({"a": 1.1 * 1.3, "b": 0.5}, ref)
    assert drifted == ["a"]
    # at exactly the threshold (25%) it does NOT drift (strict >)
    assert bench._drifting_keys({"a": 1.1 * 1.25}, ref) == []
    # keys with no history are skipped, not flagged
    assert bench._drifting_keys({"zzz": 99.0}, ref) == []

    # history file round-trip + cap
    path = tmp_path / "BENCH_MEDIANS.json"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(path))
    assert bench._load_history() == []
    acc: list = []
    for i in range(bench.HISTORY_CAP + 3):
        bench._save_history(acc, {"queries": {"a": float(i)}, "contended": False})
        acc = bench._load_history()
    assert len(acc) == bench.HISTORY_CAP
    assert acc[-1]["queries"]["a"] == float(bench.HISTORY_CAP + 2)


def test_bench_drift_detector_extra_tier_and_rerun_pool():
    """Round-12 verdict #1 + advice: the EXTRA tier drifts against its
    OWN history field, and rerun-sourced records are excluded from the
    reference pool once ≥2 pristine clean records exist (pass-2 medians
    of a drift-triggered rerun can carry residual steal)."""
    import bench

    runs = [
        {
            "queries": {"a": 1.0},
            "queries_extra": {"x": 0.5, "y": 1.0},
            "contended": False,
        },
        {
            "queries": {"a": 1.2},
            "queries_extra": {"x": 0.7, "y": 1.2},
            "contended": False,
        },
        # legacy record with no extras field contributes nothing to the
        # extras reference (and must not crash the median builder)
        {"queries": {"a": 1.1}, "contended": False},
    ]
    ref_extra = bench._history_medians(runs, field="queries_extra")
    assert ref_extra == {"x": 0.6, "y": 1.1}
    # headline medians unaffected by the extras field
    assert bench._history_medians(runs) == {"a": 1.1}
    # the same drift check applies per tier
    assert bench._drifting_keys({"x": 0.6 * 1.3, "y": 1.0}, ref_extra) == ["x"]

    # rerun exclusion: with two pristine clean records, a clean-but-
    # rerun-sourced record (residual steal risk) is left out of the
    # reference for ITS tier only
    runs_rerun = [
        {"queries": {"a": 1.0}, "queries_extra": {"x": 1.0}, "contended": False},
        {"queries": {"a": 1.0}, "queries_extra": {"x": 1.0}, "contended": False},
        {
            "queries": {"a": 5.0},
            "queries_extra": {"x": 5.0},
            "contended": False,
            "rerun": True,
        },
    ]
    assert bench._history_medians(runs_rerun) == {"a": 1.0}
    # the third record is rerun-tagged only for the HEADLINE tier, so
    # the extras pool (pristine by its own rerun_extra flag) keeps it
    assert bench._history_medians(runs_rerun, field="queries_extra") == {"x": 1.0}
    runs_rerun[2]["rerun_extra"] = True
    assert bench._history_medians(runs_rerun, field="queries_extra") == {"x": 1.0}

    # with only ONE pristine record, fall back to the full clean pool
    # (a single run must not become THE reference)
    runs_thin = [
        {"queries": {"a": 1.0}, "contended": False},
        {"queries": {"a": 3.0}, "contended": False, "rerun": True},
    ]
    assert bench._history_medians(runs_thin) == {"a": 2.0}

    # round-13 review finding: legacy records WITHOUT the tier's field
    # are vacuously pristine and must not be counted toward the ≥2
    # threshold — here the only extras DATA lives in rerun_extra-tagged
    # records, and selecting the fieldless "pristine" pool would return
    # {} and silently disable extras drift detection
    runs_legacy = [
        {"queries": {"a": 1.0}, "contended": False},
        {"queries": {"a": 1.0}, "contended": False},
        {
            "queries": {"a": 1.0},
            "queries_extra": {"x": 2.0},
            "contended": False,
            "rerun_extra": True,
        },
    ]
    assert bench._history_medians(runs_legacy, field="queries_extra") == {
        "x": 2.0
    }, "fieldless records must not crowd real extras data out of the pool"


def test_bench_history_cap_is_per_scale_factor(tmp_path, monkeypatch):
    """Round-13 review finding: a global HISTORY_CAP would let a dozen
    smoke runs at another sf evict every sf0.1 reference record and
    silently disable the sf0.1 drift detector — the cap is per sf
    (records predating the sf field default to 0.1, same as the
    reference-pool filter)."""
    import bench

    path = tmp_path / "BENCH_MEDIANS.json"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(path))
    acc: list = []
    # two sf0.1 reference records (one legacy without the sf field)
    bench._save_history(acc, {"queries": {"a": 1.0}, "contended": False})
    acc = bench._load_history()
    bench._save_history(acc, {"sf": 0.1, "queries": {"a": 1.1}, "contended": False})
    acc = bench._load_history()
    # a full cap's worth of sf0.001 smoke runs
    for i in range(bench.HISTORY_CAP + 2):
        bench._save_history(
            acc, {"sf": 0.001, "queries": {"a": 0.01}, "contended": False}
        )
        acc = bench._load_history()
    kept_01 = [r for r in acc if r.get("sf", 0.1) == 0.1]
    kept_0001 = [r for r in acc if r.get("sf") == 0.001]
    assert len(kept_01) == 2, "other-sf runs must not evict the sf0.1 references"
    assert len(kept_0001) == bench.HISTORY_CAP
    # order within the file stays chronological
    assert acc[0].get("sf", 0.1) == 0.1 and acc[-1]["sf"] == 0.001


def test_bench_drift_gate_rerun_semantics():
    """_drift_gate (shared by both tiers): no rerun when ≤DRIFT_KEYS_MAX
    keys drift; on a board-wide drift it reruns exactly once, reports
    the per-key MIN as the timings, and hands the SECOND pass's plain
    medians to the history record (never the biased-low min-merge)."""
    import bench

    keys = [f"k{i}" for i in range(10)]
    ref = {k: 1.0 for k in keys}

    # pass 1: everything 2x slow (steal burst); pass 2: clean
    passes = [
        ({k: 2.0 for k in keys}, {k: 1.9 for k in keys}),
        ({k: 1.05 for k in keys}, {k: 1.0 for k in keys}),
    ]
    calls = []

    def run_set(names):
        calls.append(list(names))
        return passes[len(calls) - 1]

    timings, best, drifted, rerun, hist = bench._drift_gate(run_set, keys, ref)
    assert len(calls) == 2 and calls[0] == keys == calls[1]
    assert rerun is True
    assert timings == {k: 1.05 for k in keys}, "min of the two medians"
    assert best == {k: 1.0 for k in keys}
    assert drifted == [], "post-merge drift re-evaluated"
    assert hist == {k: 1.05 for k in keys}, (
        "history must record pass-2 plain medians, not the min-merge"
    )

    # clean first pass: exactly one run_set call, no rerun flag
    calls.clear()
    passes[:] = [({k: 1.1 for k in keys}, {k: 1.0 for k in keys})]
    timings, best, drifted, rerun, hist = bench._drift_gate(run_set, keys, ref)
    assert len(calls) == 1 and rerun is False and drifted == []
    assert hist == timings

    # both passes contended: drifted stays over threshold → the caller
    # reports contended=true
    calls.clear()
    passes[:] = [
        ({k: 2.0 for k in keys}, {k: 2.0 for k in keys}),
        ({k: 2.0 for k in keys}, {k: 2.0 for k in keys}),
    ]
    timings, _, drifted, rerun, hist = bench._drift_gate(run_set, keys, ref)
    assert rerun is True and len(drifted) > bench.DRIFT_KEYS_MAX
    assert hist == {k: 2.0 for k in keys}


def test_rotation_quota_covers_whole_oldest_expensive_tier(monkeypatch):
    """The rotation quota must promote EVERY expensive green key in the
    oldest evidence tier, not a fixed 5 — the round-12 regression: six
    r6-stamped expensive keys with a 5-slot quota left the
    registry-order tiebreak loser stranded past position 250 while the
    budget-limited sweep needed the full tier cleared.  The cap-at-8
    applies ONLY when the whole oldest tier (cheap + expensive)
    outgrows one ~50-key budget — the round-13 refinement: a 41-key r7
    tier with nine expensive members fits the budget entirely, so a
    blanket cap would strand the ninth for a round with zero benefit."""
    expensive = [k for k in QUERIES if k in entry._EXPENSIVE_LAST]
    cheap = [k for k in QUERIES if k not in entry._EXPENSIVE_LAST]
    assert len(expensive) >= 10, "fixture premise: enough expensive keys"

    def order_with_tier(
        n_oldest: int, n_cheap_oldest: int = 0, n_unswept: int = 0
    ) -> list[str]:
        rows = {k: {**GREEN, "_round": 9} for k in QUERIES}
        for k in expensive[:n_oldest]:
            rows[k] = {**GREEN, "_round": 6}
        for k in cheap[:n_cheap_oldest]:
            rows[k] = {**GREEN, "_round": 6}
        for k in cheap[n_cheap_oldest:n_cheap_oldest + n_unswept]:
            del rows[k]  # group 1: no driver row yet
        monkeypatch.setattr(entry, "_driver_rows", lambda: rows)
        monkeypatch.setattr(entry, "_CODE_CHANGED", {})
        return list(entry.queries())

    # 6-key oldest tier: ALL six must sort into the front of group 2
    order = order_with_tier(6)
    worst = max(order.index(k) for k in expensive[:6])
    n_cheap = len(cheap)
    assert worst < 50, f"an oldest-tier expensive key stranded at {worst}"

    # 10-expensive-key oldest tier that FITS the budget (tier_all=10):
    # all 10 promote — no key may strand when the sweep would reach the
    # whole tier anyway
    order = order_with_tier(10)
    positions = sorted(order.index(k) for k in expensive[:10])
    assert sum(1 for p in positions if p < 50) == 10, positions

    # oversized oldest tier (10 expensive + 40 cheap = 50 > 45): the
    # cap kicks in — exactly 8 promote, 2 sink past the cheap pool so
    # cheap stale keys keep most of the budget
    order = order_with_tier(10, n_cheap_oldest=40)
    positions = sorted(order.index(k) for k in expensive[:10])
    assert sum(1 for p in positions if p < 50) == 8, positions
    assert positions[-1] > n_cheap, "unpromoted keys must sink past the cheap pool"

    # group-0/1 keys consume budget AHEAD of the promoted tier and
    # must count toward the fit check: a 10-key expensive tier that
    # would fit alone (10 ≤ 45) does NOT fit behind 40 unswept keys
    # (40 + 10 = 50 > 45), so the cap must kick in — the round-13
    # review finding on the original bucket-only fit test
    order = order_with_tier(10, n_unswept=40)
    positions = sorted(order.index(k) for k in expensive[:10])
    assert sum(1 for p in positions if p < 50) == 8, positions


def test_bench_history_loader_degrades_on_garbage(tmp_path, monkeypatch):
    """Round-14 self-review: a BENCH_MEDIANS.json whose top level is
    not a {"runs": [...]} object (hand edit, partial write, legacy
    format) must degrade to an EMPTY history — never crash the bench
    run with AttributeError before any output is produced."""
    import bench

    path = tmp_path / "BENCH_MEDIANS.json"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(path))
    for garbage in ("[]", "null", '"a string"', '{"runs": 7}',
                    '{"runs": [1, 2, "x"]}', "{not json"):
        path.write_text(garbage)
        assert bench._load_history() == [], repr(garbage)
    # a healthy file still loads
    path.write_text('{"version": 1, "runs": [{"queries": {"a": 1.0}}]}')
    assert bench._load_history() == [{"queries": {"a": 1.0}}]


def test_bench_history_loader_never_raises_fuzz(tmp_path, monkeypatch):
    """Round-17 (verdict #3): extend the r16 parser-fuzz pattern to
    the bench-history loader — ANY byte content in BENCH_MEDIANS.json
    (binary garbage, torn multi-byte sequences, valid-JSON-wrong-shape)
    must degrade to a list of dicts, never crash the bench before it
    produces output.  UnicodeDecodeError is a ValueError subclass, so
    the existing (OSError, ValueError) guard already covers text-mode
    decode failures — this property PINS that, so a future narrowing
    of the except clause fails a test instead of shipping the same
    crash class the ANN-manifest fuzz found in round 16."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import bench

    path = tmp_path / "BENCH_MEDIANS.json"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(path))

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=512))
    def check(blob: bytes) -> None:
        path.write_bytes(blob)
        runs = bench._load_history()
        assert isinstance(runs, list)
        assert all(isinstance(r, dict) for r in runs)

    check()
    # round-trip on top: what _save_history-shaped content stores,
    # the loader returns verbatim
    path.write_text('{"version": 1, "runs": [{"queries": {"a": 1.0}}]}')
    assert bench._load_history() == [{"queries": {"a": 1.0}}]


def test_driver_rows_never_raises_fuzz(tmp_path, monkeypatch):
    """Round-17: property-pin the graded surface's own evidence
    loader — ``_driver_rows`` feeds the sweep ORDER, so a crash on a
    torn/garbage CORRECTNESS_r*.json would break ``queries()`` for
    the grading driver itself.  UnicodeDecodeError is a ValueError
    subclass (covered by the existing guard) and non-dict tops /
    non-dict rows are isinstance-filtered; this pins both so a
    future narrowing fails a test, not a round."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    monkeypatch.setattr(entry, "_REPO_DIR", str(tmp_path))

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=256))
    def check(blob: bytes) -> None:
        (tmp_path / "CORRECTNESS_r3.json").write_bytes(blob)
        rows = entry._driver_rows()
        assert isinstance(rows, dict)
        for k, row in rows.items():
            assert isinstance(row, dict) and isinstance(row.get("_round"), int)

    check()
    # wrong-shape-but-valid JSON degrades row-by-row, healthy rows load
    (tmp_path / "CORRECTNESS_r3.json").write_text(
        '{"a": {"hash_match": true}, "b": [1], "c": "x"}'
    )
    rows = entry._driver_rows()
    assert rows == {"a": {"hash_match": True, "_round": 3}}
