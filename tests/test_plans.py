"""Physical-plan regression tests: the scale architecture (pushdown,
pruning, broadcast, TakeOrdered, equi-join band joins) asserted from
explain output, so a refactor can't silently regress the plan shape
that PERF.md documents."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from pyspark_caffe_spark.queries import QUERIES


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


CASES = [
    # (key, must-match regex, must-NOT-match regex, reason)
    ("filter_conj", r"PushedFilters: \[[^\]]*LessThan\(l_quantity", None, "predicate pushdown to parquet"),
    ("filter_conj", r"PushedFilters: \[[^\]]*EqualTo\(l_returnflag", None, "equality pushdown"),
    ("project_compute", r"ReadSchema: [^\n]*l_extendedprice", r"ReadSchema: [^\n]*l_shipdate", "column pruning: unused columns not read"),
    ("join_broadcast", r"BroadcastHashJoin", r"SortMergeJoin", "dims broadcast, no fact shuffle"),
    ("join_multiway", r"BroadcastHashJoin", None, "dims broadcast in q5 chain"),
    ("join_q3_topk", r"TakeOrderedAndProject", None, "top-10 is TakeOrdered, not global sort"),
    ("topk_global", r"TakeOrderedAndProject", None, "top-k merge"),
    ("ml_batch_score_topk", r"TakeOrderedAndProject", None, "top-k after model apply"),
    ("filter_subquery_in", r"LeftSemi", None, "IN-subquery as semi join"),
    ("join_range_bucketed", None, r"BroadcastNestedLoopJoin", "band join must be an equi-join"),
    ("agg_hash_groupby", r"HashAggregate(.|\n)*HashAggregate", None, "partial + final aggregation"),
    ("win_rank_topk", r"Window", r"CartesianProduct", "partitioned window"),
    ("join_lateral", r"Window", r"CartesianProduct|BroadcastNestedLoopJoin", "LATERAL decorrelated to window, not nested loop"),
    ("agg_q6_selective", r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(l_shipdate", None, "Q6 date range pushed to parquet"),
    ("join_null_safe", r"BroadcastHashJoin", r"BroadcastNestedLoopJoin|CartesianProduct", "null-safe equality stays a hash join"),
    ("join_partition_pruned", r"dynamicpruning", None, "runtime partition pruning from the dim filter"),
]


@pytest.mark.parametrize("key,want,ban,reason", CASES, ids=[f"{c[0]}:{c[3][:25]}" for c in CASES])
def test_plan_shape(key, want, ban, reason, spark, sf_dir):
    plan = plan_of(QUERIES[key](spark, sf_dir))
    if want:
        assert re.search(want, plan), f"{key}: expected /{want}/ ({reason})"
    if ban:
        assert not re.search(ban, plan), f"{key}: must not contain /{ban}/ ({reason})"
