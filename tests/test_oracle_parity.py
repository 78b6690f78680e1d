"""Every oracle-checkable query key, compared Spark vs DuckDB at the
driver's scale factor — the pre-flight for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from pyspark_caffe_spark.queries import ORACLES, QUERIES
from tests.parity import assert_parity


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_parity(key, spark, duck, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    assert_parity(df, duck, ORACLES[key], key=key)


def test_all_query_keys_callable():
    assert len(QUERIES) >= 50, f"only {len(QUERIES)} keys registered"
    assert set(ORACLES) <= set(QUERIES)
