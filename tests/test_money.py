"""money.exact_money_sum — exactness, negatives, and the DECIMAL
equivalence the helper's callers rely on for oracle parity."""

import random

from pyspark.sql import functions as F

from pyspark_caffe_spark.money import TT, exact_money_sum, money_units


def test_matches_decimal_sum_exactly(spark):
    """Long split-sum == per-row DECIMAL(18,4) sum, bit-for-bit, on
    4dp-grid values spanning signs and magnitudes up to ~1e6."""
    rng = random.Random(9)
    rows = [(i % 7, rng.randint(-10**10, 10**10) / TT) for i in range(5000)]
    df = spark.createDataFrame(rows, "g int, v double")
    fast = dict(
        df.groupBy("g").agg(exact_money_sum(F.col("v"), "s")).collect()
    )
    slow = dict(
        df.groupBy("g")
        .agg(F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("s"))
        .collect()
    )
    assert fast == slow


def test_money_units_rounds_to_grid(spark):
    """Doubles carrying 2dp/4dp values recover the exact integer
    ten-thousandths (the round-trip the per-row conversion needs)."""
    vals = [0.01, 1234.56, 99999.99, -0.03, 950.0004, -88888.8888]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r["u"] for r in df.select(money_units(F.col("v")).alias("u")).collect()]
    assert got == [round(v * TT) for v in vals]


def test_split_reassembly_is_exact_at_large_totals(spark):
    """Group totals past 2^53 ten-thousandths (where a double sum
    loses integer exactness) still reassemble exactly from the hi/lo
    long sums."""
    # 2000 rows of 999,999.9999 → total 1.9999...e10 money units
    # = 2e14 ten-thousandths; repeated to push past 2^53 would cost
    # runtime, so instead verify against Python-exact arithmetic.
    df = spark.createDataFrame([(999_999.9999,)] * 2000, "v double")
    got = df.agg(exact_money_sum(F.col("v"), "s")).collect()[0]["s"]
    exact = 2000 * 9_999_999_999  # ten-thousandths, exact int
    assert got == float(exact) / TT


def test_null_semantics_match_decimal_sum(spark):
    """SUM skips NULLs and returns NULL for all-NULL groups in both
    the DECIMAL spelling and the split-long spelling — the hi/lo
    parts are NULL exactly when the input is, so both long sums skip
    the same rows."""
    rows = [(0, 1.5), (0, None), (0, 2.25), (1, None), (1, None)]
    df = spark.createDataFrame(rows, "g int, v double")
    fast = dict(
        df.groupBy("g").agg(exact_money_sum(F.col("v"), "s")).collect()
    )
    slow = dict(
        df.groupBy("g")
        .agg(F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("s"))
        .collect()
    )
    assert fast == slow == {0: 3.75, 1: None}
