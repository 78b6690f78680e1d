"""Window functions — SURVEY.md §2.5.

Every window here is partitioned (by customer / user / priority):
a global un-partitioned window funnels ALL rows through one task and
is forbidden at scale. Order keys always carry a unique tiebreak
column so results are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_caffe_spark.registry import query
from pyspark_caffe_spark.tables import load_table


@query(
    "win_rank_topk",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def win_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number — one shuffle on the
    partition key; per-group sort only (never a global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile sharing one window spec (computed in a
    single Window exec, one shuffle). Compound order key makes ntile
    bucket assignment deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "win_percent",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — relative-position windows (the
    percentile-of-row primitives used for score normalization)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           value - LAG(value)  OVER w AS delta_prev,
           LEAD(value) OVER w - value AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-to-event deltas (lag/lead). Single subtraction of
    identical doubles — bit-exact across engines, no rounding needed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        (F.lead("value").over(w) - F.col("value")).alias("delta_next"),
    )


@query(
    "win_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
    FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend — explicit ROWS frame. The frame order
    is identical in both engines, so the prefix sums agree (rounded)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_spend"),
    )


@query(
    "win_range_frame",
    oracle="""
    WITH c AS (
      SELECT o_orderkey, o_orderpriority, o_orderdate,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             EPOCH(o_orderdate) AS ep
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority, o_orderdate,
           CAST((2 * CAST(SUM(cents) OVER w AS BIGINT) * 100 + COUNT(*) OVER w)
                // (2 * COUNT(*) OVER w) AS DOUBLE) / 10000.0 AS trailing_avg
    FROM c
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY ep
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing average via a RANGE frame over epoch seconds.

    Spark's rangeBetween needs a numeric order key — cast the timestamp
    to long (seconds); 604800 = 7 days. The oracle uses EPOCH() for the
    identical frame arithmetic.

    AVG(double) over a sliding frame is summation-order sensitive (Spark
    re-accumulates the frame; DuckDB uses a segment tree), and even with
    an exact decimal SUM the two engines' ROUND(double, 4) disagree on
    decimal-halfway quotients (x.62875 → .6288 vs .6287).  So the whole
    "average rounded to 4 decimals" is computed in INTEGER arithmetic:
    cents = exact price*100; round-half-up(sum_cents*100 / cnt) =
    (2*sum_cents*100 + cnt) div (2*cnt); one final division of the same
    integer by the same constant is bit-identical on both engines.
    """
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "cents", (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_orderdate").cast("timestamp_ltz").cast("long"))
        .rangeBetween(-604800, 0)
    )
    framed = orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.sum("cents").over(w).alias("_sum_c"),
        F.count(F.lit(1)).over(w).alias("_cnt"),
    )
    return framed.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        (
            F.expr("(2 * _sum_c * 100 + _cnt) DIV (2 * _cnt)").cast("double")
            / F.lit(10000.0)
        ).alias("trailing_avg"),
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS grp
      FROM events
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS run_len, MIN(ts) AS run_start
    FROM seq GROUP BY user_id, event_type, grp
    HAVING COUNT(*) >= 3
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user, via the row_number-difference trick (global seq minus
    per-type seq is constant within a run). Both windows share the
    user_id partition, so one shuffle serves both; runs of >= 3 are
    the \"streak\" output. Ties on ts are broken by event_id in BOTH
    engines — determinism requirement for any oracle over windows."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_type)
    )
    return (
        seq.groupBy("user_id", "event_type", "grp")
        .agg(F.count("*").alias("run_len"), F.min("ts").alias("run_start"))
        .filter(F.col("run_len") >= 3)
        .drop("grp")
    )


@query(
    "win_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) — equi-height bucketing per segment (the quartile/
    decile assignment behind score binning and per-stratum splits).
    Deterministic tie-break on the key so both engines agree on
    boundary rows."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
    )


# Truncated EWMA with decay 3/4 over 20 terms (tail weight
# 0.75^20 ≈ 0.3%).  Truncation is what BOUNDS the per-row state (a
# true recursive EWMA needs an unbounded running value that no
# engine's window frame expresses without a sequential per-partition
# scan), and the RATIONAL decay is what makes the result engine-exact:
# weight_k = 0.75^k = 3^k/4^19-normalized to the INTEGER
# a_k = 3^k·4^(19-k), so numerator and denominator are exact LONG
# sums (float weighted sums drifted 1 ULP between Spark and DuckDB —
# measured, round 9).  Magnitude bound: cents ≤ ~5e6 per event gives
# N ≤ 5e6·Σa_k ≈ 5.4e18 < 2^63, ANSI raises beyond instead of
# wrapping.
_EWMA_TERMS = 20
_EWMA_A = [3**k * 4 ** (_EWMA_TERMS - 1 - k) for k in range(_EWMA_TERMS)]


def _ewma_oracle() -> str:
    lags = ",\n             ".join(
        f"LAG(value, {k}) OVER w AS l{k}" for k in range(1, _EWMA_TERMS)
    )
    num = f"c * {_EWMA_A[0]}"
    den = f"{_EWMA_A[0]}"
    for k in range(1, _EWMA_TERMS):
        cl = f"CAST(ROUND(l{k} * 100) AS BIGINT)"
        num += f" + (CASE WHEN l{k} IS NULL THEN 0 ELSE {cl} * {_EWMA_A[k]} END)"
        den += f" + (CASE WHEN l{k} IS NULL THEN 0 ELSE {_EWMA_A[k]} END)"
    return f"""
    WITH lagged AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS c,
             {lags}
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts,
           CAST(({num}) AS DOUBLE) / CAST(100 * ({den}) AS DOUBLE) AS ewma
    FROM lagged
    """


@query("win_ewma", oracle=_ewma_oracle())
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    (the smoothing behind rate/engagement trend features), as a
    TRUNCATED EWMA: ewma_i = Σ_{k<20} 0.75^k·x_{i-k} / Σ 0.75^k over
    the lags that exist (pandas ``ewm(adjust=True)`` semantics cut at
    20 terms).

    Scale shape: ONE window spec (partition user_id, order ts +
    unique tiebreak), so all 19 lags evaluate in a single Window exec
    after a single shuffle on user_id — per-row state is a bounded
    20-slot frame, never a per-partition sequential recursion.

    Exactness: values are 2dp-grid, so each term is integer cents ×
    the integer weight 3^k·4^(19-k); numerator and denominator are
    exact associative LONG sums (a float weighted sum drifted 1 ULP
    between engines), and the single final double division of two
    identical integers is bit-identical — no rounding column, no
    halfway hazard."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    # cents ONCE per row in a pre-window projection, then lag the LONG:
    # lag(cents(value)) ≡ cents(lag(value)) exactly (same deterministic
    # expression over the same source row), but the original evaluated
    # round(value·100)+cast inside every one of the 19 lag terms —
    # 19 double-rounds per row.  Measured at sf0.1: 1.96 s → 0.85 s
    # median, zero row diffs (round 18, guide §1.2 per-task work).
    # Still ONE window spec over ONE user_id exchange (plan-locked).
    ev2 = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("_c"),
    )
    num = F.col("_c") * F.lit(_EWMA_A[0])
    den = F.lit(_EWMA_A[0])
    for k in range(1, _EWMA_TERMS):
        lk = F.lag("_c", k).over(w)
        num = num + F.when(lk.isNull(), F.lit(0)).otherwise(lk * F.lit(_EWMA_A[k]))
        den = den + F.when(lk.isNull(), F.lit(0)).otherwise(F.lit(_EWMA_A[k]))
    return ev2.select(
        "event_id",
        "user_id",
        "ts",
        (num.cast("double") / (F.lit(100) * den).cast("double")).alias("ewma"),
    )
