"""Query registry — the single source for the driver contract.

Each operator from SURVEY.md §2 registers itself here via the
:func:`query` decorator.  ``QUERIES[key](spark, sf_dir)`` returns a
DataFrame; ``ORACLES[key]`` (when present) is the equivalent DuckDB SQL
run against the same parquet fixtures.  Keys without an oracle get the
driver's weaker rows-only check — keep that set minimal.

Column-name contract: the driver sorts columns by name before hashing
values, so every computed column must carry the SAME alias in the
DataFrame code and in the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``key``, optionally with DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco
