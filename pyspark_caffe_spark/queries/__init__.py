"""Operator implementations, grouped by SURVEY.md §2 section.

Importing this package populates the registry in
:mod:`pyspark_caffe_spark.registry`.
"""

# Import order = registry insertion order = the order a budget-limited
# correctness sweep visits keys.  Modules the round-1 sweep never
# reached (joins → scale_ops) go FIRST so a truncated sweep still
# covers them; the modules with round-1-green rows (aggregates,
# relational, streaming — the slow drains last of all) close the list.
from pyspark_caffe_spark.queries import (  # noqa: F401
    tpch_ext,
    joins,
    windows,
    functions,
    ml,
    similarity,
    llm,
    scale_ops,
    aggregates,
    relational,
    analytics_ext,  # pulls in streaming (slow drains) — keeps both last
    streaming,
)
from pyspark_caffe_spark.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
