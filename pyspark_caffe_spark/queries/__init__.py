"""Operator implementations, grouped by SURVEY.md §2 section.

Importing this package populates the registry in
:mod:`pyspark_caffe_spark.registry`.
"""

from pyspark_caffe_spark.queries import (  # noqa: F401
    aggregates,
    analytics_ext,
    functions,
    joins,
    llm,
    ml,
    relational,
    scale_ops,
    similarity,
    streaming,
    windows,
)
from pyspark_caffe_spark.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
