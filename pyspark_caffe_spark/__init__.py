"""pyspark_caffe_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and
data-processing capabilities of the ``kjchavez/pyspark-caffe``
reference (distributed model apply / feature extraction over Spark),
extended with a relational/analytic core and LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis).  See SURVEY.md for the full operator inventory.

Design rules (enforced throughout):
  * DataFrame / Spark SQL only — the logical plan is declared, Catalyst
    + AQE pick the physical strategy.
  * Python UDFs are the slow path: built-in functions first, Arrow
    pandas UDFs where Python is unavoidable, row-at-a-time UDFs never
    in a hot path.
  * Every operator is written for a 1000-executor / 100 TB deployment:
    broadcast small dims, pre-aggregate before shuffles, keep filters
    and projections pushed into the scan.
"""

from pyspark_caffe_spark.session import get_spark, recycle_session
from pyspark_caffe_spark.tables import TABLE_NAMES, load_tables

__all__ = [
    "get_spark",
    "recycle_session",
    "load_tables",
    "TABLE_NAMES",
    # public API modules (import directly):
    #   pyspark_caffe_spark.model    — model apply / feature extract / training
    #   pyspark_caffe_spark.textops  — tokenize / shingle / fingerprint / dedup
    #   pyspark_caffe_spark.vecops   — similarity search over embeddings
]
__version__ = "0.1.0"
