"""ML model-apply layer — SURVEY.md §2.10.

The semantic port of the reference's surface (kjchavez/pyspark-caffe:
distributed Caffe inference / feature extraction / parameter-averaged
training over Spark; the reference directory is empty, so the
architecture follows the published SparkNet/CaffeOnSpark family —
SURVEY.md §0). Caffe itself is never imported: the model is a
deterministic numpy linear model, which reproduces the operator
semantics (broadcast weights → per-batch forward pass → new columns).

Execution model (the part that matters at 100 TB):
  * weights are broadcast once per executor, NOT shipped per task;
  * the forward pass runs inside an Arrow-batched pandas UDF — each
    Arrow batch (spark.sql.execution.arrow.maxRecordsPerBatch) is the
    reference's "minibatch";
  * data never leaves the JVM except through the vectorized Arrow
    channel — no row-at-a-time Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from pyspark_caffe_spark.registry import query
from pyspark_caffe_spark.tables import load_table

DIM = 64
N_CLASSES = 10

# Deterministic model weights, rounded to 6 decimals so the SAME
# literals can be embedded in the DuckDB oracle SQL (decimal literals
# parse to identical doubles in both engines).
_rng = np.random.default_rng(42)
W_SCORE = np.round(_rng.standard_normal(DIM), 6)  # 64 → 1 scorer
W_FEAT = np.round(_rng.standard_normal((4, DIM)), 6)  # 64 → 4 extractor
W_CLS = np.round(_rng.standard_normal((N_CLASSES, DIM)), 6)  # 64 → 10 classifier


def _sql_vec(v: np.ndarray) -> str:
    return "[" + ", ".join(repr(float(x)) for x in v) + "]"


def _emb_matrix(series: pd.Series) -> np.ndarray:
    return np.stack(series.to_numpy()).astype(np.float64)


@query(
    "ml_model_apply",
    oracle=f"""
    SELECT vec_id, label,
           ROUND(1 / (1 + EXP(-LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]),
                                                {_sql_vec(W_SCORE)}))), 6) AS score
    FROM embeddings
    """,
)
def ml_model_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched model inference over a column (reference analog: Caffe
    ``net.forward`` per minibatch). Broadcast weights + iterator-style
    pandas UDF: weights deserialize once per worker, then every Arrow
    batch is one vectorized numpy forward pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    bw = spark.sparkContext.broadcast(W_SCORE)

    @pandas_udf("double")
    def score_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        w = bw.value
        for s in batches:
            x = _emb_matrix(s)
            z = x @ w
            yield pd.Series(np.round(1.0 / (1.0 + np.exp(-z)), 6))

    return emb.select(
        "vec_id", "label", score_udf(F.col("embedding").cast("array<double>")).alias("score")
    )


@query(
    "ml_feature_extract",
    oracle=f"""
    SELECT vec_id,
           [ROUND(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), {_sql_vec(W_FEAT[0])}), 6),
            ROUND(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), {_sql_vec(W_FEAT[1])}), 6),
            ROUND(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), {_sql_vec(W_FEAT[2])}), 6),
            ROUND(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), {_sql_vec(W_FEAT[3])}), 6)
           ] AS features
    FROM embeddings
    """,
)
def ml_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction producing a new array column (reference
    analog: Caffe blob extraction): projects each embedding through a
    4×64 matrix in one numpy matmul per Arrow batch."""
    emb = load_table(spark, sf_dir, "embeddings")
    bw = spark.sparkContext.broadcast(W_FEAT)

    @pandas_udf("array<double>")
    def feat_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        w = bw.value
        for s in batches:
            x = _emb_matrix(s)
            feats = np.round(x @ w.T, 6)
            yield pd.Series(list(feats))

    return emb.select("vec_id", feat_udf(F.col("embedding").cast("array<double>")).alias("features"))


@query("ml_predict_join")  # rows-only: argmax near-ties are not cross-engine stable
def ml_predict_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify embeddings (argmax of a 10×64 linear model), join the
    prediction against the stored label, return the confusion matrix.
    The groupBy after model-apply shuffles only (label, pred, count)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bw = spark.sparkContext.broadcast(W_CLS)

    @pandas_udf("int")
    def predict_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        w = bw.value
        for s in batches:
            x = _emb_matrix(s)
            yield pd.Series(np.argmax(x @ w.T, axis=1).astype("int32"))

    return (
        emb.select("vec_id", "label", predict_udf(F.col("embedding").cast("array<double>")).alias("pred"))
        .groupBy("label", "pred")
        .agg(F.count("*").alias("n"))
    )


@query(
    "ml_batch_score_topk",
    oracle=f"""
    SELECT vec_id, label,
           ROUND(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), {_sql_vec(W_SCORE)}), 6) AS score
    FROM embeddings
    ORDER BY score DESC, vec_id
    LIMIT 10
    """,
)
def ml_batch_score_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every row, return the global top-10: model-apply feeding
    TakeOrderedAndProject (per-partition top-k, k-row driver merge —
    no global sort at any scale). Ordering on the ROUNDED score so
    near-tie ranking is cross-engine stable."""
    emb = load_table(spark, sf_dir, "embeddings")
    bw = spark.sparkContext.broadcast(W_SCORE)

    @pandas_udf("double")
    def score_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        w = bw.value
        for s in batches:
            yield pd.Series(np.round(_emb_matrix(s) @ w, 6))

    return (
        emb.select("vec_id", "label", score_udf(F.col("embedding").cast("array<double>")).alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(10)
    )


@query("ml_train_iter")  # rows-only: iterative optimisation is not SQL-expressible
def ml_train_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameter-averaging SGD (the SparkNet loop, arXiv:1511.06051 —
    the reference's training architecture): broadcast weights → each
    partition runs local gradient steps over its Arrow batches
    (mapInPandas) → collect the K partition weight vectors (K ~ #tasks,
    tiny) → average on the driver → rebroadcast. Three rounds of ridge
    regression of label on embedding; returns per-round train MSE,
    which must decrease (asserted in tests).

    The ONLY driver-side collect is K×(DIM+1) floats per round — the
    data itself never leaves the executors.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("x"),
        F.col("label").cast("double").alias("y"),
    ).repartition(8)
    emb.cache()
    losses = []
    w = np.zeros(DIM + 1)  # weights + bias

    def make_local_sgd(w0: np.ndarray):
        def local_sgd(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            w = w0.copy()
            lr = 0.05
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.stack(pdf["x"].to_numpy())
                x = np.hstack([x, np.ones((len(x), 1))])
                y = pdf["y"].to_numpy()
                for _ in range(20):
                    grad = 2.0 * x.T @ (x @ w - y) / len(y)
                    w -= lr * grad
            yield pd.DataFrame({"w": [list(w)], "n": [1]})

        return local_sgd

    for it in range(3):
        # evaluate current weights (distributed, JVM-side dot product)
        wl = [float(v) for v in w]
        pred = F.aggregate(
            F.zip_with("x", F.array(*[F.lit(v) for v in wl[:DIM]]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ) + F.lit(wl[DIM])
        mse = emb.select(F.avg(F.pow(pred - F.col("y"), 2)).alias("mse")).collect()[0]["mse"]
        losses.append((it, float(mse)))
        # one parameter-averaging round
        local = emb.mapInPandas(make_local_sgd(w), schema="w array<double>, n int")
        ws = local.collect()
        w = np.mean([np.array(r["w"]) for r in ws], axis=0)

    emb.unpersist()
    return spark.createDataFrame(
        [(i, round(m, 6)) for i, m in losses], schema="iteration int, mse double"
    )
