"""Public model-apply API — the engine's ML surface.

This is the user-facing equivalent of the reference's workflow
(kjchavez/pyspark-caffe: load a model, broadcast it, run forward
passes over distributed data — SURVEY.md §0/§2.10, architecture per
the SparkNet family, arXiv:1511.06051). Models here are plain numpy
weight dicts — no framework dependency; swap `forward` for a real
framework call on clusters that have one.

Every function:
  * broadcasts weights once (executor-local thereafter),
  * runs inside Arrow-batched pandas UDFs (each batch = a minibatch),
  * keeps the DataFrame lazy — composable with any other operator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from pyspark_caffe_spark.nputil import round_half_away


@dataclass(frozen=True)
class LinearModel:
    """A (out_dim × in_dim) linear map + optional bias + activation."""

    weights: np.ndarray  # (out, in) or (in,) for scalar output
    bias: np.ndarray | float = 0.0
    activation: str = "identity"  # identity | sigmoid | relu | softmax

    def forward(self, x: np.ndarray) -> np.ndarray:
        z = x @ (self.weights.T if self.weights.ndim == 2 else self.weights)
        z = z + self.bias
        if self.activation == "sigmoid":
            return 1.0 / (1.0 + np.exp(-z))
        if self.activation == "relu":
            return np.maximum(z, 0.0)
        if self.activation == "softmax":
            e = np.exp(z - z.max(axis=-1, keepdims=True))
            return e / e.sum(axis=-1, keepdims=True)
        return z

    @classmethod
    def from_npz(cls, path: str, activation: str = "identity") -> "LinearModel":
        """Load weights saved via np.savez(path, weights=..., bias=...)."""
        data = np.load(path)
        return cls(
            weights=data["weights"],
            bias=data["bias"] if "bias" in data else 0.0,
            activation=activation,
        )


def _batches(series: pd.Series) -> np.ndarray:
    return np.stack(series.to_numpy()).astype(np.float64)


def score_column(df: DataFrame, model: LinearModel, input_col: str, output_col: str = "score", ndigits: int | None = None) -> DataFrame:
    """Append a scalar model score per row (reference: net.forward →
    single output blob)."""
    bc = df.sparkSession.sparkContext.broadcast(model)

    @pandas_udf("double")
    def _score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        m = bc.value
        for s in batches:
            out = m.forward(_batches(s))
            yield pd.Series(round_half_away(out, ndigits) if ndigits is not None else out)

    return df.withColumn(output_col, _score(F.col(input_col).cast("array<double>")))


def extract_features(df: DataFrame, model: LinearModel, input_col: str, output_col: str = "features", ndigits: int | None = None) -> DataFrame:
    """Append an array feature column (reference: blob extraction)."""
    bc = df.sparkSession.sparkContext.broadcast(model)

    @pandas_udf("array<double>")
    def _feat(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        m = bc.value
        for s in batches:
            out = m.forward(_batches(s))
            if ndigits is not None:
                out = round_half_away(out, ndigits)
            yield pd.Series(list(out))

    return df.withColumn(output_col, _feat(F.col(input_col).cast("array<double>")))


def predict_class(
    df: DataFrame,
    model: LinearModel,
    input_col: str,
    output_col: str = "pred",
    ndigits: int | None = None,
) -> DataFrame:
    """Append argmax class prediction from a multi-output model.

    With ``ndigits`` the argmax runs over ROUNDED scores (first-max
    wins, matching a SQL ``CASE GREATEST(...) WHEN ...`` in class
    order) so near-tie predictions are cross-engine stable — required
    for oracle-checked keys."""
    bc = df.sparkSession.sparkContext.broadcast(model)

    @pandas_udf("int")
    def _pred(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        m = bc.value
        for s in batches:
            out = m.forward(_batches(s))
            if ndigits is not None:
                out = round_half_away(out, ndigits)
            yield pd.Series(np.argmax(out, axis=1).astype("int32"))

    return df.withColumn(output_col, _pred(F.col(input_col).cast("array<double>")))


def train_parameter_averaging(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    dim: int,
    rounds: int = 3,
    local_steps: int = 20,
    lr: float = 0.05,
    partitions: int = 8,
) -> tuple[np.ndarray, list[float]]:
    """Parameter-averaging SGD for ridge-style linear regression — the
    SparkNet loop: broadcast w → local SGD per partition (mapInPandas)
    → collect K small weight vectors → average → repeat.

    Returns (final weights incl. bias, MSE history of length rounds+1 —
    one loss per pre-round weight vector PLUS the final averaged
    weights, so the last entry scores what you actually get back).
    The only driver-side data is K×(dim+1) floats per round.
    """
    data = df.select(
        F.col(feature_col).cast("array<double>").alias("x"),
        F.col(label_col).cast("double").alias("y"),
    ).repartition(partitions)
    data.cache()
    w = np.zeros(dim + 1)
    losses: list[float] = []

    def make_local_sgd(w0: np.ndarray) -> Callable:
        def local_sgd(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            w = w0.copy()
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.hstack([np.stack(pdf["x"].to_numpy()), np.ones((len(pdf), 1))])
                y = pdf["y"].to_numpy()
                for _ in range(local_steps):
                    w -= lr * (2.0 * x.T @ (x @ w - y) / len(y))
            yield pd.DataFrame({"w": [list(w)]})

        return local_sgd

    def eval_mse(w: np.ndarray) -> float:
        wl = [float(v) for v in w]
        pred = F.aggregate(
            F.zip_with("x", F.array(*[F.lit(v) for v in wl[:dim]]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ) + F.lit(wl[dim])
        return float(
            data.select(F.avg(F.pow(pred - F.col("y"), 2)).alias("m")).collect()[0]["m"]
        )

    for _ in range(rounds):
        losses.append(eval_mse(w))
        local = data.mapInPandas(make_local_sgd(w), schema="w array<double>")
        w = np.mean([np.array(r["w"]) for r in local.collect()], axis=0)
    losses.append(eval_mse(w))  # score the FINAL averaged weights too

    data.unpersist()
    return w, losses
