"""Public vector/similarity API over array<float|double> embedding
columns.

Two execution tiers, chosen per call:
  * JVM tier — zip_with/aggregate dot products, codegen'd, for
    per-row scores against a constant query vector;
  * numpy tier — broadcast matrix + block matmul in mapInPandas for
    all-pairs shapes (the broadcast is the same data a broadcast join
    would ship; the naive crossJoin alternative measured 20.5 s at a
    mere 2k×2k — BASELINE.md).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_caffe_spark.nputil import round_half_away


def dot_with(vec_col: str | Column, query: list[float] | np.ndarray) -> Column:
    """JVM-side dot product with a constant vector (codegen'd)."""
    qlit = F.array(*[F.lit(float(v)) for v in query])
    return F.aggregate(
        F.zip_with(vec_col, qlit, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def knn_for_query(
    df: DataFrame,
    query: list[float] | np.ndarray,
    vec_col: str = "emb",
    id_col: str = "vec_id",
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Brute-force top-k for one query vector: scan + TakeOrdered."""
    return (
        df.select(id_col, F.round(dot_with(vec_col, query), ndigits).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str, extra: list[str] | None = None):
    pdf = df.select(id_col, vec_col, *(extra or [])).toPandas()
    order = np.argsort(pdf[id_col].to_numpy())
    ids = pdf[id_col].to_numpy()[order]
    mat = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
    extras = {c: pdf[c].to_numpy()[order] for c in (extra or [])}
    return ids, mat, extras


def topk_pairs(
    df: DataFrame, vec_col: str = "emb", id_col: str = "vec_id", k: int = 10, ndigits: int = 6
) -> DataFrame:
    """Global top-k most-similar (i<j) pairs: broadcast matrix, block
    matmul per partition, local top-k, k-row global merge."""
    ids, mat, _ = _collect_matrix(df, id_col, vec_col)
    bc = df.sparkSession.sparkContext.broadcast((ids, mat))

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            my_ids = pdf[id_col].to_numpy()
            # round BEFORE selecting: the global order (and any SQL
            # oracle) ranks on the rounded score + id tiebreaks, so the
            # local cut must use the same key or boundary rounded-ties
            # get dropped on the wrong side
            scores = round_half_away(x @ all_mat.T, ndigits)
            mask = my_ids[:, None] < all_ids[None, :]
            flat = np.where(mask, scores, -np.inf).ravel()
            take = min(k, int(mask.sum()))
            if take == 0:
                continue
            # pre-cut at the k-th largest VALUE (keeping all rounded
            # ties), then exact (score desc, id_a, id_b) lexsort — the
            # deterministic local top-k
            kth = -np.partition(-flat, take - 1)[take - 1]
            pre = np.nonzero(flat >= kth)[0]
            r_pre, c_pre = np.unravel_index(pre, scores.shape)
            order = np.lexsort((all_ids[c_pre], my_ids[r_pre], -flat[pre]))[:take]
            r, c = r_pre[order], c_pre[order]
            yield pd.DataFrame({"id_a": my_ids[r], "id_b": all_ids[c], "cos": scores[r, c]})

    cand = df.select(id_col, vec_col).mapInPandas(
        local_topk, schema="id_a long, id_b long, cos double"
    )
    return cand.orderBy(F.desc("cos"), F.asc("id_a"), F.asc("id_b")).limit(k)


def threshold_pairs(
    df: DataFrame,
    tau: float,
    vec_col: str = "emb",
    id_col: str = "vec_id",
    extra_cols: list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """All (i<j) pairs with rounded cosine ≥ tau — embedding near-dup
    detection. Exact; LSH-bucket first (lsh_bucket) when the corpus is
    too large for the broadcast tier."""
    extra_cols = extra_cols or []
    ids, mat, extras = _collect_matrix(df, id_col, vec_col, extra_cols)
    bc = df.sparkSession.sparkContext.broadcast((ids, mat, extras))
    # companion columns keep their INPUT types (an int32 label stays
    # int32, a string source stays string) — no forced int cast
    field_type = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = "id_a long, id_b long" + "".join(
        f", {c}_a {field_type[c]}, {c}_b {field_type[c]}" for c in extra_cols
    ) + ", cos double"

    def over_tau(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat, all_extras = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            my_ids = pdf[id_col].to_numpy()
            scores = round_half_away(x @ all_mat.T, ndigits)
            mask = (my_ids[:, None] < all_ids[None, :]) & (scores >= tau)
            r, c = np.nonzero(mask)
            if len(r) == 0:
                continue
            out = {"id_a": my_ids[r], "id_b": all_ids[c]}
            for col in extra_cols:
                out[f"{col}_a"] = pdf[col].to_numpy()[r]
                out[f"{col}_b"] = all_extras[col][c]
            out["cos"] = scores[r, c]
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col, *extra_cols).mapInPandas(over_tau, schema=schema)


def lsh_bucket(
    df: DataFrame, planes: np.ndarray, vec_col: str = "emb", out_col: str = "bucket"
) -> DataFrame:
    """Sign-LSH bucket id from fixed random hyperplanes — JVM-side,
    the pre-join candidate pruning for similarity at scale."""
    sig = sum(
        [
            F.when(dot_with(vec_col, planes[p]) > 0, F.lit(1 << p)).otherwise(0)
            for p in range(len(planes))
        ],
        F.lit(0),
    )
    return df.withColumn(out_col, sig)
