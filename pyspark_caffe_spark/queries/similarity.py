"""Similarity search over embeddings — SURVEY.md §2.11.

Fixture embeddings are 64-dim float32, unit-normalized (FIXTURES.md),
so dot product == cosine similarity throughout.

Scale design: the naive crossJoin + per-pair higher-order dot product
measured 20.5 s at a mere 2k×2k (BASELINE.md) — it is never used here.
  * Exact top-k pairs: broadcast the (small) embedding matrix, numpy
    block-matmul per partition inside mapInPandas, per-partition top-k,
    k-row global merge. Python executes O(n/p) matmuls, the shuffle
    carries only candidate rows.
  * Threshold joins / ANN: LSH bucketing (random hyperplane signs) so
    only same-bucket pairs are compared — the 100 TB path, plus
    MLlib's BucketedRandomProjectionLSH as the library variant.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_caffe_spark.registry import query
from pyspark_caffe_spark.tables import load_table

DIM = 64
_rng = np.random.default_rng(7)
# Random hyperplanes for sign-LSH, rounded so Spark and any SQL twin
# see identical literals.
LSH_PLANES = np.round(_rng.standard_normal((8, DIM)), 6)


def _load_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


@query(
    "sim_knn_exact",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ORDER BY cos DESC, id_a, id_b
    LIMIT 10
    """,
)
def sim_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 most-similar pairs, exact.

    Broadcast the full N×64 matrix (N·64·8 bytes — 1 MB at N=2k; at
    true scale this becomes the IVF/LSH path below), then each
    partition computes its rows' scores against all j>i columns with
    ONE numpy matmul and keeps its local top-k. Global answer = k-row
    TakeOrdered merge. Ordering on the rounded score keeps near-ties
    cross-engine stable.
    """
    emb = _load_emb(spark, sf_dir)
    rows = emb.select("vec_id", "emb")
    # broadcast (ids, matrix) — built once, executor-local thereafter
    pdf = rows.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    bc = spark.sparkContext.broadcast((ids, mat))
    k = 10

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            my_ids = pdf["vec_id"].to_numpy()
            scores = x @ all_mat.T  # (batch, N)
            mask = my_ids[:, None] < all_ids[None, :]  # dedupe: only i<j pairs
            scores = np.where(mask, scores, -np.inf)
            flat = scores.ravel()
            take = min(k, int(mask.sum()))
            if take == 0:
                continue
            idx = np.argpartition(-flat, take - 1)[:take]
            r, c = np.unravel_index(idx, scores.shape)
            yield pd.DataFrame(
                {
                    "id_a": my_ids[r],
                    "id_b": all_ids[c],
                    "cos": np.round(flat[idx], 6),
                }
            )

    cand = rows.mapInPandas(local_topk, schema="id_a long, id_b long, cos double")
    return cand.orderBy(F.desc("cos"), F.asc("id_a"), F.asc("id_b")).limit(k)


@query(
    "sim_knn_query",
    oracle="""
    SELECT b.vec_id, b.label,
           ROUND(LIST_DOT_PRODUCT(CAST(b.embedding AS DOUBLE[]),
                                  CAST(q.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE b.vec_id <> 0
    ORDER BY cos DESC, b.vec_id
    LIMIT 10
    """,
)
def sim_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query brute-force ANN baseline: top-10 neighbours of
    vec_id=0 by cosine. The query vector becomes a literal array, the
    dot product is a codegen'd zip_with/aggregate — fully JVM-side,
    embarrassingly parallel scan + TakeOrdered."""
    emb = _load_emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("emb").collect()[0]["emb"]
    qlit = F.array(*[F.lit(float(v)) for v in qvec])
    dot = F.aggregate(
        F.zip_with("emb", qlit, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", "label", F.round(dot, 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "sim_threshold_join",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label_a, b.label AS label_b,
           ROUND(LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])), 6) >= 0.6
    """,
)
def sim_threshold_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine ≥ τ — embedding-based near-dup detection.

    Exact semantics (the oracle is the full quadratic join), computed
    via broadcast matrix + numpy block scoring like sim_knn_exact, but
    emitting every pair over threshold. The threshold comparison uses
    the ROUNDED score on both sides so boundary pairs agree. At 100 TB
    the same operator runs after LSH bucketing (sim_knn_lsh) —
    exactness traded for candidate pruning."""
    tau = 0.6
    emb = _load_emb(spark, sf_dir)
    rows = emb.select("vec_id", "emb", "label")
    pdf = rows.select("vec_id", "emb", "label").toPandas()
    order = np.argsort(pdf["vec_id"].to_numpy())
    ids = pdf["vec_id"].to_numpy()[order]
    labels = pdf["label"].to_numpy()[order]
    mat = np.stack(pdf["emb"].to_numpy()[order]).astype(np.float64)
    bc = spark.sparkContext.broadcast((ids, labels, mat))

    def over_tau(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_labels, all_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            my_ids = pdf["vec_id"].to_numpy()
            my_labels = pdf["label"].to_numpy()
            scores = np.round(x @ all_mat.T, 6)
            mask = (my_ids[:, None] < all_ids[None, :]) & (scores >= tau)
            r, c = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": my_ids[r],
                    "id_b": all_ids[c],
                    "label_a": my_labels[r].astype("int32"),
                    "label_b": all_labels[c].astype("int32"),
                    "cos": scores[r, c],
                }
            )

    return rows.mapInPandas(
        over_tau, schema="id_a long, id_b long, label_a int, label_b int, cos double"
    )


@query("sim_knn_lsh")  # rows-only: LSH bucketing is engine/library-specific
def sim_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate similarity join via MLlib BucketedRandomProjectionLSH
    (requires Vector columns — array_to_vector first). Returns candidate
    pairs with Euclidean distance < 0.9, which for unit vectors is
    cosine > 1 - 0.9²/2 ≈ 0.6. Tests assert recall ≥ 0.8 vs the exact
    threshold join. This is the library-grade 100 TB path: only
    same-bucket pairs are joined."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = _load_emb(spark, sf_dir).withColumn("vec", array_to_vector("emb"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=0.5, numHashTables=6, seed=42
    )
    model = lsh.fit(emb)
    pairs = model.approxSimilarityJoin(emb, emb, 0.9, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("id_a"),
            F.col("datasetB.vec_id").alias("id_b"),
            F.round("dist", 6).alias("dist"),
        )
        .distinct()
    )


@query("sim_lsh_bucketed")  # rows-only: hand-rolled sign-LSH buckets
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled sign-LSH (random hyperplanes): 8-bit signature from
    the signs of fixed random projections — computed entirely with
    codegen'd higher-order functions, no Python. Same-signature pairs
    are the ANN candidates; this is the pre-join bucketing that makes
    the threshold join linear-ish at scale. Returns per-bucket sizes
    (the data for choosing plane count)."""
    emb = _load_emb(spark, sf_dir)
    sig = sum(
        [
            F.when(
                F.aggregate(
                    F.zip_with(
                        "emb",
                        F.array(*[F.lit(float(v)) for v in LSH_PLANES[p]]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                > 0,
                F.lit(1 << p),
            ).otherwise(0)
            for p in range(len(LSH_PLANES))
        ],
        F.lit(0),
    )
    return (
        emb.select("vec_id", sig.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )
