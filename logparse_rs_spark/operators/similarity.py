"""Similarity search over an embedding column (array<float>).

- brute_force_topk : exact cosine top-k per query — the correctness baseline.
  Dot products run in ONE Arrow-batched numpy matmul per partition against a
  broadcast query matrix; top-k per query via groupBy + min_by-style window.
- lsh_topk         : random-hyperplane (signed projection) LSH buckets as the
  scale path — candidates share >=1 hyperplane-band bucket, then exact cosine
  re-rank on candidates only. At 10^12 rows the bucket join replaces the
  all-pairs scan; buckets are hash-uniform.

The query set is assumed small (broadcastable) — the standard ANN serving
shape. Both return (query_id, vec_id, cos_sim, rank).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str
                     ) -> Tuple[np.ndarray, np.ndarray]:
    rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in rows], dtype=np.int64)
    qm = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(qm, axis=1)
    norms[norms == 0] = 1.0
    return qids, qm / norms[:, None]


def cosine_scores(vectors: DataFrame, queries: DataFrame,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  query_id_col: str = "query_id") -> DataFrame:
    """(query_id, vec_id, cos_sim) for every (query, vector) pair, computed
    as a per-batch numpy matmul against the broadcast query matrix."""
    qids, qmat = _collect_queries(queries, query_id_col, vec_col)
    n_q = len(qids)

    schema = T.StructType([
        T.StructField(query_id_col, T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ])

    def score(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(vm, axis=1)
            norms[norms == 0] = 1.0
            sims = (vm / norms[:, None]) @ qmat.T        # (rows, n_q)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            yield pd.DataFrame({
                query_id_col: np.repeat(qids, len(ids)),
                id_col: np.tile(ids, n_q),
                "cos_sim": sims.T.reshape(-1),
            })

    return vectors.select(id_col, vec_col).mapInPandas(score, schema=schema)


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k per query; ties break (cos desc, vec_id asc)."""
    scored = cosine_scores(vectors, queries, id_col, vec_col, query_id_col)
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("cos_sim", F.round("cos_sim", 6))
    )


def hyperplane_signatures(vectors: DataFrame, dim: int, n_planes: int = 32,
                          seed: int = 13, id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Sign-bit signature per vector under `n_planes` fixed random
    hyperplanes (seeded — deterministic across runs and engines)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    @F.pandas_udf(T.LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        vm = np.array(vecs.tolist(), dtype=np.float64)
        bits = (vm @ planes.T) > 0                     # (rows, n_planes)
        weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
        return pd.Series(
            (bits.astype(np.uint64) @ weights).view(np.int64),
            index=vecs.index)

    return vectors.withColumn("lsh_sig", sig(F.col(vec_col)))


def lsh_topk(vectors: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             n_planes: int = 32, bands: int = 4, seed: int = 13,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """ANN top-k: hyperplane-LSH band buckets -> candidate set -> exact
    cosine re-rank. Recall grows with bands; candidates per query stay
    ~bucket-sized instead of the full table."""
    width = n_planes // bands
    mask = (1 << width) - 1

    def banded(df, idc):
        sigs = hyperplane_signatures(df, dim, n_planes, seed, idc, vec_col)
        return sigs.select(
            F.col(idc), F.col(vec_col),
            F.posexplode(F.array(*[
                F.shiftrightunsigned(F.col("lsh_sig"), i * width)
                .bitwiseAND(F.lit(mask))
                for i in range(bands)
            ])).alias("band", "bucket"),
        )

    v = banded(vectors, id_col).alias("v")
    q = banded(queries, query_id_col).alias("q")
    cands = (
        v.join(F.broadcast(q), (F.col("v.band") == F.col("q.band"))
               & (F.col("v.bucket") == F.col("q.bucket")))
        .select(F.col(f"q.{query_id_col}").alias(query_id_col),
                F.col(f"v.{id_col}").alias(id_col),
                F.col(f"v.{vec_col}").alias("v_vec"),
                F.col(f"q.{vec_col}").alias("q_vec"))
        .dropDuplicates([query_id_col, id_col])
    )
    # exact cosine on candidates, JVM-side higher-order functions
    dot = F.aggregate(
        F.zip_with("v_vec", "q_vec", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    scored = cands.withColumn(
        "cos_sim",
        F.when((norm(F.col("v_vec")) == 0) | (norm(F.col("q_vec")) == 0), 0.0)
        .otherwise(dot / (norm(F.col("v_vec")) * norm(F.col("q_vec")))),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.select(query_id_col, id_col, "cos_sim")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("cos_sim", F.round("cos_sim", 6))
    )
