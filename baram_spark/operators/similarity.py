"""Similarity search over embedding columns — brute-force + LSH-bucketed ANN.

The Spark-native analog of the reference's kNN path
(``/root/reference/src/embedding/mod.rs:445-467``, HNSW in OpenSearch) and
``cosine_similarity`` (``src/embedding/vectorize.rs:396-427``).

- ``brute_force_knn``: exact cosine top-k via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side array math — no Python). The correctness
  baseline; O(n) per query but embarrassingly parallel, fine when the query
  set is small and broadcast.
- ``random_hyperplane_buckets`` + ``ann_knn``: sign-LSH bucketing — each
  vector lands in a bucket keyed by the signs of dot products with fixed
  pseudo-random hyperplanes; queries probe only their own bucket. The scale
  path: candidate set shrinks ~2^n_planes-fold; recall traded for bounded
  work per query (the HNSW analog expressible in pure DataFrame ops).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_expr(a, b):
    """Cosine similarity of two array<float/double> columns (JVM-side)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_knn(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of one query vector against the table."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(
            cosine_expr(
                F.transform(F.col(vec_col), lambda x: x.cast("double")), q
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int | None = None) -> np.ndarray:
    rng = np.random.default_rng(SEED if seed is None else seed)
    return rng.standard_normal((n_planes, dim))


def random_hyperplane_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """Add a sign-LSH ``bucket`` column: bit j = sign(v · plane_j)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = None
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for j in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = F.when(_dot(vec, p) > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return embeddings.withColumn(out_col, bucket.cast("int"))


def ann_knn(
    bucketed: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket."""
    planes = _hyperplanes(dim, n_planes)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = int(sum((2 ** j) for j in range(n_planes) if planes[j] @ qv > 0))
    cand = bucketed.filter(F.col("bucket") == qbucket)
    return brute_force_knn(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def pairwise_cosine_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: LSH-bucket, compare only within buckets."""
    b = random_hyperplane_buckets(embeddings, dim, n_planes, vec_col)
    left = b.select(
        F.col("bucket"), F.col(id_col).alias("id1"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v1"),
    )
    right = b.select(
        F.col("bucket"), F.col(id_col).alias("id2"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v2"),
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cosine", F.round(cosine_expr(F.col("v1"), F.col("v2")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )
