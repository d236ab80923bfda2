"""Embedding-similarity event clustering (G11).

Spark-native rebuild of the reference's incremental centroid clustering
(``/root/reference/src/clustering/engine.rs:282-330``, defaults
``src/main.rs:159-165``): assign each article to the nearest existing
cluster centroid if cosine ≥ ``threshold`` (default 0.75) else open a new
cluster; centroids are running means; clusters below ``min_size`` (default
2) are dropped; output ordered by cluster size desc.

The reference algorithm is inherently sequential. The distributed version
first buckets vectors with sign-LSH (similar vectors collide with high
probability), then runs the reference's sequential assignment WITHIN each
bucket in parallel (``applyInPandas``), processing rows in doc_id order so
results are deterministic. Clusters never span buckets — the standard
locality-partitioned approximation that makes single-pass clustering
feasible at 10^12 scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .similarity import random_hyperplane_buckets

DEFAULT_THRESHOLD = 0.75
DEFAULT_MIN_SIZE = 2

CLUSTERS_SCHEMA = (
    "bucket int, cluster_id long, doc_id long, cluster_size int"
)


def _assign_bucket(pdf: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """The reference's sequential assignment, one bucket at a time."""
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    ids = pdf["doc_id"].to_numpy()[order]
    mat = np.array(pdf["vec"].tolist(), dtype=np.float64)[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]

    centroids: list[np.ndarray] = []
    sizes: list[int] = []
    assign = np.empty(ids.size, dtype=np.int64)
    for i in range(ids.size):
        v = mat[i]
        best, best_cos = -1, threshold
        for c in range(len(centroids)):
            cen = centroids[c]
            cos = float(v @ cen / (np.linalg.norm(cen) or 1.0))
            if cos >= best_cos:
                best, best_cos = c, cos
        if best < 0:
            centroids.append(v.copy())
            sizes.append(1)
            assign[i] = len(centroids) - 1
        else:
            # running mean update (engine.rs:282-330)
            centroids[best] = (centroids[best] * sizes[best] + v) / (
                sizes[best] + 1
            )
            sizes[best] += 1
            assign[i] = best
    return pd.DataFrame(
        {
            "doc_id": ids,
            "local_cluster": assign,
            "cluster_size": np.array(sizes, dtype=np.int64)[assign],
        }
    )


def cluster_embeddings(
    embeddings: DataFrame,
    dim: int,
    threshold: float = DEFAULT_THRESHOLD,
    min_size: int = DEFAULT_MIN_SIZE,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (cluster_id, doc_id, cluster_size), size-filtered.

    cluster_id = bucket * 2^32 + local id (globally unique, deterministic).
    """
    bucketed = random_hyperplane_buckets(
        embeddings, dim, n_planes, vec_col
    ).select(
        "bucket",
        F.col(id_col).alias("doc_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(key[0])
        out = _assign_bucket(pdf, threshold)
        out.insert(0, "bucket", bucket)
        out["cluster_id"] = (np.int64(bucket) << 32) | out["local_cluster"]
        return out[["bucket", "cluster_id", "doc_id", "cluster_size"]].astype(
            {"bucket": "int32", "cluster_size": "int32"}
        )

    clustered = bucketed.groupBy("bucket").applyInPandas(
        run, schema=CLUSTERS_SCHEMA
    )
    return (
        clustered.filter(F.col("cluster_size") >= min_size)
        .select("cluster_id", "doc_id", "cluster_size")
    )


def cluster_summaries(clusters: DataFrame) -> DataFrame:
    """EventCluster-shaped output: one row per cluster ordered by size desc
    (engine.rs:99-122)."""
    return (
        clusters.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.collect_list("doc_id").alias("doc_ids"),
        )
        .orderBy(F.desc("n_docs"), F.asc("cluster_id"))
    )
