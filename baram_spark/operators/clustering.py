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

    # sequential over docs (required by the reference's running-mean
    # semantics) but VECTORIZED over centroids: one matmul per doc against
    # the centroid matrix instead of a Python loop per centroid.
    dim = mat.shape[1] if mat.size else 0
    cap = 64
    cent = np.zeros((cap, dim), dtype=np.float64)  # running-mean centroids
    cent_norm = np.zeros(cap, dtype=np.float64)
    sizes_arr = np.zeros(cap, dtype=np.int64)
    n_clusters = 0
    assign = np.empty(ids.size, dtype=np.int64)
    for i in range(ids.size):
        v = mat[i]
        best = -1
        if n_clusters:
            cos = cent[:n_clusters] @ v / np.where(
                cent_norm[:n_clusters] == 0, 1.0, cent_norm[:n_clusters]
            )
            # ≥ threshold, best cosine; on exact ties the LAST centroid
            # wins (the original scan replaced on cos >= best_cos)
            c = n_clusters - 1 - int(np.argmax(cos[::-1]))
            if cos[c] >= threshold:
                best = c
        if best < 0:
            if n_clusters == cap:
                cap *= 2
                cent = np.vstack([cent, np.zeros_like(cent)])
                cent_norm = np.concatenate([cent_norm, np.zeros(cap // 2)])
                sizes_arr = np.concatenate(
                    [sizes_arr, np.zeros(cap // 2, dtype=np.int64)]
                )
            cent[n_clusters] = v
            cent_norm[n_clusters] = np.linalg.norm(v)
            sizes_arr[n_clusters] = 1
            assign[i] = n_clusters
            n_clusters += 1
        else:
            # running mean update (engine.rs:282-330)
            cent[best] = (cent[best] * sizes_arr[best] + v) / (
                sizes_arr[best] + 1
            )
            cent_norm[best] = np.linalg.norm(cent[best])
            sizes_arr[best] += 1
            assign[i] = best
    sizes = sizes_arr[:n_clusters].tolist()
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
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket_size: int = 4096,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """→ (cluster_id, doc_id, cluster_size), size-filtered.

    cluster_id = bucket * 2^32 + local id (globally unique, deterministic).

    Per-bucket work is bounded two ways (the 100×-scale requirement —
    a fixed bucket count would put ~n/2^planes docs in every reducer):

    - ``n_planes=None`` (default) derives the bucket count from the corpus
      size so E[bucket] ≈ ``target_bucket_size``.
    - buckets that still exceed ``max_bucket_size`` (skewed regions of
      embedding space; default 8×target) are split once more with an
      independent set of hyperplanes, so no reducer ever sees an unbounded
      group.
    """
    max_bucket = max_bucket_size or 8 * target_bucket_size
    if n_planes is None:
        from .similarity import _derive_n_planes

        # cap 23 keeps split keys (2^n + bucket·2^7 + sub) inside int32
        n_planes = _derive_n_planes(embeddings.count(),
                                    target_bucket_size, cap=23)
    bucketed = random_hyperplane_buckets(
        embeddings, dim, n_planes, vec_col
    ).select(
        "bucket",
        F.col(id_col).alias("doc_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )  # consumed twice (skew count + cluster job) but NOT cached: the
    # projection is one narrow matmul pass, and a .persist() here would
    # pin a full corpus copy in executor storage for the session lifetime
    # (the maintenance loop re-clusters every round)

    # split pathologically skewed buckets with a SECOND, independent LSH
    # (seed-shifted planes): tiny agg over bucket ids, then a sub-bucket
    # column only for rows in oversized buckets. One level suffices to
    # bound the tail by max_bucket / 2^SUB_PLANES in expectation.
    SUB_PLANES = 7  # ≤ 128 sub-buckets; keeps the combined key < 2^31
    counts = bucketed.groupBy("bucket").agg(F.count("*").alias("n"))
    oversized = [
        int(r["bucket"])
        for r in counts.filter(F.col("n") > max_bucket).collect()
    ]
    if oversized:
        sub = random_hyperplane_buckets(
            bucketed, dim, SUB_PLANES, vec_col="vec", seed=10_007,
            out_col="sub",
        )
        # split keys live above 2^n_planes so they can never collide with
        # an unsplit bucket id (those are all < 2^n_planes)
        base = 2 ** n_planes
        bucketed = sub.withColumn(
            "bucket",
            F.when(
                F.col("bucket").isin(oversized),
                F.lit(base)
                + F.col("bucket") * (2 ** SUB_PLANES)
                + F.col("sub"),
            ).otherwise(F.col("bucket")),
        ).drop("sub")

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


def event_clusters(clusters: DataFrame, docs: DataFrame) -> DataFrame:
    """EventCluster-shaped output (``clustering/models.rs:79-120`` +
    ``engine.rs:99-122``): one row per cluster with event_id, title (the
    earliest article's — the reference falls back to an article title when
    no LLM summary exists), primary category (most frequent, deterministic
    tie-break), article_count, first_seen/last_seen, and the article list
    sorted by publication. This is what ``GET /api/events`` serves
    (serve.rs:570-627)."""
    joined = clusters.join(
        docs.select("doc_id", "title", "category", "published_at",
                    "oid", "aid", "url"),
        "doc_id",
    )
    cat = (
        joined.groupBy("cluster_id", "category")
        .agg(F.count("*").alias("cnt"))
        .groupBy("cluster_id")
        .agg(
            F.expr("max_by(category, struct(cnt, category))")
            .alias("category")
        )
    )
    agg = joined.groupBy("cluster_id").agg(
        F.count("*").cast("int").alias("article_count"),
        F.min("published_at").alias("first_seen"),
        F.max("published_at").alias("last_seen"),
        F.expr("min_by(title, struct(published_at, doc_id))").alias("title"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("published_at").alias("published_at"),
                    F.col("doc_id").alias("doc_id"),
                    F.concat_ws("_", "oid", "aid").alias("id"),
                    F.col("title").alias("title"),
                    F.col("url").alias("url"),
                )
            )
        ).alias("arts"),
    )
    return (
        agg.join(cat, "cluster_id")
        .select(
            # format_string pads to ≥6 digits WITHOUT truncating longer
            # ids — lpad would cut a 10+ digit (bucket<<32|local) id to
            # its first 6 chars, colliding every cluster in a bucket
            F.format_string("evt_%06d", "cluster_id").alias("event_id"),
            "title",
            "category",
            "article_count",
            "first_seen",
            "last_seen",
            F.transform(
                "arts",
                lambda a: F.struct(
                    a["id"].alias("id"),
                    a["title"].alias("title"),
                    a["url"].alias("url"),
                ),
            ).alias("articles"),
        )
        .orderBy(F.desc("article_count"), F.asc("event_id"))
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
