"""Incremental centroid clustering (G11)."""

import numpy as np
import pytest

from baram_spark.operators.clustering import cluster_embeddings, cluster_summaries

DIM = 16


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """60 vectors in 3 tight clusters + 10 outliers (deterministic)."""
    rng = np.random.default_rng(7)
    bases = rng.standard_normal((3, DIM))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows = []
    vid = 0
    for b in range(3):
        for _ in range(20):
            v = bases[b] + 0.05 * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in v], b))
            vid += 1
    for _ in range(10):
        v = rng.standard_normal(DIM)
        rows.append((vid, [float(x) for x in v], -1))
        vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_recovers_planted_clusters(spark, clustered_emb):
    clusters = cluster_embeddings(
        clustered_emb, dim=DIM, threshold=0.75, min_size=2, n_planes=2
    )
    rows = clusters.collect()
    labels = {
        r["vec_id"]: r["label"] for r in clustered_emb.collect()
    }
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(labels[r["doc_id"]])
    # contract of the bucket-partitioned approximation: clusters may SPLIT
    # across LSH buckets but must never MIX planted labels, and each planted
    # label must be (almost) fully recovered across its clusters
    for members in by_cluster.values():
        real = [m for m in members if m >= 0]
        assert len(set(real)) <= 1, f"mixed cluster: {members}"
    covered = {0: 0, 1: 0, 2: 0}
    for members in by_cluster.values():
        for m in members:
            if m >= 0:
                covered[m] += 1
    assert all(v >= 15 for v in covered.values()), covered


def test_membership_and_sizes_consistent(spark, clustered_emb):
    rows = cluster_embeddings(
        clustered_emb, dim=DIM, threshold=0.75, min_size=2, n_planes=2
    ).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for members in by_cluster.values():
        assert all(m["cluster_size"] == len(members) for m in members)


def test_oversized_bucket_split_bounds_work(spark):
    """A deliberately skewed primary bucketing (n_planes=1 → ~n/2 diverse
    vectors per bucket) must be re-split with the secondary LSH so no
    reducer group exceeds the bound; output stays deterministic and every
    doc is still clustered exactly once."""
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(800)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    clusters = cluster_embeddings(
        emb, dim=DIM, threshold=0.99, min_size=1, n_planes=1,
        target_bucket_size=50, max_bucket_size=100,
    )
    out = clusters.collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == 800 and len(set(ids)) == 800
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault(r["cluster_id"] >> 32, 0)
        by_bucket[r["cluster_id"] >> 32] += 1
    # the two primary buckets (~400 docs each) were split: many more groups,
    # every group's work bounded
    assert len(by_bucket) > 2
    assert max(by_bucket.values()) <= 100
    again = sorted((r["cluster_id"], r["doc_id"]) for r in clusters.collect())
    assert again == sorted((r["cluster_id"], r["doc_id"]) for r in out)


def test_adaptive_n_planes_small_corpus(spark, clustered_emb):
    """n_planes=None derives the bucket count from corpus size; at 70 docs
    it must pick the minimum (1 plane) and still recover planted clusters
    without mixing."""
    clusters = cluster_embeddings(
        clustered_emb, dim=DIM, threshold=0.75, min_size=2
    )
    labels = {r["vec_id"]: r["label"] for r in clustered_emb.collect()}
    by_cluster: dict = {}
    for r in clusters.collect():
        by_cluster.setdefault(r["cluster_id"], []).append(labels[r["doc_id"]])
    for members in by_cluster.values():
        real = [m for m in members if m >= 0]
        assert len(set(real)) <= 1, f"mixed cluster: {members}"


def test_summaries_ordered_and_deterministic(spark, clustered_emb):
    clusters = cluster_embeddings(
        clustered_emb, dim=DIM, threshold=0.75, min_size=2, n_planes=2
    )
    summ = cluster_summaries(clusters).collect()
    sizes = [r["n_docs"] for r in summ]
    assert sizes == sorted(sizes, reverse=True)
    again = sorted(
        (r["cluster_id"], r["doc_id"])
        for r in cluster_embeddings(
            clustered_emb, dim=DIM, threshold=0.75, min_size=2, n_planes=2
        ).collect()
    )
    assert again == sorted((r["cluster_id"], r["doc_id"]) for r in clusters.collect())


def test_event_id_no_truncation_for_large_cluster_ids(spark):
    """event_id must NOT truncate large cluster_ids (bucket<<32|local):
    lpad-to-6 cut 10+ digit ids to their first 6 chars, colliding every
    cluster in a nonzero LSH bucket."""
    from datetime import datetime

    from baram_spark.operators.clustering import event_clusters

    big = 1 << 32
    clusters = spark.createDataFrame(
        [(big, 1), (big + 1, 2), (7, 3)], "cluster_id long, doc_id long"
    )
    docs = spark.createDataFrame(
        [(i, f"t{i}", "it", datetime(2024, 1, i), "001", f"{i:010d}",
          f"https://x/{i}") for i in (1, 2, 3)],
        "doc_id long, title string, category string, "
        "published_at timestamp, oid string, aid string, url string",
    )
    rows = event_clusters(clusters, docs).collect()
    ids = [r["event_id"] for r in rows]
    assert len(set(ids)) == 3, ids
    assert f"evt_{big}" in ids and f"evt_{big + 1}" in ids
    assert "evt_000007" in ids  # short ids keep the padded form
