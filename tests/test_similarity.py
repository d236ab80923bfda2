"""ANN / similarity-search operators."""

import numpy as np
import pytest

from baram_spark.operators.similarity import (
    ann_knn,
    brute_force_knn,
    pairwise_cosine_dedup,
    random_hyperplane_buckets,
)

DIM = 16


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal(DIM)
    rows = []
    for i in range(30):  # near-duplicates of base
        v = base + 0.02 * rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v]))
    for i in range(30, 90):  # random background
        rows.append((i, [float(x) for x in rng.standard_normal(DIM)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_knn_exact(spark, vectors):
    pdf = vectors.toPandas()
    mat = np.array(pdf["embedding"].tolist())
    q = mat[0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    expected = sorted(
        zip(pdf["vec_id"], np.round(cos, 6)), key=lambda x: (-x[1], x[0])
    )[:10]
    got = [
        (r["vec_id"], r["cosine"])
        for r in brute_force_knn(vectors, list(q), k=10).collect()
    ]
    assert got == [(int(i), float(c)) for i, c in expected]


def test_ann_recall_on_tight_cluster(spark, vectors):
    pdf = vectors.toPandas()
    q = list(pdf["embedding"][0])
    bucketed = random_hyperplane_buckets(vectors, dim=DIM, n_planes=3)
    ann = ann_knn(bucketed, q, dim=DIM, k=10, n_planes=3)
    exact = brute_force_knn(vectors, q, k=10)
    ann_ids = {r["vec_id"] for r in ann.collect()}
    exact_ids = {r["vec_id"] for r in exact.collect()}
    # near-duplicates of the query share its bucket with high probability
    assert len(ann_ids & exact_ids) >= 7


def test_pairwise_cosine_dedup(spark, vectors):
    pairs = pairwise_cosine_dedup(
        vectors, threshold=0.98, n_planes=3, dim=DIM
    ).collect()
    assert pairs, "the planted near-dup cluster must produce pairs"
    for r in pairs:
        assert r["cosine"] >= 0.98
        assert r["id1"] < 30 and r["id2"] < 30  # only planted dups collide
