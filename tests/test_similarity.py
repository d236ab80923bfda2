"""ANN / similarity-search operators."""

import numpy as np
import pytest

from baram_spark.operators.similarity import (
    ann_knn,
    brute_force_knn,
    ivf_assign,
    ivf_fit,
    ivf_knn,
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


def test_multiprobe_recall_dominates_single_probe(spark, vectors):
    """Multiprobe must never see FEWER candidates than single-probe, and
    on this fixture reaches full top-10 recall."""
    pdf = vectors.toPandas()
    q = list(pdf["embedding"][1])
    bucketed = random_hyperplane_buckets(vectors, dim=DIM, n_planes=4)
    exact_ids = {
        r["vec_id"] for r in brute_force_knn(vectors, q, k=10).collect()
    }
    one = {
        r["vec_id"]
        for r in ann_knn(bucketed, q, dim=DIM, k=10, n_planes=4).collect()
    }
    multi = {
        r["vec_id"]
        for r in ann_knn(
            bucketed, q, dim=DIM, k=10, n_planes=4, n_probes=4
        ).collect()
    }
    assert len(multi & exact_ids) >= len(one & exact_ids)
    assert len(multi & exact_ids) >= 9


def test_ivf_end_to_end_recall(spark, vectors):
    cent = ivf_fit(vectors, dim=DIM, n_cells=8, sample_rows=1000, iters=5)
    assert cent.shape == (8, DIM)
    assigned = ivf_assign(vectors, cent)
    # every vector gets exactly one cell, all cells in range
    rows = assigned.select("vec_id", "cell").collect()
    assert len(rows) == 90 and all(0 <= r["cell"] < 8 for r in rows)
    pdf = vectors.toPandas()
    q = list(pdf["embedding"][0])
    exact_ids = {
        r["vec_id"] for r in brute_force_knn(vectors, q, k=10).collect()
    }
    got = ivf_knn(assigned, cent, q, k=10, n_probes=3).collect()
    ids = {r["vec_id"] for r in got}
    # the tight planted cluster lives in one cell: probing 3/8 cells must
    # recover nearly all true neighbors
    assert len(ids & exact_ids) >= 8
    # determinism
    again = {r["vec_id"] for r in ivf_knn(assigned, cent, q, k=10,
                                          n_probes=3).collect()}
    assert again == ids


def test_pairwise_dedup_adaptive_planes_small_corpus(spark, vectors):
    # n_planes=None on 90 vectors derives the minimum and still finds only
    # the planted near-dup pairs
    pairs = pairwise_cosine_dedup(
        vectors, threshold=0.98, n_planes=None, dim=DIM
    ).collect()
    assert pairs
    for r in pairs:
        assert r["id1"] < 30 and r["id2"] < 30


def test_pairwise_cosine_dedup(spark, vectors):
    pairs = pairwise_cosine_dedup(
        vectors, threshold=0.98, n_planes=3, dim=DIM
    ).collect()
    assert pairs, "the planted near-dup cluster must produce pairs"
    for r in pairs:
        assert r["cosine"] >= 0.98
        assert r["id1"] < 30 and r["id2"] < 30  # only planted dups collide


def test_ivf_multi_assign_recall_on_random_vectors(spark):
    """The hard ANN case: UNSTRUCTURED random unit vectors (no planted
    clusters). Single-assignment IVF at 4/16 probes was measured ~0.7-0.8
    recall@10 here; multi-assignment (each vector replicated into its 2
    nearest cells) must reach >=8/10 for every probe query while scanning
    only the probed cells."""
    import numpy as np

    rng = np.random.default_rng(7)
    n, dim = 1500, 16
    mat = rng.normal(size=(n, dim))
    mat /= np.linalg.norm(mat, axis=1)[:, None]
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8)

    cent = ivf_fit(vecs, dim=dim, n_cells=16, sample_rows=2000, iters=8)
    assigned = ivf_assign(vecs, cent, n_assign=2).cache()
    # replicas: ~2 rows per vector, every vector covered
    n_rows = assigned.count()
    assert n <= n_rows <= 2 * n
    assert assigned.select("vec_id").distinct().count() == n

    recalls = []
    for qi in (0, 11, 222, 333):
        q = [float(x) for x in mat[qi]]
        exact = {r["vec_id"] for r in brute_force_knn(vecs, q, k=10).collect()}
        got_rows = ivf_knn(assigned, cent, q, k=10, n_probes=4).collect()
        got = [r["vec_id"] for r in got_rows]
        assert len(got) == len(set(got)) == 10  # replicas never duplicate
        recalls.append(len(set(got) & exact))
    assert min(recalls) >= 8, recalls
    assigned.unpersist()


def test_dim_mismatch_raises(spark):
    """A wrong dim must raise, not silently null-pad every dot product
    into bucket 0 (which degrades bucketed dedup to one quadratic
    bucket)."""
    from baram_spark.operators.similarity import random_hyperplane_buckets

    emb = spark.createDataFrame(
        [(1, [0.1] * 16)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="16 elements but dim=64"):
        random_hyperplane_buckets(emb, dim=64)


def test_ann_knn_custom_seed_and_bucket_col(spark):
    """ann_knn must probe with the SAME hyperplanes the bucketing used —
    seed/bucket_col pass through."""
    import numpy as np

    from baram_spark.operators.similarity import (
        ann_knn,
        random_hyperplane_buckets,
    )

    rng = np.random.default_rng(3)
    target = rng.standard_normal(16)
    rows = [(0, [float(x) for x in target])]
    rows += [(i, [float(x) for x in rng.standard_normal(16)])
             for i in range(1, 60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = random_hyperplane_buckets(emb, 16, n_planes=4, seed=777,
                                  out_col="bkt")
    got = ann_knn(b, [float(x) for x in target], 16, k=1, n_planes=4,
                  seed=777, bucket_col="bkt").collect()
    assert got and got[0]["vec_id"] == 0  # the query vector itself
