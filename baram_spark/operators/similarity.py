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


def _check_dim(embeddings: DataFrame, vec_col: str, dim: int) -> None:
    """One limit(1) probe guarding the silent-collapse failure mode: a
    wrong ``dim`` makes zip_with null-pad, every dot product null, every
    bucket 0 — and the bucketed algorithms quietly degrade to one
    quadratic bucket. Fail loudly instead."""
    row = embeddings.select(F.size(vec_col).alias("n")).first()
    if row is not None and row["n"] is not None and row["n"] != dim:
        raise ValueError(
            f"{vec_col} vectors have {row['n']} elements but dim={dim}"
        )


def _derive_n_planes(n: int, target_bucket_size: int, cap: int) -> int:
    """Bucket count growing with the corpus: E[bucket] ≈ target (shared
    by the near-dup and clustering operators so the derivations can't
    drift apart)."""
    import math

    return min(
        max(
            int(math.ceil(math.log2(max(n, 1) / target_bucket_size)))
            if n > target_bucket_size else 1,
            1,
        ),
        cap,
    )


def random_hyperplane_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """Add a sign-LSH ``bucket`` column: bit j = sign(v · plane_j)."""
    _check_dim(embeddings, vec_col, dim)
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
    n_probes: int = 1,
    seed: int | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket(s).

    ``seed``/``bucket_col`` MUST match what
    :func:`random_hyperplane_buckets` was called with — the query bucket
    is computed from the same hyperplanes, so a mismatched seed would
    probe unrelated buckets and silently collapse recall.

    ``n_probes > 1`` enables MULTIPROBE: besides the query's own bucket,
    probe the buckets reached by flipping the lowest-|margin| hyperplane
    bits first (the classic multiprobe-LSH order — a near-boundary sign is
    the most likely to differ for a true neighbor). Recall rises with
    bounded extra work: candidates ≈ n_probes · n/2^n_planes."""
    planes = _hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    margins = planes @ qv
    qbucket = int(sum((2 ** j) for j in range(n_planes) if margins[j] > 0))
    probes = [qbucket]
    if n_probes > 1:
        order = np.argsort(np.abs(margins))
        t = min(n_planes, 10)  # subsets of the 10 least-confident bits
        cand_bits = [int(b) for b in order[:t]]
        subsets = []
        for mask in range(1, 2 ** t):
            bits = [cand_bits[i] for i in range(t) if (mask >> i) & 1]
            subsets.append((sum(abs(margins[b]) for b in bits), bits))
        subsets.sort(key=lambda x: x[0])
        for _, bits in subsets[: n_probes - 1]:
            probes.append(qbucket ^ sum(2 ** b for b in bits))
    cand = bucketed.filter(F.col(bucket_col).isin(probes))
    return brute_force_knn(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def kmeans_spherical(mat: np.ndarray, n_cells: int,
                     iters: int = 10, seed: int = SEED) -> np.ndarray:
    """Spherical k-means(-lite) on L2-normalized rows — the IVF coarse
    quantizer shared by the distributed path (:func:`ivf_fit`) and the
    serving tier's node-resident cell index. Deterministic seed."""
    if mat.ndim != 2 or len(mat) == 0:
        raise ValueError(
            "kmeans_spherical: no vectors to fit (empty embeddings "
            "relation or empty sample)"
        )
    norms = np.linalg.norm(mat, axis=1)
    mat = mat[norms > 0] / norms[norms > 0, None]
    if len(mat) == 0:
        raise ValueError(
            "kmeans_spherical: every sampled vector is zero-norm — "
            "cosine cells are undefined for zero vectors"
        )
    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, len(mat))
    cent = mat[rng.choice(len(mat), n_cells, replace=False)].copy()
    for _ in range(iters):
        sims = mat @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                if nm > 0:
                    cent[c] = m / nm
    return cent


def ivf_fit(
    embeddings: DataFrame,
    dim: int,
    n_cells: int = 64,
    sample_rows: int = 20_000,
    iters: int = 10,
    vec_col: str = "embedding",
) -> np.ndarray:
    """IVF coarse quantizer: k-means(-lite) centroids from a driver-side
    sample (spherical k-means on L2-normalized vectors, deterministic seed).

    Scale shape: fitting touches only ``sample_rows`` vectors (one sampled
    collect); assignment and search are distributed. n_cells should be
    ~sqrt(n) at scale (the FAISS IVF rule of thumb)."""
    n_total = embeddings.count()
    frac = min(1.0, sample_rows / max(n_total, 1))
    sample = (
        embeddings.sample(fraction=frac, seed=SEED)
        .select(vec_col).toPandas()[vec_col].tolist()
    )
    return kmeans_spherical(
        np.asarray(sample, dtype=np.float64), n_cells, iters
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cell",
    n_assign: int = 1,
) -> DataFrame:
    """Add the nearest-centroid ``cell`` column (Arrow-batched matmul —
    one narrow pass, no shuffle; write partitioned by cell for pruning).

    ``n_assign > 1`` = MULTI-ASSIGNMENT: each vector is replicated into
    its ``n_assign`` nearest cells. On unstructured (near-random)
    embeddings a true neighbor's single cell often differs from every
    probed cell; replicas make the probe∩assignment intersection far more
    likely. Storage grows ×n_assign, query probe work is unchanged —
    measured on 2k random unit vectors / 16 cells / 4 probes: recall@10
    0.81 (n_assign=1) → 0.95 (2) → 0.99 (3). ``ivf_knn`` dedupes replica
    candidates before scoring."""
    import pandas as pd

    cent = centroids
    r = min(n_assign, len(cent))

    def run(iterator):
        for pdf in iterator:
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ cent.T
            if r == 1:
                out = pdf.copy()
                out[out_col] = np.argmax(sims, axis=1).astype("int32")
                yield out
            else:
                top = np.argsort(-sims, axis=1)[:, :r]
                out = pdf.loc[pdf.index.repeat(r)].reset_index(drop=True)
                out[out_col] = top.reshape(-1).astype("int32")
                yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in embeddings.schema
    ) + f", {out_col} int"
    return embeddings.mapInPandas(run, schema=schema)


def ivf_knn(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """IVF search: score only the ``n_probes`` cells whose centroids are
    nearest the query — candidate work ≈ n_probes/n_cells of the corpus,
    and a cell-partitioned table turns the filter into partition pruning."""
    qv = np.asarray(query_vec, dtype=np.float64)
    nq = np.linalg.norm(qv)
    if nq > 0:
        qv = qv / nq
    probe_cells = [int(c) for c in np.argsort(-(centroids @ qv))[:n_probes]]
    cand = assigned.filter(F.col(cell_col).isin(probe_cells))
    # multi-assignment replicas (ivf_assign n_assign>1) may land the same
    # vector in several probed cells — dedupe the (small) candidate set so
    # the exact re-rank never returns a doc twice
    cand = cand.dropDuplicates([id_col])
    return brute_force_knn(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def pairwise_cosine_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket_size: int = 2048,
) -> DataFrame:
    """Embedding near-dup pairs: LSH-bucket, compare only within buckets.

    Within-bucket comparison is quadratic, so the bucket count must grow
    with the corpus: ``n_planes=None`` derives it so E[bucket] ≈
    ``target_bucket_size`` (a fixed 2^6 would be n²/64 pair-work at
    10^12 docs — see the clustering module for the same treatment)."""
    if n_planes is None:
        n_planes = _derive_n_planes(embeddings.count(),
                                    target_bucket_size, cap=30)
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
