"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's 3-tier URL/content dedup (``/root/reference/src/storage/
dedup.rs:828-970``) plus the near-duplicate family a large-scale training-data
pipeline needs. All hash math uses ``conv(substring(md5(x),1,15),16,10)`` —
a 60-bit integer both Spark and DuckDB compute identically, so every
operator here is oracle-checkable.

Scale notes:
- exact dedup = hash groupBy (map-side combine; one shuffle on the hash).
- MinHash: per-doc signatures are computed in one pass over exploded
  shingles (groupBy doc, min over seeded hashes — algebraic agg). LSH
  banding turns all-pairs O(n²) into groupBy(band_signature) candidate
  buckets — the only pairs compared share a band, which is what makes this
  viable at 10^12 docs.
- n-gram Jaccard is the exact (quadratic) verifier — use after LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 60-bit md5-prefix hash, identical in DuckDB:
#   CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT)
def _h(col, seed: int):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(seed) + "|"), col)), 1, 15), 16, 10
    ).cast("long")


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup by md5(text): canonical doc = min(id) per hash
    (the exists_by_hash analog, dedup.rs:828-853)."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_dups"),
        )
    )


def anti_join_new(candidates: DataFrame, ledger: DataFrame,
                  key: str = "url") -> DataFrame:
    """3-tier dedup's net effect: keep candidates not in the ledger
    (dedup.rs:856-970 ≡ left-anti hash join; Spark's runtime bloom filter
    is the Bloom tier analog)."""
    return candidates.join(ledger, key, "left_anti")


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Word n-gram shingles per doc → (doc_id, shingle) distinct."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        # drop empty tokens BEFORE shingling (simhash already does):
        # otherwise a doubled space yields shingles like 'a  b' that
        # share nothing with the single-space doc's, and two documents
        # identical up to whitespace get Jaccard 0
        F.filter(
            F.split(F.col(text_col), " "), lambda x: x != ""
        ).alias("toks"),
    )
    # join consecutive n tokens: transform over index range. Docs shorter
    # than n tokens yield an empty shingle set (sequence() would otherwise
    # step backwards when start > stop and slice() would throw).
    sh = toks.select(
        "doc_id",
        F.expr(
            f"case when size(toks) >= {n} then "
            f"transform(sequence(1, size(toks)-{n}+1), "
            f"i -> concat_ws(' ', slice(toks, i, {n}))) "
            f"else array() end"
        ).alias("shingles"),
    )
    return (
        sh.select("doc_id", F.explode("shingles").alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def minhash_signatures(shingle_df: DataFrame, n_hashes: int = 8) -> DataFrame:
    """Per-doc MinHash signature: min over shingles of seeded md5-int
    (one algebraic agg — no per-row Python)."""
    aggs = [
        F.min(_h(F.col("shingle"), seed)).alias(f"mh{seed}")
        for seed in range(n_hashes)
    ]
    return shingle_df.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, n_hashes: int = 8,
                        bands: int = 4,
                        parallelism: int | None = None) -> DataFrame:
    """Band the signature (rows_per_band = n_hashes/bands); docs sharing any
    band bucket become candidate pairs (e1 < e2, distinct).

    The banded table and the pair-dedup are explicitly hash-partitioned at
    ``parallelism`` (default 2× defaultParallelism): signature rows are a
    few bytes each but each bucket EXPLODES into its pair product in the
    self-join, so AQE's byte-based coalescing would funnel the whole
    explosion through one task (measured at sf0.1: 1 post-AQE partition,
    11.8 s single-threaded vs ~2 s partitioned). Co-partitioning both
    self-join sides on (band, sig) also means the join adds no exchange of
    its own, and dropDuplicates reuses the (id1, id2) repartition."""
    if parallelism is None:
        parallelism = 2 * signatures.sparkSession.sparkContext.defaultParallelism
    if bands <= 0 or bands > n_hashes or n_hashes % bands != 0:
        # bands > n_hashes would band on the EMPTY signature (every doc
        # pairs with every doc — a silent O(n²) cross join); a
        # non-dividing bands silently drops trailing hashes
        raise ValueError(
            f"bands={bands} must evenly divide n_hashes={n_hashes}"
        )
    rows_per_band = n_hashes // bands
    banded = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        banded.append(
            signatures.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("_", *[F.col(c).cast("string") for c in cols]).alias("sig"),
            )
        )
    all_bands = banded[0]
    for df in banded[1:]:
        all_bands = all_bands.unionByName(df)
    all_bands = all_bands.repartition(parallelism, "band", "sig")
    a, b_ = all_bands.alias("a"), all_bands.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
        )
        .repartition(parallelism, "id1", "id2")
        .dropDuplicates()
    )


_JACCARD_SCHEMA = "id1 long, id2 long, n_common long, jaccard double"


def _verify_from_broadcast(sets_bc, threshold: float):
    """Arrow kernel over bare (id1, id2) pairs; doc→frozenset dict rides
    a Spark broadcast (small-corpus layout)."""

    def verify(batches):
        import pyarrow as pa

        sets = sets_bc.value
        for b in batches:
            if b.num_rows == 0:
                continue
            id1 = b.column("id1").to_numpy(zero_copy_only=False).tolist()
            id2 = b.column("id2").to_numpy(zero_copy_only=False).tolist()
            o1, o2, onc, oj = [], [], [], []
            for d1, d2 in zip(id1, id2):
                a = sets.get(d1)
                bset = sets.get(d2)
                if a is None or bset is None:
                    continue  # doc without shingles: inner-join semantics
                nc = len(a & bset)
                if not nc:
                    continue
                j = nc / (len(a) + len(bset) - nc)
                if j >= threshold:
                    o1.append(d1); o2.append(d2); onc.append(nc); oj.append(j)
            yield pa.RecordBatch.from_arrays(
                [pa.array(o1, pa.int64()), pa.array(o2, pa.int64()),
                 pa.array(onc, pa.int64()), pa.array(oj, pa.float64())],
                names=["id1", "id2", "n_common", "jaccard"])

    return verify


def _verify_from_arrays(threshold: float):
    """Arrow kernel over pairs carrying their two packed shingle-set
    arrays (scale layout); sets memoized per worker, built zero-copy from
    the list buffers."""

    def verify(batches):
        import numpy as np
        import pyarrow as pa

        memo = {}
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            id1 = b.column("id1").to_numpy(zero_copy_only=False).tolist()
            id2 = b.column("id2").to_numpy(zero_copy_only=False).tolist()
            c1, c2 = b.column("sh1"), b.column("sh2")
            f1 = c1.flatten().to_numpy(zero_copy_only=False)
            f2 = c2.flatten().to_numpy(zero_copy_only=False)
            o1 = np.zeros(n + 1, dtype=np.int64)
            o1[1:] = np.cumsum(c1.value_lengths())
            o2 = np.zeros(n + 1, dtype=np.int64)
            o2[1:] = np.cumsum(c2.value_lengths())
            out1, out2, onc, oj = [], [], [], []
            for i in range(n):
                d1 = id1[i]
                a = memo.get(d1)
                if a is None:
                    a = memo[d1] = frozenset(f1[o1[i]:o1[i + 1]].tolist())
                d2 = id2[i]
                bset = memo.get(d2)
                if bset is None:
                    bset = memo[d2] = frozenset(f2[o2[i]:o2[i + 1]].tolist())
                nc = len(a & bset)
                if not nc:
                    continue
                j = nc / (len(a) + len(bset) - nc)
                if j >= threshold:
                    out1.append(d1); out2.append(d2)
                    onc.append(nc); oj.append(j)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out1, pa.int64()), pa.array(out2, pa.int64()),
                 pa.array(onc, pa.int64()), pa.array(oj, pa.float64())],
                names=["id1", "id2", "n_common", "jaccard"])

    return verify


def ngram_jaccard_pairs(shingle_df: DataFrame, threshold: float = 0.8,
                        candidates: DataFrame | None = None, *,
                        broadcast_docs_threshold: int = 200_000,
                        broadcast_values_threshold: int = 8_000_000,
                        parallelism: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle
    (optionally restricted to LSH candidates). jaccard = |A∩B|/|A∪B|.

    ``shingle_df`` must be DISTINCT (doc_id, shingle) rows — set
    semantics, as every caller and the oracle SQL already enforce.

    The GATED path (``candidates`` given) verifies each candidate pair
    against the docs' shingle sets in an Arrow-batched Python kernel and
    never touches the shingle-bucket self-join. That shape was chosen by
    measurement at sf0.1 (7.5M candidate pairs, 5k docs, 23 shingles/doc
    avg): doc-level semi-join pruning of the self-join 68 s (a hot
    shingle shared by most candidate docs still yields |docs|² bucket
    rows); per-pair ``size(array_intersect(...))`` 95 s (Catalyst pushes
    the threshold filter into the join condition where the interpreted
    intersect re-evaluates ~3× per row at ~170 µs each); exploded
    pair×shingle equi-join 47 s (155M-row intermediate). The Arrow
    kernel with per-worker memoized frozensets runs the same verification
    in ~3 s of worker time — intersection of two small int sets is a
    C-level operation, and each doc's set is built once per worker, not
    once per pair.

    Shingles are reduced to 60-bit md5-prefix ints (the module's standard
    ``_h`` hash) before set building: a within-pair collision — the only
    event that could perturb a count — has probability ~k²/2⁶⁰ per pair
    and is deterministic (both the engine and any mirror oracle would
    hash identically). Two physical layouts, picked by doc count like a
    join strategy:

    * ≤ ``broadcast_docs_threshold`` distinct docs AND ≤
      ``broadcast_values_threshold`` total shingle values (the gate is
      bytes-aware — 150k docs × 2000 shingles each would be tens of GB
      as Python sets, so doc count alone cannot gate the broadcast) →
      the doc→set dict is a Spark broadcast and only (id1, id2) pairs
      flow through the kernel. The broadcast lives until the session
      drops it (a per-call destroy would race the caller's lazy
      materialization); at the gated sizes that is ≤ ~1 GB.
    * above either bound → each pair carries its two packed set arrays
      through two doc_id-keyed joins (no driver/broadcast
      materialization of the doc axis — the 100-TB layout; same bytes
      the exploded join would shuffle, 1-2 orders fewer rows).

    Candidates are NORMALIZED before verification — self-pairs dropped,
    (a, b)/(b, a) folded to a < b, duplicates removed — so hand-built
    candidate lists get the same output contract as the ungated
    verifier's ``a.doc_id < b.doc_id`` self-join (distinct id1 < id2
    rows). Cost accounting: the keyed ``repartition`` here REPLACES the
    round-robin repartition the kernel needed anyway (the AQE
    anti-coalescing below), so normalization adds only the least/
    greatest projection and a map-side-combined dedup aggregate over
    that same exchange — it does not reuse any upstream partitioning.

    ``parallelism`` (default 2× defaultParallelism) repartitions the
    candidate stream before the kernel: AQE coalesces exchanges by BYTE
    size, and candidate pairs are 16 bytes each carrying ~10⁴ bytes of
    downstream verify work, so byte-based coalescing would strangle the
    stage (measured: 3 post-AQE partitions at sf0.1)."""
    if candidates is not None:
        spark = shingle_df.sparkSession
        hashed = shingle_df.select(
            "doc_id", _h(F.col("shingle"), 0).alias("h"))
        doc_sets = hashed.groupBy("doc_id").agg(
            F.collect_set("h").alias("shset"))
        if parallelism is None:
            parallelism = 2 * spark.sparkContext.defaultParallelism
        # normalize to the ungated verifier's output contract: distinct
        # id1 < id2 (drops self-pairs, folds reversed pairs, dedups) —
        # dropDuplicates runs map-side over the repartition it follows
        pairs = (
            candidates.select(
                F.least("id1", "id2").alias("id1"),
                F.greatest("id1", "id2").alias("id2"))
            .filter(F.col("id1") < F.col("id2"))
            .repartition(parallelism, "id1", "id2")
            .dropDuplicates(["id1", "id2"])
        )
        # one agg decides the layout: doc count AND total set values
        # (the broadcast must be bounded in BYTES, not just doc count).
        # Deliberately NOT persisted: the broadcast path re-runs the
        # lineage for the collect, but a measured A/B at sf0.1 put the
        # persist variant ~12% SLOWER (cache write + storage pressure
        # cost more than the saved tokenize scan) — and a cache pinned
        # past return would leak across calls. A caller whose shingle
        # lineage is genuinely expensive should persist it BEFORE calling
        # (it owns the release point); a caller-persisted relation is
        # used as-is.
        stat = shingle_df.agg(
            F.countDistinct("doc_id").alias("nd"),
            F.count(F.lit(1)).alias("nv")).first()
        n_docs, n_vals = int(stat["nd"]), int(stat["nv"])
        if (n_docs <= broadcast_docs_threshold
                and n_vals <= broadcast_values_threshold):
            sets = {r["doc_id"]: frozenset(r["shset"])
                    for r in doc_sets.collect()}
            bc = spark.sparkContext.broadcast(sets)
            out = pairs.mapInArrow(
                _verify_from_broadcast(bc, threshold), _JACCARD_SCHEMA)
        else:
            joined = (
                pairs
                .join(doc_sets.select(F.col("doc_id").alias("id1"),
                                      F.col("shset").alias("sh1")), "id1")
                .join(doc_sets.select(F.col("doc_id").alias("id2"),
                                      F.col("shset").alias("sh2")), "id2")
            )
            out = joined.mapInArrow(
                _verify_from_arrays(threshold), _JACCARD_SCHEMA)
        # kernel filters on the UNROUNDED ratio and returns it raw;
        # rounding stays in Spark so the result matches F.round (HALF_UP,
        # what the DuckDB oracle's ROUND does) rather than Python's
        # banker's rounding
        return out.withColumn("jaccard", F.round("jaccard", 6))
    # exact all-pairs verifier — O(docs-per-shingle²); small-n only
    sizes = shingle_df.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = shingle_df.alias("a"), shingle_df.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
        )
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("sz").alias("sz2"))
    return (
        common.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "_j_raw",
            F.col("n_common")
            / (F.col("sz1") + F.col("sz2") - F.col("n_common")),
        )
        .filter(F.col("_j_raw") >= threshold)
        .withColumn("jaccard", F.round(F.col("_j_raw"), 6))
        .select("id1", "id2", "n_common", "jaccard")
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """Per-doc SimHash over whitespace tokens (no tf weighting).

    For each bit position j, the bit is 1 iff Σ_tokens sign(bit_j(h(token)))
    > 0. Expressed with explode + bitwise agg — JVM-side only.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    hashed = toks.select("doc_id", _h(F.col("tok"), 0).alias("h"))
    # per-bit contribution sums
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    sums = hashed.groupBy("doc_id").agg(*bit_aggs)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        sig = term if sig is None else (sig + term)
    return sums.select("doc_id", sig.cast("long").alias("simhash"))
