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


def _h_py(s: str, seed: int) -> int:
    """Driver-side twin of ``_h``: md5 of the same UTF-8 bytes, first 15
    hex chars as a 60-bit int — bit-identical to the Spark expression, so
    per-TERM hashes can be computed once on the driver instead of
    per-ROW on the executors."""
    import hashlib

    return int(
        hashlib.md5(f"{seed}|{s}".encode("utf-8")).hexdigest()[:15], 16
    )


def _probe_vocab(shingle_df: DataFrame, vocab_limit: int):
    """One cheap pass (map-side-combined distinct + CollectLimit): the
    full list of distinct shingles iff there are ≤ vocab_limit of them,
    else None. Gates the hash-per-term and dense-bitmask fast paths."""
    head = (
        shingle_df.select("shingle").filter(F.col("shingle").isNotNull())
        .distinct().limit(vocab_limit + 1).collect()
    )
    if len(head) > vocab_limit:
        return None
    return [r["shingle"] for r in head]


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
    is the Bloom tier analog).

    The ledger is projected to the key and pre-deduplicated: an anti join
    only tests membership, so duplicates buy nothing — the partial
    aggregate collapses them map-side BEFORE the exchange (sf1.0: 6M
    lineitem rows → 1.5M distinct keys shuffled instead of 6M), and the
    join reuses the distinct's hash partitioning, adding no exchange."""
    return candidates.join(
        ledger.select(key).distinct(), key, "left_anti")


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


def minhash_signatures(shingle_df: DataFrame, n_hashes: int = 8,
                       vocab_limit: int = 65_536) -> DataFrame:
    """Per-doc MinHash signature: min over shingles of seeded md5-int
    (one algebraic agg — no per-row Python).

    When the distinct-shingle vocabulary is small (≤ ``vocab_limit``,
    probed with a bounded CollectLimit pass), each term is hashed ONCE on
    the driver (``_h_py`` — bit-identical to the ``_h`` expression) and
    the n_hashes values ride a broadcast joined back to the token
    stream: n_hashes md5 evaluations per DISTINCT TERM instead of per
    ROW. At sf1.0 (2.7M token rows, 31-term vocab) that cut the
    signature build 9.6 s → 2.5 s. Vocabularies above the limit keep
    the per-row expression plan. Both plans: min is idempotent over
    duplicates, so the input needs no (doc_id, shingle) distinct."""
    vocab = _probe_vocab(shingle_df, vocab_limit)
    if vocab is None:
        aggs = [
            F.min(_h(F.col("shingle"), seed)).alias(f"mh{seed}")
            for seed in range(n_hashes)
        ]
        return shingle_df.groupBy("doc_id").agg(*aggs)
    spark = shingle_df.sparkSession
    feats = spark.createDataFrame(
        [(s, *[_h_py(s, seed) for seed in range(n_hashes)]) for s in vocab],
        ", ".join(["shingle string"]
                  + [f"h{seed} long" for seed in range(n_hashes)]),
    )
    return (
        shingle_df.join(F.broadcast(feats), "shingle", "left")
        .groupBy("doc_id")
        .agg(*[F.min(f"h{seed}").alias(f"mh{seed}")
               for seed in range(n_hashes)])
    )


def _band_sig_table(signatures: DataFrame, n_hashes: int,
                    bands: int) -> DataFrame:
    """(doc_id, sig_0..sig_{bands-1}): one row per doc with every band's
    concat signature precomputed (same '_'-joined encoding the oracle SQL
    uses, so sig equality ⟺ per-hash equality for non-null hashes)."""
    rows_per_band = n_hashes // bands
    cols = []
    for b in range(bands):
        mh = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        cols.append(
            F.concat_ws(
                "_", *[F.col(c).cast("string") for c in mh]
            ).alias(f"sig_{b}")
        )
    return signatures.select("doc_id", *cols)


def _banded_union(sig_table: DataFrame, bands: int,
                  extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Explode the per-doc sig table to one row per (doc, band), keeping
    every band's sig column for the first-matching-band filter (plus any
    ``extra_cols`` riding along, e.g. the fused verifier's mask words)."""
    sig_cols = [f"sig_{b}" for b in range(bands)]
    parts = [
        sig_table.select(
            "doc_id", F.lit(b).alias("band"),
            F.col(f"sig_{b}").alias("sig"), *sig_cols, *extra_cols,
        )
        for b in range(bands)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _pair_join_cond(bands: int):
    """Join condition for the banded self-join: same band bucket, id1 <
    id2, and — the dedup-free trick — NO earlier band already matched.
    A pair colliding in several bands is emitted exactly once, from its
    first colliding band, so the output is distinct BY CONSTRUCTION and
    the quadratic pair stream never needs a shuffle + dropDuplicates.
    (Band-k sig equality is exactly the old dedup's equality: the same
    concat-encoded strings.)"""
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    for j in range(bands - 1):
        earlier_eq = F.col(f"a.sig_{j}") == F.col(f"b.sig_{j}")
        cond = cond & ~((F.col("a.band") > j) & earlier_eq)
    return cond


def lsh_candidate_pairs(signatures: DataFrame, n_hashes: int = 8,
                        bands: int = 4,
                        parallelism: int | None = None,
                        local_rows_threshold: int = 1_000_000,
                        salt: int = 32) -> DataFrame:
    """Band the signature (rows_per_band = n_hashes/bands); docs sharing any
    band bucket become candidate pairs (e1 < e2, distinct).

    The output is a quadratic explosion of the (tiny) signature table:
    candidate-pair count ≈ Σ_bucket B², which at sf1.0 is ~7.5×10⁸ rows
    from 5×10⁴ docs. Round 5 partitioned the self-join by (band, sig) and
    dropDuplicates'd the pair stream — but bucket = join key, so the
    biggest bucket's B² explosion ran in ONE task (AQE skew-join cannot
    split a single key), and the distinct shuffled every pair (measured
    sf1.0: 286 s, one straggler task >200 s). Round 6 shape:

    * **distinct-free emission**: a pair colliding in several bands is
      emitted only by its FIRST colliding band (``_pair_join_cond``), so
      no exchange ever carries the pair stream. Output set identical.
    * **small signatures (≤ local_rows_threshold rows)** — the common
      case; signatures are ~40 B/doc: collect the signature table once
      (bounded by the threshold), re-parallelize it round-robin as the
      probe side and broadcast-hash-join it against itself. Every task
      probes the full bucket map, so per-task work is Σ B·(docs in its
      slice) — even by construction, no matter how skewed the buckets.
      The only jobs are the bounded collect + the streaming join
      (sf1.0: 286 s → ~8 s).
    * **large signatures**: salted co-partitioned self-join — the probe
      side keeps one deterministic salt g = xxhash64(doc_id) % salt, the
      build side replicates each row ``salt`` ways, both repartitioned on
      (band, sig, g) at ``parallelism``: a hot bucket's B² work is split
      across ``salt`` tasks instead of one, and the explicit keyed
      repartition defeats AQE's byte-based coalescing (signature rows are
      bytes; their join output is ~10⁴× bigger).
    """
    spark = signatures.sparkSession
    if parallelism is None:
        parallelism = 2 * spark.sparkContext.defaultParallelism
    if bands <= 0 or bands > n_hashes or n_hashes % bands != 0:
        # bands > n_hashes would band on the EMPTY signature (every doc
        # pairs with every doc — a silent O(n²) cross join); a
        # non-dividing bands silently drops trailing hashes
        raise ValueError(
            f"bands={bands} must evenly divide n_hashes={n_hashes}"
        )
    sig_table = _band_sig_table(signatures, n_hashes, bands)
    # bounded materialization probe: limit(T+1).collect() pulls at most
    # T+1 tiny rows to the driver — if everything fit, pair generation
    # runs the broadcast plan off the LOCAL copy (signature lineage
    # executes exactly once; no second run for the broadcast build)
    head = sig_table.limit(local_rows_threshold + 1).collect()
    # BYTES-aware second gate (the row cap alone could admit a ~1 GB
    # broadcast at 1M wide-sig rows): the banded broadcast replicates
    # each row `bands` times carrying bands+1 sig strings, so bound its
    # payload from the collected rows' actual string sizes
    if len(head) <= local_rows_threshold:
        sig_bytes = sum(
            len(r[f"sig_{b}"]) for r in head for b in range(bands))
        bcast_bytes = bands * (sig_bytes + len(head) * (bands + 1) * 24)
        if bcast_bytes > (256 << 20):
            head = None
    else:
        head = None
    if head is not None:
        local = spark.createDataFrame(head, sig_table.schema)
        banded = _banded_union(local, bands)
        a, b_ = banded.alias("a"), F.broadcast(banded).alias("b")
        return a.join(b_, _pair_join_cond(bands)).select(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
        )
    banded = _banded_union(sig_table, bands)
    a = banded.withColumn(
        "g", F.pmod(F.xxhash64("doc_id"), F.lit(salt))
    ).repartition(parallelism, "band", "sig", "g").alias("a")
    b_ = banded.withColumn(
        "g", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    ).repartition(parallelism, "band", "sig", "g").alias("b")
    return a.join(
        b_, _pair_join_cond(bands) & (F.col("a.g") == F.col("b.g"))
    ).select(
        F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
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


def _verify_from_bitmask(bc, threshold: float):
    """Vectorized Arrow kernel over bare (id1, id2) pairs; the doc axis
    rides a Spark broadcast as (sorted ids, bitmask matrix, set sizes).

    When the global shingle-hash universe is small (the gate in
    ``ngram_jaccard_pairs`` bounds the matrix bytes), each doc's set is a
    fixed-width row of uint64 words and |A∩B| is a popcount of the AND —
    the whole batch is a handful of numpy ops instead of a Python loop
    over pairs (measured sf1.0: ~60 ns/pair vs ~2 µs/pair for the
    frozenset loop). Jaccard math is identical: int64 counts, float64
    division, same >= threshold comparison on the unrounded ratio."""

    def verify(batches):
        import numpy as np
        import pyarrow as pa

        ids, masks, sizes = bc.value
        # uint8 popcount LUT (numpy<2 has no bitwise_count)
        lut = np.array([bin(i).count("1") for i in range(256)],
                       dtype=np.uint8)
        n_words = masks.shape[1] if masks.ndim == 2 else 0
        for b in batches:
            n = b.num_rows
            if n == 0 or ids.size == 0:
                continue
            id1 = b.column("id1").to_numpy(zero_copy_only=False)
            id2 = b.column("id2").to_numpy(zero_copy_only=False)
            i1 = np.searchsorted(ids, id1).clip(0, ids.size - 1)
            i2 = np.searchsorted(ids, id2).clip(0, ids.size - 1)
            # docs without shingles: inner-join semantics (drop the pair)
            ok = (ids[i1] == id1) & (ids[i2] == id2)
            if not ok.all():
                i1, i2, id1, id2 = i1[ok], i2[ok], id1[ok], id2[ok]
            if i1.size == 0:
                continue
            inter = masks[i1] & masks[i2]
            nc = lut[inter.view(np.uint8)].reshape(i1.size, n_words * 8) \
                .sum(axis=1).astype(np.int64)
            union = sizes[i1] + sizes[i2] - nc
            j = nc / np.maximum(union, 1)
            keep = (nc > 0) & (j >= threshold)
            yield pa.RecordBatch.from_arrays(
                [pa.array(id1[keep]), pa.array(id2[keep]),
                 pa.array(nc[keep]), pa.array(j[keep])],
                names=["id1", "id2", "n_common", "jaccard"])

    return verify


def _bitmask_structures(rows):
    """Driver-side build of the vectorized broadcast payload from
    collected (doc_id, shset) rows: sorted id array, per-doc uint64
    bitmask rows over the value universe, per-doc set sizes. Returns
    None when the universe is too wide for a dense mask (the caller
    falls back to the frozenset-dict kernel)."""
    import numpy as np

    ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    sets = [rows[i]["shset"] for i in order]
    universe: set = set()
    for s in sets:
        universe.update(s)
    n_words = (len(universe) + 63) // 64 if universe else 0
    # dense-mask budget: 64 MB of matrix — beyond that the frozenset
    # dict is the better broadcast
    if n_words == 0 or ids.size * n_words * 8 > (64 << 20):
        return None
    bit_of = {v: i for i, v in enumerate(sorted(universe))}
    masks = np.zeros((ids.size, n_words), dtype=np.uint64)
    sizes = np.empty(ids.size, dtype=np.int64)
    for row_i, s in enumerate(sets):
        m = masks[row_i]
        for v in s:
            bit = bit_of[v]
            m[bit >> 6] |= np.uint64(1 << (bit & 63))
        sizes[row_i] = len(s)
    return ids, masks, sizes


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
                        parallelism: int | None = None,
                        candidates_distinct: bool = False) -> DataFrame:
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
        if candidates_distinct:
            # caller guarantees distinct id1 < id2 rows on sanely-sized
            # partitions (lsh_candidate_pairs' first-matching-band output
            # qualifies): verify the stream AS IS — at sf1.0 the pair
            # stream is ~7.5×10⁸ rows, and skipping the normalization
            # exchange+dedup is the difference between one pass and a
            # 12 GB shuffle that exists only to re-prove a known invariant
            pairs = candidates
        else:
            # normalize to the ungated verifier's output contract:
            # distinct id1 < id2 (drops self-pairs, folds reversed pairs,
            # dedups) — dropDuplicates runs map-side over the repartition
            # it follows
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
            rows = doc_sets.collect()
            # vectorized layout when the value universe is dense enough
            # for per-doc bitmasks (the 64 MB matrix budget inside
            # _bitmask_structures); otherwise the frozenset dict
            packed = _bitmask_structures(rows)
            if packed is not None:
                bc = spark.sparkContext.broadcast(packed)
                out = pairs.mapInArrow(
                    _verify_from_bitmask(bc, threshold), _JACCARD_SCHEMA)
            else:
                sets = {r["doc_id"]: frozenset(r["shset"]) for r in rows}
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


def lsh_gated_jaccard(shingle_df: DataFrame, *, n_hashes: int = 8,
                      bands: int = 4, threshold: float = 0.8,
                      vocab_limit: int = 256,
                      local_rows_threshold: int = 1_000_000,
                      **jaccard_kwargs) -> DataFrame:
    """Fused LSH-gated exact-Jaccard dedup. Result-identical to

        sig  = minhash_signatures(shingle_df, n_hashes)
        cand = lsh_candidate_pairs(sig, n_hashes, bands)
        ngram_jaccard_pairs(shingle_df, threshold, candidates=cand,
                            candidates_distinct=True)

    and falls back to exactly that composition when its gates fail.

    Fast-path insight (guide §8: decide with small rows, and here —
    never move the big rows at all): the candidate-pair stream is the
    quadratic object (~7.7×10⁸ rows at sf1.0) but every per-pair value
    the verifier needs is a pure function of two PER-DOC features: the
    minhash signature, the shingle SET (as a bitmask over the global
    value universe) and its size. When

    * the distinct-shingle vocabulary fits ``vocab_limit`` (≤ 256 →
      at most 4 uint64 mask words per doc), and
    * the doc-feature table fits ``local_rows_threshold`` rows,

    one tokenize pass builds the doc-feature table (per-term hashes are
    driver-computed and broadcast-joined, ``_h_py``), one bounded
    collect localizes it, and the banded self-join streams pairs through
    pure JVM codegen: ``n_common = bit_count(mask_a & mask_b)``,
    ``jaccard = n_common / (sz_a + sz_b - n_common)``, first-matching-
    band dedup, threshold filter — no exchange, no Python boundary, no
    second pass. The 7.7×10⁸-pair verification at sf1.0: 659 s (r5) →
    65 s (Arrow bitmask kernel) → ~25 s fused.

    Set semantics are enforced by the aggregates themselves (min /
    bit_or / count_distinct are idempotent over duplicate (doc, shingle)
    rows), so the input needs no pre-distinct."""
    if bands <= 0 or bands > n_hashes or n_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must evenly divide n_hashes={n_hashes}"
        )
    spark = shingle_df.sparkSession
    vocab_limit = min(vocab_limit, 256)
    vocab = _probe_vocab(shingle_df, vocab_limit)
    if vocab is None:
        return _compose_lsh_jaccard(
            shingle_df, n_hashes, bands, threshold, **jaccard_kwargs)
    universe = sorted(_h_py(s, 0) for s in vocab)
    bit_of = {h: i for i, h in enumerate(universe)}
    n_words = max(1, (len(universe) + 63) // 64)

    def _sgn64(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    feat_rows = []
    for s in vocab:
        bit = bit_of[_h_py(s, 0)]
        masks = [0] * n_words
        masks[bit >> 6] = _sgn64(1 << (bit & 63))
        feat_rows.append(
            (s, *[_h_py(s, seed) for seed in range(n_hashes)], *masks))
    feats = spark.createDataFrame(
        feat_rows,
        ", ".join(["shingle string"]
                  + [f"h{seed} long" for seed in range(n_hashes)]
                  + [f"mb{w} long" for w in range(n_words)]),
    )
    # no count_distinct: the set size IS the popcount of the mask words
    # (each distinct shingle-hash owns one bit), computed on the driver
    # after the collect — count_distinct would force a two-phase
    # expand-aggregate over the token stream for a value the mask
    # already encodes
    docf = (
        shingle_df.join(F.broadcast(feats), "shingle", "left")
        .groupBy("doc_id")
        .agg(*[F.min(f"h{seed}").alias(f"mh{seed}")
               for seed in range(n_hashes)],
             *[F.bit_or(f"mb{w}").alias(f"m{w}") for w in range(n_words)])
    )
    head = docf.limit(local_rows_threshold + 1).collect()
    if len(head) > local_rows_threshold:
        return _compose_lsh_jaccard(
            shingle_df, n_hashes, bands, threshold, **jaccard_kwargs)
    # local banded table built fully on the driver: LocalTableScan slices
    # keep the probe side wide (no AQE byte-coalescing of a tiny exchange
    # that carries ~10⁴× its bytes in downstream pair work)
    rpb = n_hashes // bands
    local_rows = []
    for r in head:
        # concat_ws semantics: null elements are SKIPPED, not emptied —
        # must match _band_sig_table's encoding exactly
        sigs = [
            "_".join(str(v) for v in
                     (r[f"mh{b * rpb + i}"] for i in range(rpb))
                     if v is not None)
            for b in range(bands)
        ]
        mwords = [r[f"m{w}"] for w in range(n_words)]
        sz = sum((m % (1 << 64)).bit_count()
                 for m in mwords if m is not None)
        local_rows.append((r["doc_id"], *sigs, *mwords, sz))
    schema = ", ".join(
        ["doc_id long"] + [f"sig_{b} string" for b in range(bands)]
        + [f"m{w} long" for w in range(n_words)] + ["sz long"])
    local = spark.createDataFrame(local_rows, schema)
    banded = _banded_union(
        local, bands,
        extra_cols=tuple(f"m{w}" for w in range(n_words)) + ("sz",))
    a, b_ = banded.alias("a"), F.broadcast(banded).alias("b")
    nc = sum(
        (F.bit_count(F.col(f"a.m{w}").bitwiseAND(F.col(f"b.m{w}")))
         for w in range(1, n_words)),
        F.bit_count(F.col("a.m0").bitwiseAND(F.col("b.m0"))),
    ).cast("long")
    jac = nc / (F.col("a.sz") + F.col("b.sz") - nc)
    return (
        a.join(b_, _pair_join_cond(bands))
        .select(F.col("a.doc_id").alias("id1"),
                F.col("b.doc_id").alias("id2"),
                nc.alias("n_common"), jac.alias("_j_raw"))
        .filter((F.col("n_common") > 0) & (F.col("_j_raw") >= threshold))
        .select("id1", "id2", "n_common",
                F.round("_j_raw", 6).alias("jaccard"))
    )


def _compose_lsh_jaccard(shingle_df: DataFrame, n_hashes: int, bands: int,
                         threshold: float, **jaccard_kwargs) -> DataFrame:
    """The unfused reference composition (also the fallback when the
    fused gates fail): banded candidates → gated Arrow verification."""
    sig = minhash_signatures(shingle_df, n_hashes=n_hashes)
    cand = lsh_candidate_pairs(sig, n_hashes=n_hashes, bands=bands)
    return ngram_jaccard_pairs(
        shingle_df, threshold=threshold, candidates=cand,
        candidates_distinct=True, **jaccard_kwargs)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32, vocab_limit: int = 65_536) -> DataFrame:
    """Per-doc SimHash over whitespace tokens (no tf weighting).

    For each bit position j, the bit is 1 iff Σ_tokens sign(bit_j(h(token)))
    > 0. Expressed with explode + bitwise agg — JVM-side only.

    Small vocabularies (probed with a bounded CollectLimit pass) hash each
    distinct token ONCE on the driver and broadcast-join the value back to
    the token stream — the join preserves the multiset of token rows, so
    the per-bit vote sums are identical to the per-row md5 plan.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = _probe_vocab(toks.select(F.col("tok").alias("shingle")),
                         vocab_limit)
    if vocab is None:
        hashed = toks.select("doc_id", _h(F.col("tok"), 0).alias("h"))
    else:
        spark = docs.sparkSession
        feats = spark.createDataFrame(
            [(s, _h_py(s, 0)) for s in vocab], "tok string, h long")
        hashed = toks.join(F.broadcast(feats), "tok", "left").select(
            "doc_id", "h")
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
