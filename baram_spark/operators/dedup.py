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
                        bands: int = 4) -> DataFrame:
    """Band the signature (rows_per_band = n_hashes/bands); docs sharing any
    band bucket become candidate pairs (e1 < e2, distinct)."""
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
        .distinct()
    )


def ngram_jaccard_pairs(shingle_df: DataFrame, threshold: float = 0.8,
                        candidates: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle
    (optionally restricted to LSH candidates). jaccard = |A∩B|/|A∪B|."""
    sizes = shingle_df.groupBy("doc_id").agg(F.count("*").alias("sz"))
    left = right = shingle_df
    if candidates is not None:
        # prune BEFORE the shingle self-join — Catalyst cannot push a
        # pair-level semi join through a two-sided join, so filtering
        # afterwards would leave the quadratic pair generation intact
        ids1 = candidates.select(F.col("id1").alias("doc_id")).distinct()
        ids2 = candidates.select(F.col("id2").alias("doc_id")).distinct()
        # plain semi joins: AQE broadcasts them when small enough
        left = shingle_df.join(ids1, "doc_id", "left_semi")
        right = shingle_df.join(ids2, "doc_id", "left_semi")
    a, b = left.alias("a"), right.alias("b")
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
    if candidates is not None:
        # the exact pair restriction still applies (doc-level pruning
        # above only bounds the join inputs)
        common = common.join(candidates, ["id1", "id2"], "left_semi")
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
        # threshold on the UNROUNDED ratio (the DuckDB oracle filters the
        # raw ratio too; rounding first would admit pairs a hair below
        # the cutoff), round only the returned column
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
