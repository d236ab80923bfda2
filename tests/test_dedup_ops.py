"""Unit tests for dedup operators + id handling edge cases (ADVICE round 1)."""

from baram_spark.operators import dedup
from baram_spark.textproc.extract import doc_id_from_ids, extract_ids


def test_shingles_short_docs_no_crash(spark):
    # docs shorter than n must yield zero shingles, not crash the job
    # (sequence() steps backwards when size(toks)-n < 0 and slice() throws)
    docs = spark.createDataFrame(
        [
            (1, "one"),
            (2, "two tokens"),
            (3, "exactly three tokens"),
            (4, "this one has five tokens"),
        ],
        "doc_id long, text string",
    )
    sh = dedup.shingles(docs, n=3).collect()
    by_doc = {}
    for r in sh:
        by_doc.setdefault(r["doc_id"], set()).add(r["shingle"])
    assert 1 not in by_doc and 2 not in by_doc
    assert by_doc[3] == {"exactly three tokens"}
    assert by_doc[4] == {
        "this one has",
        "one has five",
        "has five tokens",
    }


def test_minhash_lsh_jaccard_pipeline(spark):
    # near-identical docs must surface as LSH candidates + high jaccard
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated text about spark clusters"),
        ],
        "doc_id long, text string",
    )
    sh = dedup.shingles(docs, n=2)
    sig = dedup.minhash_signatures(sh, n_hashes=8)
    pairs = dedup.lsh_candidate_pairs(sig, n_hashes=8, bands=4)
    cand = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert (1, 2) in cand
    jac = dedup.ngram_jaccard_pairs(sh, threshold=0.5, candidates=pairs)
    rows = {(r["id1"], r["id2"]): r["jaccard"] for r in jac.collect()}
    assert (1, 2) in rows and rows[(1, 2)] >= 0.5
    assert all(3 not in p for p in rows)


def test_ngram_jaccard_ungated_exact_small_n(spark):
    """The UNGATED all-pairs verifier (candidates=None) is an explicitly
    small-n test path only — the exposed driver query gates through LSH
    candidates. Brute-force Python Jaccard is the oracle here."""
    import itertools

    texts = {1: "a b c d e", 2: "a b c d x", 3: "p q r s t", 4: "a b c d e"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    sh = dedup.shingles(docs, n=2)
    got = {
        (r["id1"], r["id2"]): (r["n_common"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(sh, threshold=0.0).collect()
    }

    def shset(t):
        toks = t.split()
        return {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)}

    exp = {}
    for i, j in itertools.combinations(sorted(texts), 2):
        a, b = shset(texts[i]), shset(texts[j])
        inter = len(a & b)
        if inter:
            exp[(i, j)] = (inter, round(inter / len(a | b), 6))
    assert got == exp


def test_doc_id_packed_and_long_aid_no_collision():
    # normal 10-digit aid: packed form, reversible range
    assert doc_id_from_ids("001", "0000000123") == 1 * 10_000_000_000 + 123
    assert doc_id_from_ids("999", "9999999999") < 10_000_000_000_000
    # 11+-digit aids: hashed above the packed range, deterministic,
    # distinct pairs distinct (would collide under naive packing)
    a = doc_id_from_ids("001", "10000000123456")
    b = doc_id_from_ids("002", "00000000123456")  # 14 digits, differs
    assert a >= 10_000_000_000_000 and b >= 10_000_000_000_000
    assert a != b
    assert a == doc_id_from_ids("001", "10000000123456")
    assert a < 2**63


def test_extract_ids_accepts_legacy_format():
    # the indexing-path extract_ids must accept BOTH url shapes (url.rs:36-38)
    assert extract_ids(
        "https://n.news.naver.com/mnews/article/001/0001234567"
    ) == ("001", "0001234567")
    assert extract_ids(
        "https://news.naver.com/main/read.naver?oid=001&aid=0001234567"
    ) == ("001", "0001234567")
    assert extract_ids("https://example.com/nothing") is None


def test_lsh_bands_validation(spark):
    import pytest

    from baram_spark.operators.dedup import lsh_candidate_pairs

    sig = spark.createDataFrame([(1, 1, 2)], "doc_id long, mh0 int, mh1 int")
    with pytest.raises(ValueError, match="evenly divide"):
        lsh_candidate_pairs(sig, n_hashes=2, bands=4)  # empty signatures
    with pytest.raises(ValueError, match="evenly divide"):
        lsh_candidate_pairs(sig, n_hashes=8, bands=3)  # dropped hashes


def test_jaccard_gated_path_never_self_joins(spark):
    """The gated verifier must verify candidate PAIRS (Arrow kernel), not
    filter the output of the quadratic shingle-bucket self-join — no
    SortMergeJoin/shingle-keyed join may appear in the gated plan."""
    from baram_spark.operators.dedup import ngram_jaccard_pairs

    sh = spark.createDataFrame(
        [(d, f"s{s % 4}") for d in range(1, 7) for s in range(d, d + 3)],
        "doc_id long, shingle string",
    )
    cand = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    out = ngram_jaccard_pairs(sh, threshold=0.0, candidates=cand)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan, plan
    assert "shingle#" not in plan.split("MapInArrow")[0], plan
    rows = out.collect()
    assert all((r["id1"], r["id2"]) == (1, 2) for r in rows)
    assert len(rows) == 1 and rows[0]["n_common"] >= 1


def test_jaccard_broadcast_and_array_layouts_agree(spark):
    """The two physical layouts (broadcast doc→set dict vs per-pair set
    arrays) must return identical verified pairs, counts, and rounded
    jaccard values."""
    import random

    from baram_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (d, s)
        for d in range(40)
        for s in set(rng.sample(vocab, rng.randint(5, 12)))
    ]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    sig = minhash_signatures(sh, n_hashes=4)
    cand = lsh_candidate_pairs(sig, n_hashes=4, bands=2)

    def norm(df):
        return sorted(
            (r["id1"], r["id2"], r["n_common"], r["jaccard"])
            for r in df.collect()
        )

    small = norm(ngram_jaccard_pairs(sh, threshold=0.3, candidates=cand,
                                     broadcast_docs_threshold=10**6))
    large = norm(ngram_jaccard_pairs(sh, threshold=0.3, candidates=cand,
                                     broadcast_docs_threshold=0))
    assert small == large and len(small) > 0


def test_avg_word_len_multispace(spark):
    """avg_word_len averages ACTUAL token lengths — runs of whitespace
    between tokens must not inflate it (the len-n+1 shortcut did)."""
    from baram_spark.operators.text_analysis import quality_scores

    docs = spark.createDataFrame(
        [(1, "a \n\n b"), (2, "ab cd"), (3, "   "), (4, "xyz")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert rows[1]["avg_word_len"] == 1.0   # two 1-char words
    assert rows[2]["avg_word_len"] == 2.0
    assert rows[3]["avg_word_len"] == 0.0   # whitespace-only: no tokens
    assert rows[4]["avg_word_len"] == 3.0


def test_shingles_ignore_whitespace_runs(spark):
    """Two docs identical up to repeated whitespace shingle identically
    (empty tokens dropped before n-gram assembly, as simhash does)."""
    from baram_spark.operators.dedup import shingles

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a  b c  d")], "doc_id long, text string")
    sh = {(r["doc_id"], r["shingle"]) for r in shingles(docs, n=3).collect()}
    s1 = {s for d, s in sh if d == 1}
    s2 = {s for d, s in sh if d == 2}
    assert s1 == s2 and s1 == {"a b c", "b c d"}


def test_ngram_jaccard_candidates_are_normalized(spark):
    """Hand-built candidate lists: self-pairs are dropped, reversed pairs
    fold to id1 < id2, duplicates emit one row — the same contract as the
    ungated verifier's a.doc_id < b.doc_id self-join."""
    from baram_spark.operators.dedup import ngram_jaccard_pairs

    sh = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (2, "d"),
         (3, "x")],
        "doc_id long, shingle string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 2), (3, 3), (1, 3)],
        "id1 long, id2 long",
    )
    rows = {(r["id1"], r["id2"]): r["jaccard"]
            for r in ngram_jaccard_pairs(sh, threshold=0.1,
                                         candidates=cand).collect()}
    # (1,2)+(2,1)+dup -> ONE row; self-pairs gone; (1,3) shares nothing
    assert set(rows) == {(1, 2)}
    assert rows[(1, 2)] == 0.5  # |{a,b}| / |{a,b,c,d}|


def test_ngram_jaccard_value_gate_picks_array_layout(spark):
    """The broadcast gate is bytes-aware: a tiny values threshold forces
    the per-pair array layout, which must return identical rows."""
    from baram_spark.operators.dedup import ngram_jaccard_pairs

    sh = spark.createDataFrame(
        [(d, f"s{i}") for d in range(6) for i in range(d, d + 8)],
        "doc_id long, shingle string",
    )
    cand = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(a + 1, 6)],
        "id1 long, id2 long",
    )
    kw = dict(threshold=0.2, candidates=cand, parallelism=4)
    via_bc = {(r["id1"], r["id2"]): (r["n_common"], r["jaccard"])
              for r in ngram_jaccard_pairs(sh, **kw).collect()}
    via_arr = {(r["id1"], r["id2"]): (r["n_common"], r["jaccard"])
               for r in ngram_jaccard_pairs(
                   sh, **kw, broadcast_values_threshold=3).collect()}
    assert via_bc == via_arr and via_bc  # non-empty, layout-agnostic


def test_fused_lsh_jaccard_matches_composed(spark):
    """lsh_gated_jaccard's fused JVM plan must return exactly the rows of
    the composed minhash → lsh → gated-verify pipeline (same ids, counts,
    rounded jaccard), including docs sharing several bands."""
    import random

    from baram_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_gated_jaccard,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (d, s)
        for d in range(60)
        for s in set(rng.sample(vocab, rng.randint(4, 14)))
    ]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")

    def norm(df):
        return sorted(
            (r["id1"], r["id2"], r["n_common"], r["jaccard"])
            for r in df.collect()
        )

    fused = norm(lsh_gated_jaccard(
        sh, n_hashes=4, bands=2, threshold=0.2))
    sig = minhash_signatures(sh, n_hashes=4)
    cand = lsh_candidate_pairs(sig, n_hashes=4, bands=2)
    composed = norm(ngram_jaccard_pairs(
        sh, threshold=0.2, candidates=cand, candidates_distinct=True))
    assert fused == composed and len(fused) > 0


def test_fused_lsh_jaccard_duplicate_rows_equal_distinct(spark):
    """The fused aggregates (min / bit_or / count_distinct) must make
    duplicated (doc_id, shingle) rows indistinguishable from distinct
    input — the entry queries rely on this to skip the pre-distinct."""
    from baram_spark.operators.dedup import lsh_gated_jaccard

    base = [(d, f"s{i}") for d in range(8) for i in range(d, d + 5)]
    dup = base + base[::2] + base[::3]
    sh_dis = spark.createDataFrame(base, "doc_id long, shingle string")
    sh_dup = spark.createDataFrame(dup, "doc_id long, shingle string")

    def norm(df):
        return sorted(
            (r["id1"], r["id2"], r["n_common"], r["jaccard"])
            for r in df.collect()
        )

    a = norm(lsh_gated_jaccard(sh_dis, n_hashes=4, bands=2, threshold=0.1))
    b = norm(lsh_gated_jaccard(sh_dup, n_hashes=4, bands=2, threshold=0.1))
    assert a == b and len(a) > 0


def test_fused_lsh_jaccard_plan_is_shuffle_free(spark):
    """The returned fused plan must stream pairs out of a broadcast hash
    join with NO hash/range exchange: the quadratic pair stream may never
    cross a shuffle (that was the r5 286 s / 659 s scale-killer)."""
    import re

    from baram_spark.operators.dedup import lsh_gated_jaccard

    sh = spark.createDataFrame(
        [(d, f"s{i}") for d in range(10) for i in range(d, d + 4)],
        "doc_id long, shingle string",
    )
    out = lsh_gated_jaccard(sh, n_hashes=4, bands=2, threshold=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert not re.search(r"Exchange (?:hash|range)partitioning", plan), plan
    assert "MapInArrow" not in plan and "EvalPython" not in plan, plan


def test_fused_lsh_jaccard_vocab_gate_falls_back(spark):
    """A vocab above the fused gate must fall back to the composed plan
    (MapInArrow verifier) and still return identical rows."""
    from baram_spark.operators.dedup import lsh_gated_jaccard

    sh = spark.createDataFrame(
        [(d, f"s{i}") for d in range(12) for i in range(d, d + 6)],
        "doc_id long, shingle string",
    )
    fast = lsh_gated_jaccard(sh, n_hashes=4, bands=2, threshold=0.1)
    slow = lsh_gated_jaccard(sh, n_hashes=4, bands=2, threshold=0.1,
                             vocab_limit=3)
    plan = slow._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan, plan

    def norm(df):
        return sorted(
            (r["id1"], r["id2"], r["n_common"], r["jaccard"])
            for r in df.collect()
        )

    assert norm(fast) == norm(slow) and len(norm(fast)) > 0


def test_minhash_term_join_matches_per_row_plan(spark):
    """minhash_signatures' small-vocab plan (driver-hashed terms +
    broadcast join) must emit signatures byte-identical to the per-row
    md5 expression plan, duplicates or not."""
    from baram_spark.operators.dedup import minhash_signatures

    rows = [(d, f"t{(d * 7 + i) % 23}") for d in range(30) for i in range(9)]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")

    def norm(df):
        return sorted(tuple(r) for r in df.collect())

    fast = norm(minhash_signatures(sh, n_hashes=4))
    slow = norm(minhash_signatures(sh, n_hashes=4, vocab_limit=2))
    assert fast == slow and len(fast) == 30


def test_lsh_pairs_first_band_emission_distinct(spark):
    """Docs colliding in BOTH bands must yield exactly one pair row (the
    r5 dropDuplicates contract, now enforced by the first-matching-band
    join filter instead of a shuffle)."""
    from baram_spark.operators.dedup import lsh_candidate_pairs

    # identical signatures → collide in band 0 AND band 1
    sig = spark.createDataFrame(
        [(1, 10, 20, 30, 40), (2, 10, 20, 30, 40), (3, 10, 20, 99, 99)],
        "doc_id long, mh0 long, mh1 long, mh2 long, mh3 long",
    )
    rows = sorted((r["id1"], r["id2"]) for r in
                  lsh_candidate_pairs(sig, n_hashes=4, bands=2).collect())
    # (1,2) collides twice → once; (1,3)/(2,3) collide in band 0 only
    assert rows == [(1, 2), (1, 3), (2, 3)]


def test_lsh_pairs_salted_scale_path_matches_local(spark):
    """The above-threshold salted self-join plan must produce the same
    distinct pair set as the local broadcast plan."""
    import random

    from baram_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (d, s)
        for d in range(80)
        for s in set(rng.sample(vocab, rng.randint(3, 10)))
    ]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    sig = minhash_signatures(sh, n_hashes=4)
    local = sorted((r["id1"], r["id2"]) for r in lsh_candidate_pairs(
        sig, n_hashes=4, bands=2).collect())
    salted = sorted((r["id1"], r["id2"]) for r in lsh_candidate_pairs(
        sig, n_hashes=4, bands=2, local_rows_threshold=0, salt=4,
        parallelism=8).collect())
    assert local == salted and len(local) > 0
