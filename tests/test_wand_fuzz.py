"""Property fuzz: Block-Max WAND ≡ exhaustive scoring ≡ brute force, always.

Randomized posting sets (multiple terms, multi-block lists, duplicate
score ties, bound_factor drift, ALL THREE posting codecs) × random
allowed/denied filters × random k / min_score — the pruned scorer must
return rank- AND score-identical results to the exhaustive scorer AND to
an independent brute-force oracle (raw arrays, no codec, no wand.py
internals) on every draw. hypothesis shrinks any counterexample."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from baram_spark.index.codec import (
    CODEC_FOR,
    CODEC_PFOR,
    CODEC_VARINT,
    bm25_tf_norm,
    encode_postings,
)
from baram_spark.query.wand import (
    TermPostings,
    score_blockmax,
    score_exhaustive,
)


def _make_term(rng: np.random.Generator, field: str, term: str,
               n_docs: int, universe: int, weight: float,
               bound_factor: float, codec: int):
    ids = np.sort(rng.choice(universe, size=n_docs, replace=False)
                  .astype(np.int64))
    tfs = rng.integers(1, 6, size=n_docs).astype(np.int64)
    dls = rng.integers(5, 300, size=n_docs).astype(np.int64)
    blob, skips, bmax = encode_postings(ids, tfs, dls, avgdl=80.0,
                                        codec=codec)
    tp = TermPostings(field, term, weight, blob, skips, bmax,
                      avgdl=80.0 * bound_factor, bound_factor=bound_factor)
    return tp, (ids, tfs, dls)


def _brute_force(raw_terms, k, min_score, allowed, denied):
    """Independent oracle over the RAW arrays: same float64 BM25 math and
    the same term-major accumulation order as the engine (canonical term
    order is the sorted term name here — all terms share one field), but
    no codec, no skip tables, no wand.py filtering helpers."""
    scores: dict[int, float] = {}
    allowed_set = None if allowed is None else set(int(x) for x in allowed)
    denied_set = set() if denied is None else set(int(x) for x in denied)
    for _term_name, weight, avgdl_scoring, (ids, tfs, dls) in sorted(
            raw_terms, key=lambda t: t[0]):
        tfn = bm25_tf_norm(tfs, dls, avgdl_scoring)
        for i in range(ids.size):
            d = int(ids[i])
            if allowed_set is not None and d not in allowed_set:
                continue
            if d in denied_set:
                continue
            scores[d] = scores.get(d, 0.0) + float(weight * tfn[i])
    cand = [(d, s) for d, s in scores.items()
            if min_score is None or s >= min_score]
    cand.sort(key=lambda t: (-t[1], t[0]))
    return cand[:k]


@settings(max_examples=220, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_blockmax_equals_exhaustive_equals_bruteforce_fuzz(seed):
    rng = np.random.default_rng(seed)
    universe = int(rng.integers(50, 2000))
    n_terms = int(rng.integers(1, 5))
    terms, raw_terms = [], []
    for t in range(n_terms):
        n_docs = int(rng.integers(1, min(universe, 400)))
        weight = float(rng.uniform(0.1, 4.0))
        # avgdl drift: bounds scaled up, scoring avgdl unchanged — the
        # incremental-generation correction path
        bf = float(rng.choice([1.0, 1.0, rng.uniform(1.0, 1.5)]))
        codec = int(rng.choice([CODEC_VARINT, CODEC_FOR, CODEC_PFOR]))
        tp, raw = _make_term(rng, "content", f"t{t}", n_docs,
                             universe, weight, bf, codec)
        terms.append(tp)
        raw_terms.append((f"t{t}", weight, 80.0 * bf, raw))
    k = int(rng.integers(1, 30))
    min_score = (None if rng.random() < 0.5
                 else float(rng.uniform(0.0, 3.0)))
    allowed = None
    if rng.random() < 0.4:
        allowed = np.unique(
            rng.choice(universe, size=int(rng.integers(1, universe)),
                       replace=False).astype(np.int64))
    denied = None
    if rng.random() < 0.4:
        denied = np.unique(
            rng.choice(universe, size=int(rng.integers(1, 20)),
                       replace=False).astype(np.int64))
    got = score_blockmax(terms, k, min_score=min_score,
                         allowed=allowed, denied=denied)
    exp = score_exhaustive(terms, k, min_score=min_score,
                           allowed=allowed, denied=denied)
    assert got == exp
    brute = _brute_force(raw_terms, k, min_score, allowed, denied)
    assert len(got) == len(brute)
    for (gd, gs), (bd, bs) in zip(got, brute):
        assert gd == bd
        assert gs == bs, (gd, gs, bs)
