"""Property fuzz: Block-Max WAND ≡ exhaustive scoring, always.

Randomized posting sets (multiple terms, multi-block lists, duplicate
score ties, bound_factor drift) × random allowed/denied filters ×
random k / min_score — the pruned scorer must return rank- AND
score-identical results to the exhaustive scorer on every draw. This is
the committed form of the ad-hoc fuzz the review ran; hypothesis
shrinks any counterexample it ever finds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from baram_spark.index.codec import encode_postings
from baram_spark.query.wand import (
    TermPostings,
    score_blockmax,
    score_exhaustive,
)


def _make_term(rng: np.random.Generator, field: str, term: str,
               n_docs: int, universe: int, weight: float,
               bound_factor: float) -> TermPostings:
    ids = np.sort(rng.choice(universe, size=n_docs, replace=False)
                  .astype(np.int64))
    tfs = rng.integers(1, 6, size=n_docs).astype(np.int64)
    dls = rng.integers(5, 300, size=n_docs).astype(np.int64)
    blob, skips, bmax = encode_postings(ids, tfs, dls, avgdl=80.0)
    return TermPostings(field, term, weight, blob, skips, bmax,
                        avgdl=80.0 * bound_factor, bound_factor=bound_factor)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_blockmax_equals_exhaustive_fuzz(seed):
    rng = np.random.default_rng(seed)
    universe = int(rng.integers(50, 2000))
    n_terms = int(rng.integers(1, 5))
    terms = []
    for t in range(n_terms):
        n_docs = int(rng.integers(1, min(universe, 400)))
        weight = float(rng.uniform(0.1, 4.0))
        # avgdl drift: bounds scaled up, scoring avgdl unchanged — the
        # incremental-generation correction path
        bf = float(rng.choice([1.0, 1.0, rng.uniform(1.0, 1.5)]))
        terms.append(_make_term(rng, "content", f"t{t}", n_docs,
                                universe, weight, bf))
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
