"""BM25 scoring — the pinned ranking spec + brute-force oracle.

The reference issues an OpenSearch bool-should query (``/root/reference/src/
embedding/mod.rs:469-535``): ``match title`` boosted 2.0 + ``match content``,
``minimum_should_match: 1``, default k=10, scored by Lucene BM25 with
k1=1.2, b=0.75. This module pins that ranking function exactly:

    idf(t, F)      = ln(1 + (N_F - df_F(t) + 0.5) / (df_F(t) + 0.5))
    tfn(t, d, F)   = tf / (tf + k1 * (1 - b + b * dl_F(d) / avgdl_F))
    score(d)       = 2.0 * Σ_t idf(t,title)   * tfn(t,d,title)
                   + 1.0 * Σ_t idf(t,content) * tfn(t,d,content)

(the modern Lucene formulation — the constant (k1+1) factor is omitted, as
Lucene ≥8 does, since it never changes ranking). Per-field statistics:
``N_F`` counts docs with a non-empty field, ``avgdl_F`` is the mean analyzed
token count of that field. Duplicate query terms contribute once per distinct
term (OpenSearch match-query semantics sum per unique term with boosted
term-frequency handled by tf, not repetition).

``minimum_should_match: 1`` ⇒ only docs containing ≥1 query term in ≥1 field
are returned. Ties break (score DESC, doc_id ASC) — the canonical rank
identity used across engine, oracle, and tests.

The brute-force oracle here is the rank-identity ground truth for the
distributed engine (same float64 math, same tie-break).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from ..textproc.analyzer import analyze_index, analyze_search

K1 = 1.2
B = 0.75
TITLE_BOOST = 2.0
DEFAULT_K = 10
# The reference's search_bm25 always adds a third should-clause matching
# chunk_text (mod.rs:493-501, boost 1.0). Its own indexing paths write
# chunk_text: None for every doc (index.rs:519-520, mod.rs:969), so with no
# chunked docs the field has zero postings and rankings are identical to the
# 2-field query — but when a docs table carries a chunk_text column, it is
# indexed and scored exactly like the reference would.
FIELDS = ("title", "content", "chunk_text")
FIELD_BOOSTS = {"title": TITLE_BOOST, "content": 1.0, "chunk_text": 1.0}


def idf(n_docs: int, df: int) -> float:
    """Lucene BM25 idf."""
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def tf_norm(tf, dl, avgdl: float, k1: float = K1, b: float = B):
    """BM25 tf component (works on scalars or numpy arrays)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


@dataclass
class FieldStats:
    n_docs: int
    avgdl: float
    df: dict  # term -> doc freq


@dataclass
class BruteForceIndex:
    """In-memory per-field index for the oracle scorer."""

    doc_ids: list
    tf: dict = field(default_factory=dict)  # field -> {doc_id: Counter(term)}
    dl: dict = field(default_factory=dict)  # field -> {doc_id: int}
    stats: dict = field(default_factory=dict)  # field -> FieldStats
    meta: dict = field(default_factory=dict)
    # meta: doc_id -> (category, published_at[, publisher])

    @classmethod
    def build(cls, docs, meta: dict | None = None) -> "BruteForceIndex":
        """docs: iterable of (doc_id, title, content[, chunk_text]);
        ``meta``: optional {doc_id: (category, published_at[, publisher])}
        enabling filter-context search (the reference's bool-filter)."""
        idx = cls(doc_ids=[], meta=meta or {})
        for f in FIELDS:
            idx.tf[f] = {}
            idx.dl[f] = {}
        for row in docs:
            doc_id, title, content = row[0], row[1], row[2]
            chunk = row[3] if len(row) > 3 else None
            idx.doc_ids.append(doc_id)
            for fname, text in (
                ("title", title), ("content", content), ("chunk_text", chunk)
            ):
                tokens = analyze_index(text or "")
                if not tokens:
                    continue
                idx.tf[fname][doc_id] = Counter(tokens)
                idx.dl[fname][doc_id] = len(tokens)
        for fname in FIELDS:
            dls = idx.dl[fname]
            n = len(dls)
            avgdl = (sum(dls.values()) / n) if n else 0.0
            df: Counter = Counter()
            for counts in idx.tf[fname].values():
                df.update(counts.keys())
            idx.stats[fname] = FieldStats(n_docs=n, avgdl=avgdl, df=dict(df))
        return idx

    def search(self, query_text: str, k: int = DEFAULT_K,
               min_score: float | None = None,
               category: str | None = None,
               date_from=None, date_to=None,
               publisher: str | None = None):
        """Top-k (doc_id, score) — float64, tie-break (score desc, id asc).

        category/publisher/date filters are FILTER CONTEXT
        (mod.rs:509-531): they restrict the candidate set before top-k;
        surviving docs keep the same score as an unfiltered search
        (df/idf stats unchanged)."""
        allowed = None
        if (category is not None or date_from is not None
                or date_to is not None or publisher is not None):
            allowed = set()
            for doc_id, m in self.meta.items():
                cat, pub = m[0], m[1]
                doc_publisher = m[2] if len(m) > 2 else None
                if category is not None and cat != category:
                    continue
                if publisher is not None and doc_publisher != publisher:
                    continue
                # pub != pub catches NaT/NaN (missing dates fail range filters)
                missing = pub is None or pub != pub
                if date_from is not None and (missing or pub < date_from):
                    continue
                if date_to is not None and (missing or pub > date_to):
                    continue
                allowed.add(doc_id)
        terms = sorted(set(analyze_search(query_text)))
        scores: dict = {}
        for fname in FIELDS:
            st = self.stats[fname]
            boost = FIELD_BOOSTS[fname]
            if st.n_docs == 0:
                continue
            for term in terms:
                df_t = st.df.get(term)
                if not df_t:
                    continue
                w = boost * idf(st.n_docs, df_t)
                for doc_id, counts in self.tf[fname].items():
                    tf = counts.get(term)
                    if tf:
                        contrib = w * float(
                            tf_norm(tf, self.dl[fname][doc_id], st.avgdl)
                        )
                        scores[doc_id] = scores.get(doc_id, 0.0) + contrib
        hits = [
            (doc_id, s)
            for doc_id, s in scores.items()
            if (min_score is None or s >= min_score)
            and (allowed is None or doc_id in allowed)
        ]
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]
