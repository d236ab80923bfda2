"""BM25 math pinned against hand-computed values + oracle behavior."""

import math

from baram_spark.query.bm25 import (
    B,
    K1,
    TITLE_BOOST,
    BruteForceIndex,
    idf,
    tf_norm,
)


def test_constants_match_reference():
    assert K1 == 1.2 and B == 0.75 and TITLE_BOOST == 2.0


def test_idf_hand_computed():
    # N=10, df=2 → ln(1 + 8.5/2.5)
    assert math.isclose(idf(10, 2), math.log(1 + 8.5 / 2.5), rel_tol=1e-12)


def test_tf_norm_hand_computed():
    # tf=3, dl=100, avgdl=100 → 3 / (3 + 1.2)
    assert math.isclose(float(tf_norm(3, 100, 100.0)), 3 / 4.2, rel_tol=1e-12)


def _docs():
    return [
        (1, "뉴스 경제", "경제 시장 상승 경제"),
        (2, "스포츠 뉴스", "경기 결과 발표"),
        (3, "경제 발표", "정부 경제 정책 발표 시장"),
        (4, "날씨", "맑음 흐림"),
    ]


def test_oracle_ranks_title_boost():
    idx = BruteForceIndex.build(_docs())
    hits = idx.search("경제", k=4)
    ids = [h[0] for h in hits]
    assert set(ids) == {1, 3}  # docs containing 경제
    # doc1: 경제 in title AND twice in content; must outrank doc3
    assert ids[0] == 1


def test_oracle_min_should_match():
    idx = BruteForceIndex.build(_docs())
    hits = idx.search("존재하지않는단어", k=4)
    assert hits == []


def test_oracle_multi_term_union():
    idx = BruteForceIndex.build(_docs())
    hits = idx.search("경제 경기", k=4)
    assert {h[0] for h in hits} == {1, 2, 3}


def test_tie_break_doc_id_asc():
    docs = [(7, "같은 제목", "동일 본문"), (3, "같은 제목", "동일 본문")]
    idx = BruteForceIndex.build(docs)
    hits = idx.search("동일", k=2)
    assert [h[0] for h in hits] == [3, 7]
    assert hits[0][1] == hits[1][1]


def test_duplicate_query_terms_count_once():
    idx = BruteForceIndex.build(_docs())
    assert idx.search("경제 경제", k=4) == idx.search("경제", k=4)
