"""Pinned token goldens for the nori-style analyzer chain (the same way the
reference pins nori behavior via index settings, src/embedding/mod.rs:247-276).
"""

from baram_spark.textproc.analyzer import analyze_index, analyze_search


def test_decompound_mixed_emits_compound_and_parts():
    assert analyze_index("대한민국") == ["대한민국", "대한", "민국"]


def test_particle_split_kept_as_token():
    # josa are separate tokens, NOT dropped (J* absent from stoptags)
    assert analyze_index("대한민국은") == ["대한민국", "대한", "민국", "은"]
    assert analyze_index("검색엔진을") == ["검색엔진", "검색", "엔진", "을"]


def test_lowercase_and_punct_discard():
    assert analyze_index("Hello, World! AI-2024") == ["hello", "world", "ai", "2024"]


def test_pos_stoplist():
    # 매우(MAG), 이런(MM) dropped; nouns survive
    assert analyze_index("매우 이런 뉴스 기사") == ["뉴스", "기사"]


def test_readingform_index_only():
    assert analyze_index("韓國 뉴스") == ["한국", "뉴스"]
    assert analyze_search("韓國 뉴스") == ["뉴스"]  # search analyzer: no readingform


def test_mixed_script_golden():
    assert analyze_index("대한민국은 AI 검색엔진을 만든다") == [
        "대한민국", "대한", "민국", "은", "ai", "검색엔진", "검색", "엔진", "을",
        "만든다",
    ]


def test_empty_and_whitespace():
    assert analyze_index("") == []
    assert analyze_index("  \n\t ") == []


def test_deterministic():
    text = "인공지능 빅데이터 분산처리 시스템 구축 결과 발표"
    assert analyze_index(text) == analyze_index(text)


def test_lexicon_word_beats_particle_strip():
    """A run that IS a dictionary word whose last syllable spells a
    particle ('결과') must segment as the word — bare query and inflected
    doc form share the token."""
    from baram_spark.textproc.analyzer import analyze_index, analyze_search

    assert analyze_search("결과") == ["결과"]
    assert analyze_index("결과가")[0] == "결과"
    # shared token between bare query and inflected doc
    assert set(analyze_search("결과")) & set(analyze_index("결과가"))


def test_single_char_lexicon_entries_match():
    """Greedy matching reaches length-1 lexicon entries ('빅' from the
    빅데이터 decompound) inside unknown runs."""
    from baram_spark.textproc.analyzer import analyze_index

    toks = analyze_index("빅데이터")
    assert "빅" in toks and "데이터" in toks
