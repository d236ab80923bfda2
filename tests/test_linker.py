"""Entity linking (linker.rs analog): normalization, KB/alias lookup,
fuzzy matching, RDF URIs, and the distributed pass."""

import pytest

from baram_spark.operators.linker import (
    link_entities,
    link_one,
    normalize_text,
    similarity,
    url_encode,
)


def test_normalize_strips_person_titles():
    assert normalize_text("이재용 회장", "Person") == "이재용"
    assert normalize_text("윤석열 대통령", "Person") == "윤석열"
    assert normalize_text("김수종 씨", "Person") == "김수종"
    # org suffixes are NOT stripped (linker.rs:699-702 leaves orgs as-is)
    assert normalize_text("삼성전자", "Organization") == "삼성전자"
    assert normalize_text("'삼성전자'", "Organization") == "삼성전자"
    assert normalize_text("  서울   특별시  ", "Location") == "서울 특별시"


def test_similarity_reference_semantics():
    assert similarity("삼성전자", "삼성전자") == 1.0
    assert similarity("", "x") == 0.0
    # containment → BYTE-length ratio (Rust len()): 삼성 (6B) / 삼성전자 (12B)
    assert similarity("삼성", "삼성전자") == pytest.approx(0.5)
    # disjoint-ish → char Jaccard
    assert similarity("abc", "bcd") == pytest.approx(2 / 4)


def test_alias_lookup_hits_kb():
    r = link_one("이재용 회장", "Person")
    assert r["canonical"] == "이재용" and r["in_knowledge_base"]
    assert r["wikidata"] == "Q491522"
    assert r["confidence"] == 0.95
    assert r["rdf_uri"] == "http://www.wikidata.org/entity/Q491522"
    # alias → canonical, KB's type wins
    assert link_one("하이닉스", "Organization")["canonical"] == "SK하이닉스"
    assert link_one("민주당", "Organization")["canonical"] == "더불어민주당"
    assert link_one("Samsung", "Organization")["canonical"] == "삼성전자"
    assert link_one("한국", "Location")["canonical"] == "대한민국"


def test_fuzzy_containment_match():
    # '삼성전자가' contains canonical: 12/15 bytes = 0.8 >= threshold
    r = link_one("삼성전자가", "Organization")
    assert r["canonical"] == "삼성전자" and r["in_knowledge_base"]
    assert r["confidence"] == pytest.approx(0.8)
    # below threshold → no KB link
    r = link_one("삼성전자서비스센터", "Organization")
    assert not r["in_knowledge_base"]
    # fuzzy off → normalized fallback even for near matches
    r = link_one("삼성전자가", "Organization", fuzzy=False)
    assert not r["in_knowledge_base"]


def test_unknown_entity_gets_baram_uri():
    r = link_one("김수종", "Person", confidence=0.8)
    assert r["canonical"] == "김수종" and not r["in_knowledge_base"]
    assert r["confidence"] == pytest.approx(0.8)
    assert r["rdf_uri"].startswith("https://baram.example.org/entity/")


def test_url_encode_reference_semantics():
    assert url_encode("Kim-99.x~") == "Kim-99.x~"
    assert url_encode("a b") == "a_b"
    assert url_encode("김!") == "%EA%B9%80%21"


def test_distributed_linking(spark):
    docs = spark.createDataFrame(
        [(1, "재계", "이재용 회장이 하이닉스 투자를 밝혔다."),
         (2, "정치", "민주당 김수종 의원이 말했다.")],
        "doc_id long, title string, text string",
    )
    rows = link_entities(docs).collect()
    by_orig = {}
    for r in rows:
        by_orig.setdefault(r["original"], r)
    assert by_orig["이재용"]["canonical"] == "이재용"
    assert by_orig["이재용"]["wikidata"] == "Q491522"
    assert by_orig["민주당"]["canonical"] == "더불어민주당"
    assert by_orig["김수종"]["in_knowledge_base"] is False
    # per-doc provenance
    assert {r["doc_id"] for r in rows} == {"1", "2"}


def test_entity_linking_query_golden(spark):
    """The entity_linking driver query (rows-only on the driver side) is
    pinned here: deterministic corpus → exact aggregate."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    rows = entry.queries()["entity_linking"](spark, "unused").collect()
    assert len(rows) == 39
    assert sum(r["mentions"] for r in rows) == 3890
    by_canon = {r["canonical"]: r for r in rows}
    assert by_canon["더불어민주당"]["in_knowledge_base"]
    assert by_canon["더불어민주당"]["wikidata"] == "Q21207862"
    assert by_canon["더불어민주당"]["mentions"] == 277
    assert by_canon["기획재정부"]["wikidata"] == "Q483867"
    assert by_canon["미국"]["entity_type"] == "Location"
    assert not by_canon["한빛전자"]["in_knowledge_base"]
    assert len([r for r in rows if r["in_knowledge_base"]]) == 5
