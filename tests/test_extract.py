"""Extraction golden tests — the per-url byte-identical invariant.

Fixture shapes mirror /root/reference/tests/parser_test.rs:24-120 +
tests/fixtures/html/; expectations pinned here as goldens.
"""

import os

import pandas as pd
import pytest

from baram_spark.corpus import make_pages_pdf
from baram_spark.textproc.extract import (
    decode_bytes,
    detect_format,
    extract_batch,
    extract_ids,
    is_deleted_article,
    parse_with_fallback,
)
from baram_spark.textproc.htmldom import parse_html

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures", "html")
URL = "https://n.news.naver.com/mnews/article/001/0001234567"

GOLDEN_GENERAL_CONTENT = (
    "오늘 시장은 상승했다. 거래량이 늘었다.\n\n"
    "정부가 발표를 '준비' 중이다.\n\n"
    "전문가들은 신중한 입장이다."
)


def _read(name: str) -> str:
    with open(os.path.join(FIXTURES, name), encoding="utf-8") as f:
        return f.read()


def test_extract_ids():
    assert extract_ids(URL) == ("001", "0001234567")
    assert extract_ids("https://n.news.naver.com/article/123/9876543210") == (
        "123", "9876543210",
    )
    assert extract_ids("https://example.com/nope") is None


def test_general_golden():
    r = parse_with_fallback(_read("general_news.html"), URL)
    assert r["title"] == "경제 뉴스 & 시장 동향"
    assert r["content"] == GOLDEN_GENERAL_CONTENT
    assert r["publisher"] == "바람일보"
    assert r["author"] == "김기자"
    assert r["format"] == "general"
    assert str(r["published_at"]) == "2024-12-15 14:30:00"
    assert r["content_hash"] == (
        "6cd3c8faa6e28f2f7145eb424bc6af6f4ecc8bea900ab5852504c626292a2794"
    )


def test_deleted_article_filtered():
    html = _read("deleted_article.html")
    assert is_deleted_article(html, parse_html(html))
    assert parse_with_fallback(html, URL) is None


def test_euc_kr_decode_path():
    with open(os.path.join(FIXTURES, "euc_kr_sample.html.bin"), "rb") as f:
        raw = f.read()
    html = decode_bytes(raw)
    r = parse_with_fallback(html, URL)
    assert r["content"] == GOLDEN_GENERAL_CONTENT


def test_detect_format_priority():
    assert detect_format(parse_html('<div id="dic_area">x</div>')) == "general"
    assert detect_format(parse_html('<div class="article_body">x</div>')) == "entertainment"
    assert detect_format(parse_html('<div class="news_end">x</div>')) == "sports"
    assert detect_format(parse_html('<div class="end_ct_area">x</div>')) == "card"
    # general wins when both present
    assert detect_format(
        parse_html('<div class="news_end">x</div><div id="dic_area">y</div>')
    ) == "general"
    assert detect_format(parse_html("<p>nothing</p>")) == "unknown"


def test_fallback_chain():
    # detected general (has #dic_area) but empty content → falls through to
    # entertainment parser
    html = (
        '<html><body><div id="dic_area"></div>'
        '<h2 class="end_tit">제목 A</h2>'
        '<div class="article_body">본문 내용입니다 이것은.</div>'
        "<article></article></body></html>"
    )
    r = parse_with_fallback(html + "x" * 5000, URL)
    assert r is not None
    assert r["category"] == "entertainment"
    assert r["content"] == "본문 내용입니다 이것은."


def test_noise_string_replacement_semantics():
    # identical noise markup appearing twice is removed everywhere (string
    # replace), including an occurrence outside a matched element context
    html = (
        '<html><body><div id="title_area"><span>T</span></div>'
        '<article id="dic_area">A'
        '<em class="img_desc">cap</em>B<em class="img_desc">cap</em>C'
        "</article><article>pad</article></body></html>"
    )
    r = parse_with_fallback(html, URL)
    assert r is not None
    assert r["content"] == "ABC"


def test_corpus_batch_byte_identity():
    """The corpus generator's expected text matches the extractor exactly."""
    pdf = make_pages_pdf(0, 300)
    res = extract_batch(pdf["html"], pdf["url"])
    for i in range(len(pdf)):
        exp, got = pdf["text"][i], res["text"][i]
        if exp is None:
            assert got is None, f"row {i} should be deleted"
        else:
            assert got == exp, f"row {i} ({pdf['shape'][i]}) text mismatch"
            assert res["title"][i] == pdf["title"][i]


def test_extract_batch_preserves_row_count():
    pdf = make_pages_pdf(0, 50)
    res = extract_batch(pdf["html"], pdf["url"])
    assert len(res) == 50
    assert res["url"].notna().all()
