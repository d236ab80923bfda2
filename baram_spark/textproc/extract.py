"""HTML article extraction — format detection, fallback chain, noise removal.

From-scratch Python re-implementation of the reference extraction algorithm
(the per-url byte-identical invariant):

- selector families:      /root/reference/src/parser/selectors.rs:16-172
- detect_format:          /root/reference/src/parser/html.rs:453-501
- parse_with_fallback:    /root/reference/src/parser/html.rs:67-142
- per-format parsers:     /root/reference/src/parser/html.rs:145-256
- extract_first_match:    /root/reference/src/parser/html.rs:259-269
- extract_content_text +
  string-replace noise:   /root/reference/src/parser/html.rs:272-341
- is_deleted_article:     /root/reference/src/parser/html.rs:346-409
- charset decode chain:   /root/reference/src/crawler/fetcher.rs:339-372
- doc-id from url:        /root/reference/src/crawler/url.rs:36-38

Used inside an Arrow-batched pandas UDF (``extract_batch``); the parse work is
necessarily per-document, but all of it happens JVM→Arrow→pandas batch-side
with zero Python row shipping beyond the batch itself.
"""

from __future__ import annotations

import hashlib
import re
from datetime import datetime

import pandas as pd

from .dates import parse_article_date
from .htmldom import Document, Selector, parse_html
from .sanitize import has_content, sanitize_text

# --- selector families (selectors.rs:16-172) -------------------------------

GENERAL_TITLE = ["#title_area span", ".media_end_head_title", "h2.media_end_head_headline"]
GENERAL_CONTENT = ["#dic_area", "#articleBodyContents", "article#dic_area"]
GENERAL_DATE = [
    ".media_end_head_info_datestamp_time",
    "._ARTICLE_DATE_TIME",
    "span.media_end_head_info_datestamp_time",
]
GENERAL_PUBLISHER = [
    ".media_end_head_top_logo img",
    ".press_logo img",
    "a.media_end_head_top_logo_img img",
]
GENERAL_AUTHOR = [".byline", ".journalist_name", "span.byline_s"]

ENT_TITLE = [
    ".end_tit", "h2.end_tit", ".article_tit",
    "h2.ArticleHead_article_title__qh8GV", ".ArticleHead_article_title__qh8GV",
    "h2[class*='article_title']",
]
ENT_CONTENT = [
    ".article_body", "#articeBody", "div.end_body_wrp",
    "article.Article_comp_news_article__XIpve", "article[class*='_article_body']",
    "div._article_content", "article#comp_news_article",
]
ENT_DATE = [
    ".article_info .author em", ".info_date", "span.author em",
    ".DateInfo_info_item__3yQPs em.date",
    ".DateInfo_article_head_date_info__CS6Gx em.date",
    "div[class*='DateInfo'] em.date",
]
ENT_PUBLISHER = [".JournalistCard_press_name__s3Eup", "em[class*='press_name']", ".press_name"]
ENT_AUTHOR = [".JournalistCard_name__0ZSAO", "em[class*='name']", ".journalist_name"]

SPORTS_TITLE = [
    ".news_headline .title", "h4.title", ".NewsEndMain_article_title__j5ND9",
    "h2.ArticleHead_article_title__qh8GV", ".ArticleHead_article_title__qh8GV",
    "h2[class*='article_title']",
]
SPORTS_CONTENT = [
    ".news_end", "#newsEndContents", "div.NewsEndMain_article_body__D5MUB",
    "article.Article_comp_news_article__XIpve", "article[class*='_article_body']",
    "div._article_content", "article#comp_news_article",
]
SPORTS_DATE = [
    ".info span", ".news_date", "em.date",
    ".DateInfo_info_item__3yQPs em.date",
    ".DateInfo_article_head_date_info__CS6Gx em.date",
    "div[class*='DateInfo'] em.date",
]
SPORTS_PUBLISHER = ENT_PUBLISHER
SPORTS_AUTHOR = ENT_AUTHOR

CARD_TITLE = ["h2.end_tit", ".media_end_head_title", "h3.tit_view"]
CARD_CONTENT = ["div.end_ct_area", "div.card_area", "div.content_area"]
CARD_CAPTIONS = ["em.img_desc", ".txt", "figcaption"]

NOISE_ELEMENTS = [
    "em.img_desc", "div.link_news", ".end_photo_org", ".vod_player_wrap",
    "script", "style", "noscript", "iframe", ".ad_wrap", ".reporter_area",
    ".byline_wrap", ".copyright", ".source",
]

_DELETED_INDICATORS = (
    "삭제된 기사", "없는 기사", "서비스 되지 않는", "페이지를 찾을 수 없습니다",
    "삭제되었거나", "존재하지 않는 기사", "기사가 삭제, 수정, 이동되었거나",
)
_ERROR_SELECTORS = (
    ".error_content", ".deleted_content", ".article_error", ".news_error",
    "#ct > .error_msg", ".err_wrap",
)
_DELETED_CONTENT_PROBES = ("#dic_area", ".article_body", ".news_end", "article")


class FORMAT:
    GENERAL = "general"
    ENTERTAINMENT = "entertainment"
    SPORTS = "sports"
    CARD = "card"
    UNKNOWN = "unknown"


def decode_bytes(raw: bytes) -> str | None:
    """Charset decode chain: UTF-8 → EUC-KR → meta-tag sniff.

    Mirrors /root/reference/src/crawler/fetcher.rs:339-372. Two parity
    details: the reference's encoding_rs "EUC-KR" is WHATWG EUC-KR,
    which is the cp949 superset (Python's strict 'euc-kr' rejects
    cp949-only syllables like 뷁 that real pages contain), and an
    undecodable page is an ERROR there — returning mojibake via lossy
    replacement would index garbage docs the reference rejects, so this
    returns None instead (callers drop the page as unparseable)."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        pass
    try:
        return raw.decode("cp949")  # WHATWG EUC-KR
    except UnicodeDecodeError:
        pass
    head = raw[:2048].decode("ascii", errors="ignore").lower()
    m = re.search(r'charset=["\']?([\w-]+)', head)
    if m:
        enc = m.group(1)
        if enc in ("euc-kr", "euckr", "ks_c_5601-1987"):
            enc = "cp949"
        try:
            return raw.decode(enc)
        except (UnicodeDecodeError, LookupError):
            pass
    return None


def extract_ids(url: str) -> tuple[str, str] | None:
    """(oid, aid) from a news article url (url.rs:36-38).

    Delegates to :func:`baram_spark.sources.urls.extract_ids`, which accepts
    both the path format ``/(mnews/)?article/{oid}/{aid}`` and the legacy
    query format ``oid=...&aid=...`` — the reference's url.rs matches both,
    so the indexing path must too (legacy-URL pages would otherwise be
    silently dropped).
    """
    from baram_spark.sources.urls import extract_ids as _extract_ids

    return _extract_ids(url)


def detect_format(doc: Document) -> str:
    """Probe selectors in priority order (html.rs:453-501)."""
    if doc.select_first("#dic_area") is not None:
        return FORMAT.GENERAL
    if doc.select_first(".article_body, div.end_body_wrp") is not None:
        return FORMAT.ENTERTAINMENT
    if doc.select_first(".news_end, div.NewsEndMain_article_body__D5MUB") is not None:
        return FORMAT.SPORTS
    if doc.select_first(
        "article.Article_comp_news_article__XIpve, article#comp_news_article"
    ) is not None:
        return FORMAT.SPORTS
    if doc.select_first("h2[class*='ArticleHead_article_title']") is not None:
        return FORMAT.SPORTS
    if doc.select_first("div.end_ct_area, div.card_area") is not None:
        return FORMAT.CARD
    return FORMAT.UNKNOWN


def is_deleted_article(html: str, doc: Document) -> bool:
    """Deleted/unavailable page predicate (html.rs:346-409)."""
    title_el = doc.select_first("title")
    if title_el is not None:
        title_text = title_el.text()
        if any(ind in title_text for ind in _DELETED_INDICATORS):
            return True
    for sel in _ERROR_SELECTORS:
        for el in doc.select(sel):
            text = el.text()
            if any(ind in text for ind in _DELETED_INDICATORS):
                return True
    has_area = any(doc.select_first(p) is not None for p in _DELETED_CONTENT_PROBES)
    # the reference compares UTF-8 BYTE length (html.rs:403 html.len());
    # Korean pages are ~3 bytes/char, so a char-count comparison would
    # delete pages the reference keeps
    if not has_area and len(html.encode("utf-8")) < 5000:
        return True
    return False


def _first_match(doc: Document, selectors: list[str]) -> str | None:
    for s in selectors:
        el = doc.select_first(s)
        if el is not None:
            text = el.text()
            if has_content(text):
                return text
    return None


def _content_text(doc: Document, selectors: list[str]) -> str | None:
    for s in selectors:
        el = doc.select_first(s)
        if el is not None:
            # fast path: noise selectors are single compounds (no
            # combinators), so matching them against el's subtree in the
            # main DOM finds exactly the elements the reference finds by
            # re-parsing el.html() as a fragment — one parse saved per doc.
            content_html = el.html()
            clean_html = content_html
            for ns in NOISE_ELEMENTS:
                nsel = Selector.parse(ns)
                for sub in el.iter():
                    if sub is not el and nsel.matches(sub):
                        noise_html = sub.html()
                        if noise_html:
                            clean_html = clean_html.replace(noise_html, "")
            text = parse_html(clean_html).root.text()
            if has_content(text):
                return text
    return None


def _publisher(doc: Document, selectors: list[str]) -> str | None:
    for s in selectors:
        el = doc.select_first(s)
        if el is not None:
            alt = el.attrs.get("alt")
            if has_content(alt):
                return alt
            text = el.text()
            if has_content(text):
                return text
    return None


def _captions(doc: Document) -> str | None:
    captions = []
    for s in CARD_CAPTIONS:
        for el in doc.select(s):
            text = el.text()
            if has_content(text):
                captions.append(text)
    return "\n\n".join(captions) if captions else None


def _parse_format(doc: Document, fmt: str) -> dict | None:
    """One format parser; returns fields or None (≈ html.rs:145-256)."""
    if fmt == FORMAT.GENERAL:
        title_sel, content_sel = GENERAL_TITLE, GENERAL_CONTENT
        date_sel, pub_sel, author_sel = GENERAL_DATE, GENERAL_PUBLISHER, GENERAL_AUTHOR
        category = ""
    elif fmt == FORMAT.ENTERTAINMENT:
        title_sel, content_sel = ENT_TITLE, ENT_CONTENT
        date_sel, pub_sel, author_sel = ENT_DATE, ENT_PUBLISHER, ENT_AUTHOR
        category = "entertainment"
    elif fmt == FORMAT.SPORTS:
        title_sel, content_sel = SPORTS_TITLE, SPORTS_CONTENT
        date_sel, pub_sel, author_sel = SPORTS_DATE, SPORTS_PUBLISHER, SPORTS_AUTHOR
        category = "sports"
    else:  # card
        title = _first_match(doc, CARD_TITLE)
        if title is None:
            return None
        content = _content_text(doc, CARD_CONTENT) or _captions(doc)
        if content is None:
            return None
        return {
            "title": sanitize_text(title), "content": sanitize_text(content),
            "category": "card", "published_at": None,
            "publisher": None, "author": None, "format": FORMAT.CARD,
        }

    title = _first_match(doc, title_sel)
    if title is None:
        return None
    content = _content_text(doc, content_sel)
    if content is None or not has_content(content):
        return None
    date = _first_match(doc, date_sel)
    # img-alt-first publisher extraction is a GENERAL-format behavior
    # (html.rs:159 extract_publisher); entertainment/sports use the plain
    # text-only first-match (html.rs:190, 221)
    if fmt == FORMAT.GENERAL:
        publisher = _publisher(doc, pub_sel)
    else:
        publisher = _first_match(doc, pub_sel)
    author = _first_match(doc, author_sel)
    return {
        "title": sanitize_text(title),
        "content": sanitize_text(content),
        "category": category,
        "published_at": parse_article_date(date) if date else None,
        "publisher": publisher,
        "author": author,
        "format": fmt,
    }


_FALLBACK_ORDER = (FORMAT.GENERAL, FORMAT.ENTERTAINMENT, FORMAT.SPORTS, FORMAT.CARD)


def parse_with_fallback(html: str, url: str) -> dict | None:
    """Full extraction for one page; None if deleted / unparseable / bad url.

    Mirrors html.rs:67-142: deleted check → id extraction → detect → format
    parser → fallback chain general→entertainment→sports→card.
    """
    doc = parse_html(html)
    if is_deleted_article(html, doc):
        return None
    ids = extract_ids(url)
    if ids is None:
        return None
    fmt = detect_format(doc)
    first_try = FORMAT.CARD if fmt == FORMAT.UNKNOWN else fmt
    result = _parse_format(doc, first_try)
    if result is None:
        for f in _FALLBACK_ORDER:
            if f == first_try:  # already failed above — identical input,
                continue        # identical None; skip the re-parse
            result = _parse_format(doc, f)
            if result is not None:
                break
    if result is None:
        return None
    result["oid"], result["aid"] = ids
    result["url"] = url
    result["content_hash"] = hashlib.sha256(
        result["content"].encode("utf-8")
    ).hexdigest()
    return result


_EXTRACT_COLUMNS = [
    "doc_id", "url", "oid", "aid", "title", "text", "category",
    "published_at", "publisher", "author", "format", "content_hash",
]


def doc_id_from_ids(oid: str, aid: str) -> int:
    """Dense numeric doc_id from (oid, aid): oid*10^10 + aid fits in int64.

    The packed form only works for aids of ≤10 digits (packed max is
    999*10^10 + 9999999999 < 10^13). The id regexes accept ``\\d{10,}``
    (same as the reference), so an 11+-digit aid would silently collide
    with a different (oid, aid) pair. Those fall back to a deterministic
    64-bit hash of the canonical pair, offset above the packed range so the
    two id spaces can never overlap.
    """
    if len(aid) <= 10:
        return int(oid) * 10_000_000_000 + int(aid)
    return hash_doc_id(oid, aid)


def hash_doc_id(oid: str, aid: str) -> int:
    """The hash-fallback id space (shared with the markdown source so
    the two ingestion paths can never diverge): 10^13 + 49-bit blake2b
    of the canonical pair — within int64, above every packed id."""
    digest = hashlib.blake2b(
        f"{oid}/{aid}".encode("utf-8"), digest_size=8
    ).digest()
    return 10_000_000_000_000 + (
        int.from_bytes(digest, "big") & ((1 << 49) - 1)
    )


def extract_batch(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """Arrow-batch extraction: (html bytes/str, url) → article fields.

    Rows that are deleted articles or fail every parser come back with null
    title/text (callers filter ``text IS NOT NULL``), preserving input row
    count so this can run as a struct-returning pandas UDF.
    """
    out = {c: [] for c in _EXTRACT_COLUMNS}
    for raw, u in zip(html.tolist(), url.tolist()):
        if isinstance(raw, (bytes, bytearray)):
            page = decode_bytes(bytes(raw))
        else:
            page = raw or ""
        # undecodable bytes: the page is unparseable (never mojibake)
        parsed = (parse_with_fallback(page, u or "")
                  if page is not None else None)
        if parsed is None:
            for c in _EXTRACT_COLUMNS:
                out[c].append(None)
            out["url"][-1] = u
            continue
        out["doc_id"].append(doc_id_from_ids(parsed["oid"], parsed["aid"]))
        out["url"].append(u)
        out["oid"].append(parsed["oid"])
        out["aid"].append(parsed["aid"])
        out["title"].append(parsed["title"])
        out["text"].append(parsed["content"])
        out["category"].append(parsed["category"])
        out["published_at"].append(parsed["published_at"])
        out["publisher"].append(parsed["publisher"])
        out["author"].append(parsed["author"])
        out["format"].append(parsed["format"])
        out["content_hash"].append(parsed["content_hash"])
    frame = pd.DataFrame(out)
    frame["doc_id"] = frame["doc_id"].astype("Int64")
    return frame
