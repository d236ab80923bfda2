"""URL extraction / normalization / dedup (S3-S5).

Re-implements ``/root/reference/src/crawler/url.rs``:

- href harvesting with ``href=["']([^"']+)["']`` (url.rs:71)
- id extraction ``/(?:mnews/)?article/(\\d{3})/(\\d{10,})`` and the legacy
  ``oid=(\\d{3})&aid=(\\d{10,})`` query format (url.rs:36-38)
- normalization to ``https://n.news.naver.com/mnews/article/{oid}/{aid}``
  (url.rs:116-124)
- HashSet dedupe + sort for deterministic output (url.rs:67-91)

Exposed both as pure functions and as DataFrame operators
(``regexp_extract_all`` + ``distinct`` + ``orderBy`` — all JVM-side).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

HREF_RE = re.compile(r"""href=["']([^"']+)["']""")
ARTICLE_RE = re.compile(r"/(?:mnews/)?article/(\d{3})/(\d{10,})")
OLD_FORMAT_RE = re.compile(r"oid=(\d{3})&aid=(\d{10,})")

CANONICAL = "https://n.news.naver.com/mnews/article/{oid}/{aid}"


def extract_ids(url: str) -> tuple[str, str] | None:
    m = ARTICLE_RE.search(url) or OLD_FORMAT_RE.search(url)
    return (m.group(1), m.group(2)) if m else None


def normalize_url(url: str) -> str | None:
    ids = extract_ids(url)
    return CANONICAL.format(oid=ids[0], aid=ids[1]) if ids else None


def extract_urls(html: str) -> list[str]:
    """All normalized article urls in a list page, deduped + sorted."""
    urls = set()
    for m in HREF_RE.finditer(html):
        normalized = normalize_url(m.group(1))
        if normalized:
            urls.add(normalized)
    return sorted(urls)


def extract_urls_df(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Distributed variant: page html → one row per normalized article url
    (regexp_extract_all → explode → normalize → distinct → sort)."""
    hrefs = F.expr(
        f"regexp_extract_all(cast({html_col} as string), 'href=[\"\\']([^\"\\']+)[\"\\']', 1)"
    )
    exploded = pages.select(F.explode(hrefs).alias("href"))
    oid = F.regexp_extract("href", r"/(?:mnews/)?article/(\d{3})/(\d{10,})", 1)
    aid = F.regexp_extract("href", r"/(?:mnews/)?article/(\d{3})/(\d{10,})", 2)
    oid2 = F.regexp_extract("href", r"oid=(\d{3})&aid=(\d{10,})", 1)
    aid2 = F.regexp_extract("href", r"oid=(\d{3})&aid=(\d{10,})", 2)
    return (
        exploded.select(
            F.when(oid != "", oid).otherwise(oid2).alias("oid"),
            F.when(aid != "", aid).otherwise(aid2).alias("aid"),
        )
        .filter((F.col("oid") != "") & (F.col("aid") != ""))
        .select(
            F.concat(
                F.lit("https://n.news.naver.com/mnews/article/"),
                F.col("oid"), F.lit("/"), F.col("aid"),
            ).alias("url")
        )
        .distinct()
        .orderBy("url")
    )
