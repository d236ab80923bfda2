"""Markdown article source/sink (S7/S8) — the migration path for a
reference user's EXISTING markdown corpus.

The reference crawler writes one markdown file per article through a
handlebars template (``/root/reference/templates/article.hbs``,
``src/storage/markdown.rs:25-140``) and its indexer re-parses those files
into IndexDocuments (``src/commands/index.rs:402-520``). This module
mirrors BOTH directions:

- :func:`parse_markdown` reproduces the reference parser's exact
  semantics: title = first ``# `` heading (frontmatter title is quoted
  display metadata), frontmatter = the first two ``---`` delimiters with
  ``key: value`` pairs (values stripped of quotes), oid/aid fall back to
  the ``<oid>_<aid>`` filename stem, ``published_at`` normalized to ISO
  8601 the same way (space→``T`` + ``:00Z``), and the body keeps every
  non-empty non-frontmatter line — including headings and separators —
  exactly as the reference does.
- :func:`render_markdown` emits the default article template
  byte-compatibly, so render → parse round-trips.
- :func:`read_markdown_dir` / :func:`markdown_docs` are the Spark
  surface: whole-file text scan → Arrow-batched parse into the pages/docs
  column shape (narrow, shuffle-free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: output columns of the Spark parse (superset of IndexDocument's
#: metadata; content is the reference's joined body)
DOC_SCHEMA = (
    "path string, doc_id long, id string, oid string, aid string, "
    "title string, content string, category string, publisher string, "
    "author string, url string, published_at string, content_hash string"
)


def _doc_id(oid: str, aid: str) -> int:
    """EXACTLY the extractor's doc_id (textproc/extract.py:362-380) so
    the markdown and HTML ingestion paths agree on ids: packed
    oid*10^10+aid for ≤10-digit numeric pairs, else a 10^13-offset hash
    of the canonical pair (a space the packed ids can never reach).
    Non-numeric stems (no frontmatter ids, odd filenames) take the same
    hash fallback — distinct per (oid, aid), never colliding with
    packed ids."""
    from ..textproc.extract import doc_id_from_ids, hash_doc_id

    try:
        return doc_id_from_ids(oid, aid)
    except ValueError:
        return hash_doc_id(oid, aid)

_META_KEYS = {"oid", "aid", "category", "publisher", "author", "url",
              "content_hash"}


def _iso_date(dt: str | None) -> str | None:
    """The reference's published_at normalization (index.rs:483-503):
    skip empty / non-digit-leading values; pass through ISO; otherwise
    ``YYYY-MM-DD HH:MM`` → ``YYYY-MM-DDTHH:MM:00Z``."""
    if dt is None:
        return None
    dt = dt.strip()
    if not dt or not dt[0].isdigit():
        return None
    if "T" in dt:
        return dt
    return dt.replace(" ", "T") + ":00Z"


def parse_markdown(text: str, filename: str | None = None) -> dict:
    """One markdown article → IndexDocument-shaped dict
    (index.rs:402-520 semantics, mirrored exactly)."""
    lines = text.splitlines()
    def _strip_heading(ln: str) -> str:
        # index.rs:414 trim_start_matches("# "): strips the prefix
        # REPEATEDLY, never touches trailing whitespace
        while ln.startswith("# "):
            ln = ln[2:]
        return ln

    title = next(
        (_strip_heading(ln) for ln in lines if ln.startswith("# ")),
        "Untitled",
    )
    meta: dict[str, str] = {}
    published_at: str | None = None
    delims = 0
    in_meta = False
    body: list[str] = []
    for ln in lines:
        if ln.startswith("---") and delims < 2:
            delims += 1
            in_meta = delims == 1
            continue
        if in_meta:
            if ":" in ln:
                key, value = ln.split(":", 1)
                key = key.strip()
                value = value.strip().strip('"')
                if key in _META_KEYS:
                    meta[key] = value
                elif key in ("published_at", "date"):
                    published_at = value
        elif ln:  # non-empty body line (headings/separators included,
            body.append(ln)  # exactly like the reference parser)
    oid, aid = meta.get("oid", ""), meta.get("aid", "")
    if not oid or not aid:
        stem = os.path.splitext(os.path.basename(filename or "unknown"))[0]
        if "_" in stem:
            oid, aid = stem.split("_", 1)
        else:
            oid, aid = "000", stem
    return {
        "doc_id": _doc_id(oid, aid),
        "id": f"{oid}_{aid}",
        "oid": oid,
        "aid": aid,
        "title": title,
        "content": "\n".join(body),
        "category": meta.get("category", ""),
        "publisher": meta.get("publisher") or None,
        "author": meta.get("author") or None,
        "url": meta.get("url", ""),
        "published_at": _iso_date(published_at),
        "content_hash": meta.get("content_hash") or None,
    }


def render_markdown(doc: dict) -> str:
    """The default article template (templates/article.hbs), rendered
    byte-compatibly: render → :func:`parse_markdown` round-trips."""
    from datetime import datetime as _dt

    def fmt(k, v):
        if v is None:
            return ""
        if isinstance(v, _dt):  # the reference template's date formats
            return v.strftime(
                "%Y-%m-%d %H:%M" if k == "published_at"
                else "%Y-%m-%d %H:%M:%S"
            )
        return str(v)

    d = {k: fmt(k, doc.get(k))
         for k in ("id", "title", "content", "category", "publisher",
                   "author", "published_at", "crawled_at", "url", "oid",
                   "aid", "content_hash")}
    return (
        "---\n"
        f"id: {d['id']}\n"
        f"title: \"{d['title']}\"\n"
        f"category: {d['category']}\n"
        f"publisher: {d['publisher']}\n"
        f"author: {d['author']}\n"
        f"published_at: {d['published_at']}\n"
        f"crawled_at: {d['crawled_at']}\n"
        f"url: {d['url']}\n"
        f"oid: {d['oid']}\n"
        f"aid: {d['aid']}\n"
        f"content_hash: {d['content_hash']}\n"
        "---\n\n"
        f"# {d['title']}\n\n"
        f"**{d['publisher']}** | {d['published_at']} | {d['category']}\n\n"
        "---\n\n"
        f"{d['content']}\n\n"
        "---\n\n"
        f"*Crawled at: {d['crawled_at']}*\n"
        f"*Source: [원문 보기]({d['url']})*\n"
    )


def markdown_docs(df: DataFrame, content_col: str = "value",
                  path_col: str = "path") -> DataFrame:
    """(path, whole-file text) rows → parsed document rows. Arrow-batched
    and narrow: the parse runs where the file rows already live."""
    import pandas as pd

    cols = [c.split(" ")[0] for c in DOC_SCHEMA.split(", ")]

    def run(iterator):
        for pdf in iterator:
            rows = []
            for path, text in zip(pdf[path_col], pdf[content_col]):
                parsed = parse_markdown(text or "", filename=path)
                parsed["path"] = path
                rows.append([parsed.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return df.select(path_col, content_col).mapInPandas(
        run, schema=DOC_SCHEMA
    )


def to_index_docs(parsed: DataFrame, lang: str | None = None) -> DataFrame:
    """Parsed markdown rows → the docs-table shape accepted by
    ``IndexBuilder.build_docs``. The doc_id was computed in the parse
    with the extractor's own id scheme (see :func:`_doc_id`), so the
    markdown and HTML paths agree; files without a frontmatter
    content_hash get sha256(text) like every other ingestion path."""
    return (
        parsed
        .withColumn("text", F.col("content"))
        .withColumn("format", F.lit("markdown"))
        .withColumn("lang", F.lit(lang).cast("string"))
        .withColumn("content_hash",
                    F.coalesce("content_hash", F.sha2(F.col("text"), 256)))
        .select("doc_id", "url", "oid", "aid", "title", "text", "category",
                "published_at", "publisher", "author", "format",
                "content_hash", "lang")
    )


def read_markdown_dir(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file scan of a markdown corpus directory → parsed documents.
    At scale the text source splits across executors per file; the parse
    is a narrow map."""
    files = (
        spark.read.text(f"{path.rstrip('/')}/*.md", wholetext=True)
        .withColumn("path", F.input_file_name())
    )
    return markdown_docs(files)
