"""Comment JSONP source (S12) — parse the comment API's JSONP payloads
into a flat comments DataFrame.

Mirrors ``/root/reference/src/crawler/comment.rs``:

- :func:`parse_jsonp` — the callback-wrapper strip (comment.rs:20-55):
  ``ident( ... );`` → inner JSON, with bare-JSON passthrough.
- :func:`parse_comments` — CommentApiResponse → cleaned comment dicts
  (convert_comment, comment.rs:312-384): ms-timestamps → UTC datetimes,
  ``mod_time`` kept only when later than ``reg_time``, parent id 0 →
  top-level, content cleaned exactly like ``clean_comment_content``
  (strip HTML tags, decode entities, collapse whitespace).
- :func:`comments_df` — the Spark surface: one JSONP payload per row →
  exploded comment rows (Arrow-batched, narrow). The reference's
  comment TREE is presentation-level; ``parent_id`` keeps the structure
  relational (self-join or groupBy to rebuild).
- :func:`comment_stats` — per-object totals (comment/reply/deleted),
  the CommentCount analog.
"""

from __future__ import annotations

import html as _html
import json
import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame, functions as F

_JSONP_RE = re.compile(
    r"^[a-zA-Z_$][a-zA-Z0-9_$]*\s*\(\s*(.*)\s*\)\s*;?\s*$", re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

COMMENT_SCHEMA = (
    "object_id string, comment_id string, parent_id string, "
    "content string, author string, masked_user_id string, "
    "created_at timestamp, modified_at timestamp, likes long, "
    "dislikes long, reply_count long, is_best boolean, is_deleted boolean"
)


def parse_jsonp(payload: str) -> str:
    """Strip the JSONP callback wrapper; bare JSON passes through.
    Raises ValueError on anything else (comment.rs:39-55)."""
    trimmed = payload.strip()
    m = _JSONP_RE.match(trimmed)
    if m:
        return m.group(1)
    if trimmed.startswith("{") or trimmed.startswith("["):
        return trimmed
    raise ValueError("Invalid JSONP format: unable to extract JSON content")


def clean_content(content: str) -> str:
    """clean_comment_content (comment.rs:369-384): tags → entities →
    whitespace collapse → trim."""
    no_tags = _TAG_RE.sub("", content)
    decoded = _html.unescape(no_tags)
    return _WS_RE.sub(" ", decoded).strip()


def _ms_to_dt(ms: int) -> datetime | None:
    if not ms:
        return None
    # tz-AWARE UTC (comment.rs returns DateTime<Utc>): a naive wall time
    # would be reinterpreted in the Spark session timezone at Arrow
    # conversion, shifting the stored instant on non-UTC sessions
    return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)


def parse_comments(payload: str, object_id: str | None = None) -> list[dict]:
    """One JSONP (or bare JSON) comment-API payload → cleaned comment
    dicts. Unsuccessful responses yield no rows (the fetcher's retry
    tier handles those upstream)."""
    data = json.loads(parse_jsonp(payload))
    if not data.get("success") or not data.get("result"):
        return []
    out = []
    for raw in data["result"].get("commentList", []) or []:
        reg = int(raw.get("regTime", 0) or 0)
        mod = int(raw.get("modTime", 0) or 0)
        parent = int(raw.get("parentCommentNo", 0) or 0)
        out.append({
            "object_id": object_id or raw.get("objectId") or "",
            "comment_id": str(raw.get("commentNo", 0) or 0),
            "parent_id": str(parent) if parent > 0 else None,
            "content": clean_content(raw.get("contents", "") or ""),
            "author": raw.get("userName", "") or "",
            "masked_user_id": raw.get("maskedUserId", "") or "",
            "created_at": _ms_to_dt(reg),
            "modified_at": (
                _ms_to_dt(mod) if mod > 0 and mod != reg else None
            ),
            "likes": int(raw.get("sympathyCount", 0) or 0),
            "dislikes": int(raw.get("antipathyCount", 0) or 0),
            "reply_count": int(raw.get("replyCount", 0) or 0),
            "is_best": bool(raw.get("best", False)),
            # comment.rs: is_deleted = deleted || !visible — a hidden
            # (moderated) comment counts as deleted content
            "is_deleted": bool(raw.get("deleted", False))
            or not bool(raw.get("visible", True)),
        })
    return out


def comments_df(df: DataFrame, payload_col: str = "payload",
                object_col: str | None = "object_id") -> DataFrame:
    """(object_id, jsonp payload) rows → exploded comment rows.
    Arrow-batched and narrow; malformed payloads yield zero rows for
    that object instead of failing the task."""
    import pandas as pd

    cols = [c.split(" ")[0] for c in COMMENT_SCHEMA.split(", ")]
    sel = [payload_col] + ([object_col] if object_col else [])

    def run(iterator):
        for pdf in iterator:
            rows = []
            oids = pdf[object_col] if object_col else [None] * len(pdf)
            for payload, oid in zip(pdf[payload_col], oids):
                try:
                    for c in parse_comments(payload or "", oid):
                        rows.append([c[k] for k in cols])
                except Exception:
                    # the no-fail-the-task contract covers EVERY malformed
                    # shape, not just bad JSON — valid JSON with an
                    # unexpected structure raises AttributeError/TypeError
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return df.select(*sel).mapInPandas(run, schema=COMMENT_SCHEMA)


def comment_stats(comments: DataFrame) -> DataFrame:
    """Per-object totals (the CommentCount analog): one shuffle on
    object_id with map-side partial aggregation."""
    return (
        comments.groupBy("object_id")
        .agg(
            F.count(F.when(F.col("parent_id").isNull(), 1))
            .alias("n_comments"),
            F.count(F.when(F.col("parent_id").isNotNull(), 1))
            .alias("n_replies"),
            F.count(F.when(F.col("is_deleted"), 1)).alias("n_deleted"),
        )
    )
