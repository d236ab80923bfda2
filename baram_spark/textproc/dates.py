"""Date parsing — multi-format + Korean AM/PM, KST→UTC.

Re-implements (behavioral spec) the two reference date parsers:

- ``parse_article_date`` mirrors ``/root/reference/src/parser/html.rs:412-442``
  (7 strptime formats + date-only fallback; naive datetimes are taken AS UTC).
- ``parse_date_string`` mirrors ``/root/reference/src/parser/mod.rs:200-297``
  (RFC3339, 오전/오후 12-hour regex, then common formats; naive datetimes are
  taken as KST = UTC+9 and converted to UTC).

Both return timezone-naive ``datetime`` objects representing UTC instants
(Spark TimestampType-friendly), or None.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

_ARTICLE_FORMATS = (
    "%Y.%m.%d. %H:%M",
    "%Y.%m.%d %H:%M",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y년 %m월 %d일 %H:%M",
    "%Y.%m.%d.",
    "%Y.%m.%d",
)

_DATE_ONLY_FORMATS = ("%Y.%m.%d.", "%Y.%m.%d", "%Y-%m-%d")

_COMMON_KST_FORMATS = (
    "%Y-%m-%d %H:%M:%S",
    "%Y.%m.%d %H:%M",
    "%Y.%m.%d. %H:%M",
    "%Y-%m-%d %H:%M",
    "%Y/%m/%d %H:%M:%S",
    "%Y/%m/%d %H:%M",
    "%Y년 %m월 %d일 %H:%M",
)

_KOREAN_AMPM_RE = re.compile(
    r"(\d{4})[.-](\d{1,2})[.-](\d{1,2})[.]?\s*(오전|오후)\s*(\d{1,2}):(\d{2})"
)

# chrono's parse_from_rfc3339 (mod.rs:206) accepts ONLY T/t separators
# and does no trimming — a space-separated offset timestamp or padded
# input is None in the reference (its space formats are the OFFSET-LESS
# KST strptime list below), so this regex must not be looser
_RFC3339_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[Tt](\d{2}):(\d{2}):(\d{2})(?:\.(\d+))?"
    r"(Z|z|[+-]\d{2}:?\d{2})$"
)

KST = timedelta(hours=9)


def _try_strptime(s: str, fmt: str) -> datetime | None:
    try:
        return datetime.strptime(s, fmt)
    except ValueError:
        return None


def parse_article_date(date_str: str) -> datetime | None:
    """Extraction-path date parse (html.rs:412-442): naive treated as UTC."""
    clean = date_str.strip()
    for fmt in _ARTICLE_FORMATS:
        dt = _try_strptime(clean, fmt)
        if dt is not None:
            return dt
    head = clean.split()
    if head:
        for fmt in _DATE_ONLY_FORMATS:
            dt = _try_strptime(head[0], fmt)
            if dt is not None:
                return dt
    return None


def parse_korean_datetime(date_str: str) -> datetime | None:
    """``2024.12.25. 오후 3:45``-style 12-hour KST datetime → UTC."""
    m = _KOREAN_AMPM_RE.search(date_str)
    if not m:
        return None
    year, month, day = int(m.group(1)), int(m.group(2)), int(m.group(3))
    ampm, hour, minute = m.group(4), int(m.group(5)), int(m.group(6))
    if ampm == "오전":
        hour24 = 0 if hour == 12 else hour
    else:
        hour24 = 12 if hour == 12 else hour + 12
    if hour24 > 23 or minute > 59:
        return None
    try:
        naive = datetime(year, month, day, hour24, minute)
    except ValueError:
        return None
    return naive - KST


def parse_date_string(date_str: str) -> datetime | None:
    """Metadata-path date parse (mod.rs:200-240): naive treated as KST."""
    m = _RFC3339_RE.match(date_str)
    if m:
        dt = datetime(
            int(m.group(1)), int(m.group(2)), int(m.group(3)),
            int(m.group(4)), int(m.group(5)), int(m.group(6)),
            int((m.group(7) or "0").ljust(6, "0")[:6]),
        )
        off = m.group(8)
        if off in ("Z", "z"):
            return dt
        sign = 1 if off[0] == "+" else -1
        hh, mm = int(off[1:3]), int(off[-2:])
        return dt - sign * timedelta(hours=hh, minutes=mm)
    kdt = parse_korean_datetime(date_str)
    if kdt is not None:
        return kdt
    for fmt in _COMMON_KST_FORMATS:
        dt = _try_strptime(date_str, fmt)
        if dt is not None:
            return dt - KST
    return None
