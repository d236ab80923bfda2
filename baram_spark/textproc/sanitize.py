"""Text sanitization chain — the byte-identical core invariant.

Re-implements (as a behavioral spec, from scratch in Python) the reference
cleaning pipeline at ``/root/reference/src/parser/sanitize.rs:39-50`` with
steps at ``74-200``:

    sanitize_text = trim
                  . collapse_newlines      (\\n{3,} -> \\n\\n)
                  . trim_lines             (per-line strip)
                  . normalize_whitespace   ([ \\t]+ -> ' ')
                  . decode_html_entities   (+ NBSP -> ' ')
                  . remove_control_chars   (keep \\n, \\t)
                  . remove_zero_width

Every function is pure and defined on single strings; ``sanitize_series``
applies the chain to a pandas Series with vectorized ``.str`` ops wherever
the semantics allow (used inside Arrow-batched pandas UDFs — no per-row
Python in the Spark hot path except the entity decode, which is a
C-implemented stdlib call).
"""

from __future__ import annotations

import html as _htmllib
import re
import sys
import unicodedata

import pandas as pd

# ​-‏ zero-widths + direction marks,  -  separators +
# formatting chars, ﻿ BOM (reference: sanitize.rs:74-88).
_ZERO_WIDTH_RE = re.compile("[\u200b-\u200f\u2028-\u202f\ufeff]")

# Control characters per Unicode category Cc/Cf EXCEPT \n and \t.
# Rust's char::is_control() == categories Cc only (C0, C1, DEL); mirror that.
_CONTROL_CHARS = "".join(
    chr(c)
    for c in list(range(0x00, 0x20)) + [0x7F] + list(range(0x80, 0xA0))
    if chr(c) not in ("\n", "\t")
)
_CONTROL_RE = re.compile("[" + re.escape(_CONTROL_CHARS) + "]")

_WHITESPACE_RE = re.compile(r"[ \t]+")
_MULTI_NEWLINE_RE = re.compile(r"\n{3,}")
_TAG_RE = re.compile(r"<[^>]+>")
# Reporter byline patterns (sanitize.rs:17-18); NOT part of sanitize_text.
_BYLINE_RE = re.compile(r"(?m)(^.*기자\s*=.*$|.*기자$|\S+@\S+\.\S+)")


def remove_zero_width(text: str) -> str:
    """Strip zero-width / bidi-mark / separator formatting characters."""
    return _ZERO_WIDTH_RE.sub("", text)


def remove_control_chars(text: str) -> str:
    """Strip Cc control characters except newline and tab."""
    return _CONTROL_RE.sub("", text)


def decode_html_entities(text: str) -> str:
    """Decode named + numeric HTML entities; NBSP becomes a regular space."""
    return _htmllib.unescape(text).replace("\xa0", " ")


def normalize_whitespace(text: str) -> str:
    """Collapse runs of spaces/tabs to one space (newlines untouched)."""
    return _WHITESPACE_RE.sub(" ", text)


def trim_lines(text: str) -> str:
    """Strip each line, preserving line structure.

    Mirrors Rust ``str::lines()`` + ``join("\\n")`` EXACTLY: lines split
    at ``\\n`` (an immediately preceding ``\\r`` is stripped), a trailing
    newline is dropped — and NOTHING else splits. Python ``splitlines()``
    would also split on ``\\x0b``/``\\x0c``/``\\u2028``/``\\u2029``,
    which entity decoding can re-introduce after the control-char pass,
    breaking the per-row byte-identical invariant vs the reference.
    """
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()  # str::lines() drops the final empty segment
    return "\n".join(
        line[:-1].strip() if line.endswith("\r") else line.strip()
        for line in lines
    )


def collapse_newlines(text: str) -> str:
    """Replace 3+ consecutive newlines with exactly two."""
    return _MULTI_NEWLINE_RE.sub("\n\n", text)


def sanitize_text(text: str) -> str:
    """Full cleaning chain; the per-row byte-identical invariant."""
    result = remove_zero_width(text)
    result = remove_control_chars(result)
    result = decode_html_entities(result)
    result = normalize_whitespace(result)
    result = trim_lines(result)
    result = collapse_newlines(result)
    return result.strip()


def strip_html_tags(html: str) -> str:
    """Remove all ``<...>`` tags (regex semantics, not DOM)."""
    return _TAG_RE.sub("", html)


def has_content(text: str | None) -> bool:
    """True iff text has non-whitespace content."""
    return bool(text) and bool(text.strip())


def truncate(text: str, max_len: int) -> str:
    """Char-safe truncation with ``...`` suffix (sanitize.rs:232-239)."""
    if len(text) <= max_len:
        return text
    return text[: max(max_len - 3, 0)] + "..."


def remove_byline(text: str) -> str:
    """Strip reporter bylines / email addresses (optional op, off by default)."""
    return _BYLINE_RE.sub("", text).strip()


# ---------------------------------------------------------------------------
# Vectorized (pandas Series) variants for Arrow-batched UDFs.
# ---------------------------------------------------------------------------

def sanitize_series(s: pd.Series) -> pd.Series:
    """Apply ``sanitize_text`` to a string Series with vectorized steps.

    The regex substitutions run as pandas ``.str.replace`` (C loop); only the
    entity decode maps the stdlib C ``html.unescape`` per element.
    """
    s = s.fillna("")
    s = s.str.replace(_ZERO_WIDTH_RE, "", regex=True)
    s = s.str.replace(_CONTROL_RE, "", regex=True)
    s = s.map(_htmllib.unescape).str.replace("\xa0", " ", regex=False)
    s = s.str.replace(_WHITESPACE_RE, " ", regex=True)
    # trim_lines: strip around every line break, then strip ends.
    s = s.map(trim_lines)
    s = s.str.replace(_MULTI_NEWLINE_RE, "\n\n", regex=True)
    return s.str.strip()
