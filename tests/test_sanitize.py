"""Golden tests for the sanitize chain — mirrors the reference's behavior
tests at /root/reference/src/parser/sanitize.rs:262-458 (re-derived
expectations, not copied code)."""

import pandas as pd

from baram_spark.textproc import sanitize as s


def test_remove_zero_width():
    assert s.remove_zero_width("가​나﻿다") == "가나다"
    assert s.remove_zero_width("a‌‍‎‏b") == "ab"
    assert s.remove_zero_width("x\u2028y\u2029z") == "xyz"


def test_remove_control_chars_keeps_newline_tab():
    assert s.remove_control_chars("He\x00llo\x07\nWor\tld\x7f") == "Hello\nWor\tld"


def test_decode_entities_and_nbsp():
    assert s.decode_html_entities("&lt;div&gt;A &amp; B&lt;/div&gt;") == "<div>A & B</div>"
    assert s.decode_html_entities("&#x27;q&#x27; &#x3D; w") == "'q' = w"
    assert s.decode_html_entities("a&nbsp;b") == "a b"


def test_normalize_whitespace():
    assert s.normalize_whitespace("Hello    World\t\tX") == "Hello World X"
    assert s.normalize_whitespace("a \t b\nc  d") == "a b\nc d"


def test_trim_lines():
    assert s.trim_lines("  Line 1  \n  Line 2  ") == "Line 1\nLine 2"


def test_collapse_newlines():
    assert s.collapse_newlines("P1\n\n\n\n\nP2") == "P1\n\nP2"
    assert s.collapse_newlines("P1\n\nP2") == "P1\n\nP2"


def test_full_chain():
    dirty = "Hello​World  \n\n\n\nTest &amp; more\xa0x\x07"
    assert s.sanitize_text(dirty) == "HelloWorld\n\nTest & more x"


def test_full_chain_single_decode():
    # the chain decodes entities exactly once; the second decode in the
    # extraction path comes from the DOM parser, not from sanitize itself
    assert s.sanitize_text("&amp;amp;") == "&amp;"


def test_strip_html_tags():
    assert s.strip_html_tags("<p>Hello <b>W</b></p>") == "Hello W"


def test_truncate():
    assert s.truncate("Hello World", 5) == "He..."
    assert s.truncate("Hello", 20) == "Hello"


def test_remove_byline():
    assert "기자" not in s.remove_byline("기사 내용입니다.\n홍길동 기자")
    assert "a@b.co" not in s.remove_byline("text a@b.co more")


def test_series_matches_scalar():
    rows = [
        "Hello​World  \n\n\n\nTest &amp; more\xa0x\x07",
        "  Line 1  \n  Line 2  ",
        "가​나﻿다 &nbsp; x",
        "",
        "P1\n\n\n\nP2\t\tend",
    ]
    out = s.sanitize_series(pd.Series(rows)).tolist()
    assert out == [s.sanitize_text(r) for r in rows]


def test_trim_lines_mirrors_rust_lines_exactly():
    """Rust str::lines() splits ONLY on \\n (stripping a preceding \\r);
    Python splitlines() would also split on \\x0b/\\x0c/\\u2028/\\u2029,
    which entity decoding can re-introduce after the control-char pass."""
    from baram_spark.textproc.sanitize import trim_lines

    assert trim_lines("a\x0bb") == "a\x0bb"
    assert trim_lines("a b") == "a b"
    assert trim_lines(" a \r\n b \n") == "a\nb"
    assert trim_lines("x\ny\n") == "x\ny"
