"""Date parsing incl. 오전/오후 noon/midnight edge cases and KST→UTC
(mirrors /root/reference/src/parser/mod.rs:317-449 expectations)."""

from datetime import datetime

from baram_spark.textproc.dates import (
    parse_article_date,
    parse_date_string,
    parse_korean_datetime,
)


def test_article_formats_naive_utc():
    assert parse_article_date("2024.12.15. 14:30") == datetime(2024, 12, 15, 14, 30)
    assert parse_article_date("2024.12.15 14:30") == datetime(2024, 12, 15, 14, 30)
    assert parse_article_date("2024-12-15 14:30:00") == datetime(2024, 12, 15, 14, 30)
    assert parse_article_date("2024년 12월 15일 14:30") == datetime(2024, 12, 15, 14, 30)
    assert parse_article_date("2024.12.15.") == datetime(2024, 12, 15)
    assert parse_article_date("  2024.12.15. 14:30  ") == datetime(2024, 12, 15, 14, 30)


def test_article_date_only_fallback():
    assert parse_article_date("2024.12.15 오후") == datetime(2024, 12, 15)
    assert parse_article_date("gibberish") is None


def test_korean_ampm():
    # 오후 3:45 KST = 06:45 UTC
    assert parse_korean_datetime("2024.12.25. 오후 3:45") == datetime(2024, 12, 25, 6, 45)
    # 오전 9:00 KST = 00:00 UTC
    assert parse_korean_datetime("2024-12-25 오전 9:00") == datetime(2024, 12, 25, 0, 0)


def test_korean_noon_midnight():
    # 오전 12:00 = midnight KST = 15:00 UTC previous day
    assert parse_korean_datetime("2024.12.25. 오전 12:00") == datetime(2024, 12, 24, 15, 0)
    # 오후 12:30 = 12:30 KST = 03:30 UTC
    assert parse_korean_datetime("2024.12.25. 오후 12:30") == datetime(2024, 12, 25, 3, 30)


def test_rfc3339():
    assert parse_date_string("2024-12-25T15:45:00Z") == datetime(2024, 12, 25, 15, 45)
    assert parse_date_string("2024-12-25T15:45:00+09:00") == datetime(2024, 12, 25, 6, 45)


def test_common_formats_kst_to_utc():
    assert parse_date_string("2024-12-25 15:45:00") == datetime(2024, 12, 25, 6, 45)
    assert parse_date_string("2024/12/25 15:45") == datetime(2024, 12, 25, 6, 45)


def test_invalid():
    assert parse_date_string("not a date") is None
    assert parse_korean_datetime("2024.13.45. 오후 3:45") is None
