"""Distributed HTTP page fetcher (S1) — the crawl tier.

Mirrors the reference fetcher's behavior (``/root/reference/src/crawler/
fetcher.rs``): rate limiting, retry with exponential backoff on
{429, 500, 502, 503, 504} (non-retryable statuses fail immediately),
User-Agent rotation with a referer header, and raw-byte bodies so the
extraction stage's charset chain (UTF-8 → EUC-KR → meta sniff) applies
unchanged downstream.

Spark shape: ``mapInPandas`` over a urls DataFrame — every partition is
an independent polite client, so ``requests_per_second`` is a
PER-PARTITION budget. For per-host politeness at scale, pass
``partition_by_host=True``: urls repartition by host first, so exactly
one task owns each host's rate window (the reference runs one fetcher
process per crawl instance; this is the multi-executor analog). The
output is the pages-table shape (url, warc_ts, html, ...) plus
status/attempts/error columns, so failures are DATA (retryable by a
later wave via the url anti-join) rather than task failures.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, functions as F

#: reference UA pool shape (fetcher.rs:28-43) — generic public strings
USER_AGENTS = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/119.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0 Safari/537.36",
)

RETRYABLE = {429, 500, 502, 503, 504}

FETCH_SCHEMA = (
    "url string, warc_ts timestamp, html binary, status int, "
    "attempts int, error string"
)


def fetch_url(url: str, timeout: float = 10.0, max_retries: int = 3,
              base_delay_ms: int = 1000, referer: str | None = None,
              ua_index: int = 0) -> tuple[bytes | None, int, int, str | None]:
    """One url with the reference's retry policy. Returns
    (body_bytes|None, last_status, attempts, error|None)."""
    import urllib.error
    import urllib.request

    last_status, error = 0, None
    for attempt in range(max_retries + 1):
        if attempt > 0:
            time.sleep(base_delay_ms * (2 ** (attempt - 1)) / 1000.0)
        req = urllib.request.Request(url, headers={
            "User-Agent": USER_AGENTS[(ua_index + attempt)
                                      % len(USER_AGENTS)],
            "Referer": referer or "https://news.naver.com",
            "Accept": "text/html,application/xhtml+xml,*/*",
        })
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.read(), resp.status, attempt + 1, None
        except urllib.error.HTTPError as e:
            last_status, error = e.code, f"HTTP {e.code}"
            if e.code not in RETRYABLE:
                return None, e.code, attempt + 1, error
        except urllib.error.URLError as e:
            # urllib reports malformed urls through URLError too (reason
            # is a bare string like "unknown url type: htp"); those can
            # never succeed — fail fast instead of burning backoff.
            # DNS/connection failures stay retryable.
            error = f"{type(e).__name__}: {e}"
            reason = getattr(e, "reason", None)
            if isinstance(reason, ValueError) or (
                isinstance(reason, str)
                and ("unknown url type" in reason or "no host" in reason)
            ):
                return None, 0, attempt + 1, error
        except (ValueError, TypeError) as e:
            # malformed url raised directly (bad Request construction)
            return None, 0, attempt + 1, f"{type(e).__name__}: {e}"
        except Exception as e:  # timeouts, connection errors: retryable
            error = f"{type(e).__name__}: {e}"
    return None, last_status, max_retries + 1, error or "max retries"


def fetch_pages(urls: DataFrame, url_col: str = "url",
                requests_per_second: float = 2.0, timeout: float = 10.0,
                max_retries: int = 3, base_delay_ms: int = 1000,
                partition_by_host: bool = False,
                num_partitions: int | None = None) -> DataFrame:
    """urls → pages-table rows with raw html bytes. Narrow unless
    ``partition_by_host`` (one shuffle keyed on host, then narrow)."""
    import pandas as pd

    src = urls.select(F.col(url_col).alias("url"))
    if partition_by_host:
        src = (
            src.withColumn("_host", F.parse_url("url", F.lit("HOST")))
            .repartition(*(
                [num_partitions] if num_partitions else []
            ), "_host")
            .drop("_host")
        )

    interval = 1.0 / requests_per_second if requests_per_second > 0 else 0.0

    def run(iterator):
        next_ok = 0.0  # per-task politeness window
        i = 0
        for pdf in iterator:
            rows = []
            for url in pdf["url"]:
                now = time.monotonic()
                if now < next_ok:
                    time.sleep(next_ok - now)
                next_ok = time.monotonic() + interval
                body, status, attempts, err = fetch_url(
                    url, timeout=timeout, max_retries=max_retries,
                    base_delay_ms=base_delay_ms, ua_index=i,
                )
                i += 1
                rows.append((
                    url,
                    # tz-AWARE so Arrow stores the true instant whatever
                    # the Spark session timezone is (a naive value would
                    # be reinterpreted in session-local time)
                    datetime.now(timezone.utc),
                    bytearray(body) if body is not None else None,
                    status, attempts, err,
                ))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "status",
                               "attempts", "error"],
            )

    return src.mapInPandas(run, schema=FETCH_SCHEMA)
