"""Fetch stage interface.

The wave runner's default "fetch" is a join against a synthetic web
table (runner.py) — the correct simulation shape for benches. This
module defines the REAL fetch stage a deployment swaps in: a
``mapInPandas`` batch fetcher whose transport is pluggable. The
sandbox has no network, so the HTTP transport is gated; the contract
(batch shape, retry/timeout semantics, politeness pacing inside the
batch) is what the tests pin down.

Reference semantics being reproduced (funda/settings.py):
- UA + client-hint headers (funda_spider.py:62-73)
- DOWNLOAD_TIMEOUT 30 s (settings.py:49)
- retryable HTTP codes {500,502,503,504,522,524,408,429,403}
  (settings.py:31-32) — signalled to the runner via http_status so the
  frontier's retry ledger (attempt+1, drop at 5) does the re-enqueue
- per-batch pacing: a batch destined for one domain sleeps
  crawl_delay/concurrency between requests (T3), which composes with
  the wave-level budget to honor the global rate.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FETCH_RESULT_SCHEMA = (
    "url string, html string, http_status int, fetch_attempt int, elapsed_ms int"
)

DEFAULT_HEADERS = {
    # funda_spider.py:62-73
    "User-Agent": (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"
    ),
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
    "Accept-Language": "nl-NL,nl;q=0.9,en-US;q=0.8,en;q=0.7",
}

RETRYABLE_CODES = frozenset({500, 502, 503, 504, 522, 524, 408, 429, 403})


def http_transport(timeout_s: int = 30) -> Callable[[str], tuple[int, str | None]]:
    """Real transport (requires network — unavailable in this sandbox)."""
    try:
        import urllib.request

        def _fetch(url: str) -> tuple[int, str | None]:
            req = urllib.request.Request(url, headers=DEFAULT_HEADERS)
            try:
                with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                    return resp.status, resp.read().decode("utf-8", "replace")
            except Exception:
                return 599, None

        return _fetch
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("no HTTP stack available") from e


def dict_transport(pages: dict[str, str], fail: dict[str, int] | None = None):
    """Deterministic test transport: url->html map; `fail` maps url ->
    number of initial attempts that return a retryable 503."""
    fail = fail or {}
    attempts: dict[str, int] = {}

    def _fetch(url: str) -> tuple[int, str | None]:
        attempts[url] = attempts.get(url, 0) + 1
        if attempts[url] <= fail.get(url, 0):
            return 503, None
        html = pages.get(url)
        return (200, html) if html is not None else (404, None)

    return _fetch


def fetch_batches(
    frontier_batch: DataFrame,
    transport: Callable[[str], tuple[int, str | None]],
    crawl_delay_s: float = 0.0,
    max_concurrency: int = 2,
) -> DataFrame:
    """mapInPandas fetch: each Arrow batch fetches its URLs with
    politeness pacing (sleep delay/concurrency between requests of the
    same batch — all rows of a batch share the single crawl domain)."""
    import time as _time

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pace = crawl_delay_s / max(max_concurrency, 1)
        for pdf in batches:
            urls = pdf["url"].tolist()
            attempts = (
                pdf["attempt"].tolist() if "attempt" in pdf else [0] * len(urls)
            )
            statuses, htmls, elapsed = [], [], []
            for u in urls:
                t0 = _time.perf_counter()
                code, html = transport(u)
                statuses.append(code)
                htmls.append(html)
                elapsed.append(int((_time.perf_counter() - t0) * 1000))
                if pace > 0:
                    _time.sleep(pace)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "html": htmls,
                    "http_status": statuses,
                    "fetch_attempt": attempts,
                    "elapsed_ms": elapsed,
                }
            )

    return frontier_batch.mapInPandas(_run, schema=FETCH_RESULT_SCHEMA)
