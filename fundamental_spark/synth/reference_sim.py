"""Pure-Python simulation of the reference spider's crawl semantics.

This is the oracle for the crawl-equivalence tests (SURVEY.md §5.3):
it reimplements, single-threaded and sequentially, exactly what
``funda_spider.py`` does —

- seen-set: in-run set ∪ DB-backed existing set (funda_spider.py:35,46,119-120)
- JSON-LD ItemList URL extraction in on-page order (funda_spider.py:96-107)
- path filter '/detail/koop/' (funda_spider.py:104)
- stop rules: 3 consecutive empty pages (:39-40,127-135); 3 consecutive
  pages without new listings for the active spider vs 1 for the sold
  spider (:41-42,138-145; funda_spider_sold.py:139-141); max_pages (:32,159)
- sequential pagination: next page requested only while parsing the
  current page (:159-186)
- detail pages parsed into interleaved span sequences.

The span parser here is deliberately an *independent implementation*
(stdlib HTMLParser event stream) from the engine's vectorized regex
parser, so span-sequence equality is a real check.

Canonical crawl-order key (SURVEY.md §3.1): the reference iterates new
listing URLs as a Python set (funda_spider.py:149) so intra-page order
is hash-salted; the deterministic contract is
(discovered_on_page, priority, position_on_page) with priorities
seed/search=0|3, detail=1. The simulator emits its log in that order.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from html.parser import HTMLParser

from .site import BLOCK_MARKER, SyntheticSite

PRIORITY_SEED = 0
PRIORITY_DETAIL = 1
PRIORITY_REFRESH = 2
PRIORITY_PAGINATION = 3


# ---------------------------------------------------------------------------
# Independent span parser (HTMLParser event stream)
# ---------------------------------------------------------------------------
class _SpanParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.spans: list[tuple[str, str | None, str | None]] = []
        self._capture: str | None = None
        self._buf: list[str] = []
        self._dt_label: str | None = None

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "script" and a.get("type") == "application/ld+json":
            self._capture = "script"
            self._buf = []
        elif tag in ("h1", "p", "dt", "dd"):
            self._capture = tag
            self._buf = []
        elif tag == "img" and a.get("src"):
            self.spans.append(("media", None, a["src"]))

    def handle_data(self, data):
        if self._capture:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if self._capture is None:
            return
        text = "".join(self._buf).strip()
        if tag == "script" and self._capture == "script":
            self.spans.append(("text", text, None))
        elif tag in ("h1", "p") and self._capture == tag:
            self.spans.append(("text", text, None))
        elif tag == "dt" and self._capture == "dt":
            self._dt_label = text
        elif tag == "dd" and self._capture == "dd":
            label = self._dt_label or ""
            self.spans.append(("text", f"{label}: {text}", None))
            self._dt_label = None
        self._capture = None
        self._buf = []


def parse_spans(html: str) -> list[tuple[str, str | None, str | None, int]]:
    p = _SpanParser()
    p.feed(html)
    return [(k, t, m, i) for i, (k, t, m) in enumerate(p.spans)]


# ---------------------------------------------------------------------------
# Search-page extraction (JSON-LD order, as funda_spider.py:96-107)
# ---------------------------------------------------------------------------
class _SearchParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.jsonld: str | None = None
        self.next_page: str | None = None
        self.css_hrefs: list[str] = []
        self._in_ld = False
        self._buf: list[str] = []
        self._css_div = False

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "script" and a.get("type") == "application/ld+json":
            self._in_ld = True
            self._buf = []
        elif tag == "a" and a.get("data-test-id") == "next-page-button":
            self.next_page = a.get("href")
        elif tag == "div" and (
            a.get("data-test-id") == "search-result-item"
            or a.get("class") == "search-result__header-title-col"
        ):
            # the two CSS selector shapes the reference reads
            # (funda_spider.py:109-111)
            self._css_div = True
        elif tag == "a" and self._css_div and a.get("href"):
            self.css_hrefs.append(a["href"])
            self._css_div = False

    def handle_data(self, data):
        if self._in_ld:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if tag == "script" and self._in_ld:
            self.jsonld = "".join(self._buf)
            self._in_ld = False
        elif tag == "div":
            self._css_div = False


def extract_search(
    html: str, page_url: str = "", path_filter: str = "/detail/koop/"
) -> tuple[list[str], str | None]:
    """JSON-LD URLs ALWAYS unioned with the CSS hrefs (urljoin'd), as the
    reference does (funda_spider.py:94-119); deterministic order is
    JSON-LD document order first, then CSS-only hrefs in document order."""
    from urllib.parse import urljoin

    p = _SearchParser()
    p.feed(html)
    urls: list[str] = []
    if p.jsonld:
        data = json.loads(p.jsonld)
        for item in data.get("itemListElement", []):
            u = item.get("url")
            if u and path_filter in u and u not in urls:
                urls.append(u)
    for href in p.css_hrefs:
        u = urljoin(page_url, href) if page_url else href
        if path_filter in u and u not in urls:
            urls.append(u)
    return urls, p.next_page


# ---------------------------------------------------------------------------
# The crawl simulation
# ---------------------------------------------------------------------------
@dataclass
class SimResult:
    # canonical-order crawl log: (url, kind, discovered_on_page, priority, pos, city)
    crawl_log: list[tuple[str, str, int, int, int, str]]
    seen_urls: set[str]
    spans_by_doc: dict[str, list[tuple[str, str | None, str | None, int]]]
    pages_visited_by_city: dict[str, int]


def simulate_crawl(
    site: SyntheticSite,
    spider_type: str = "active",
    existing_urls: set[str] | None = None,
    max_pages: int = 100,
) -> SimResult:
    existing = set(existing_urls or set())
    no_new_threshold = 3 if spider_type == "active" else 1  # the asymmetry
    empty_threshold = 3
    log: list[tuple[str, str, int, int, int, str]] = []
    seen: set[str] = set()
    spans: dict[str, list] = {}
    pages_by_city: dict[str, int] = {}

    for city in site.cities:
        processed: set[str] = set()  # per-run set, reference resets per spider run
        consecutive_empty = 0
        consecutive_no_new = 0
        page = 1
        url = site.search_url(city, 1)
        while True:
            html = site.fetch(url)
            if html is None:
                # manual/next page past the end of the site: a 404 the
                # reference's Scrapy stack drops without retry
                break
            pages_by_city[city] = page
            log.append(
                (url, "search", max(page - 1, 0),
                 PRIORITY_SEED if page == 1 else PRIORITY_PAGINATION, 0, city)
            )
            urls, next_page = extract_search(html, page_url=url)
            if not urls:
                consecutive_empty += 1
                if spider_type == "active":
                    # the active spider's no-new check also fires on empty
                    # pages (funda_spider.py:139-145 falls through); the
                    # sold spider's fires only on non-empty pages
                    # (funda_spider_sold.py:139-141)
                    consecutive_no_new += 1
            else:
                consecutive_empty = 0
                new = [
                    u for u in urls if u not in processed and u not in existing
                ]
                if not new:
                    consecutive_no_new += 1
                else:
                    consecutive_no_new = 0
                for pos, u in enumerate(urls):
                    if u in processed or u in existing:
                        continue
                    processed.add(u)
                    seen.add(u)
                    dhtml = site.fetch(u)
                    # bot-verification interstitial: dropped permanently
                    # without retry (funda_spider.py:190-192)
                    if dhtml is not None and BLOCK_MARKER not in dhtml:
                        log.append((u, "detail", page, PRIORITY_DETAIL, pos, city))
                        spans[u] = parse_spans(dhtml)
            stop = (
                consecutive_empty >= empty_threshold
                or consecutive_no_new >= no_new_threshold
                or page >= max_pages
            )
            if stop:
                break
            # next button if present, else the manual ?page=N construction
            # (funda_spider.py:172-184 — missing button never stops a crawl)
            url = next_page or f"{site.search_url(city, 1)}&page={page + 1}"
            page += 1

    return SimResult(
        crawl_log=log,
        seen_urls=seen,
        spans_by_doc=spans,
        pages_visited_by_city=pages_by_city,
    )


def simulate_refresh(
    site: SyntheticSite, max_pages: int = 100
) -> tuple[dict[str, set[str]], dict[str, int]]:
    """The reference's weekly refresh pass (collect_active_urls,
    funda_spider.py:455-528): per city, walk the search pages collecting
    ALL listing URLs under the looser '/koop/' filter — no seen
    filtering, no detail visits, no stop counters, next button only
    (no manual fallback). Returns ({city: urls}, {city: pages})."""
    active_urls: dict[str, set[str]] = {}
    pages_by_city: dict[str, int] = {}
    for city in site.cities:
        found: set[str] = set()
        page, url = 1, site.search_url(city, 1)
        while True:
            html = site.fetch(url)
            if html is None:
                break
            pages_by_city[city] = page
            urls, next_page = extract_search(html, page_url=url, path_filter="/koop/")
            found.update(urls)
            if next_page is None or page >= max_pages:
                break
            url = next_page
            page += 1
        active_urls[city] = found
    return active_urls, pages_by_city
