"""Page parsing.

Search pages (funda_spider.py:84-186) parse **fully JVM-side**: the
JSON-LD ItemList extraction is regexp_extract + from_json + transform
(whole-stage codegen, zero Python), the next-page anchor and the CSS
fallback are regexp extracts. Detail pages parse into interleaved span
sequences with ONE vectorized Arrow pandas UDF (the input_hint mandate:
no per-row Python plan nodes) — HTML is genuinely irregular, so this is
the one place Python earns its keep.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SEARCH_ITEMS_SCHEMA = "struct<itemListElement:array<struct<position:int,url:string>>>"

_LD_RE = r'<script type="application/ld\+json">(.*?)</script>'


def jsonld_blob(html: Column) -> Column:
    return F.regexp_extract(html, _LD_RE, 1)


def listing_urls(html: Column) -> Column:
    """Ordered listing URLs from the JSON-LD ItemList (funda_spider.py:96-107),
    path-filtered to '/detail/koop/' (:104), with the CSS-selector fallback
    (:110-116) unioned in when JSON-LD is absent."""
    ld = F.from_json(jsonld_blob(html), SEARCH_ITEMS_SCHEMA)
    from_ld = F.transform(ld["itemListElement"], lambda it: it["url"])
    css = F.regexp_extract_all(
        html, F.lit(r'data-test-id="search-result-item"><a href="([^"]+)"'), 1
    )
    urls = F.when(F.size(from_ld) > 0, from_ld).otherwise(css)
    return F.filter(urls, lambda u: u.contains("/detail/koop/"))


def next_page_url(html: Column) -> Column:
    u = F.regexp_extract(html, r'data-test-id="next-page-button" href="([^"]+)"', 1)
    return F.when(u == "", F.lit(None).cast("string")).otherwise(u)


def parse_search_pages(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages(+html) -> one row per page with ordered candidate listing
    urls and the next-page url. Downstream: posexplode(listing_urls)."""
    h = F.col(html_col)
    return pages.withColumn("listing_urls", listing_urls(h)).withColumn(
        "next_page", next_page_url(h)
    )


# ---------------------------------------------------------------------------
# Detail page -> interleaved span sequence (vectorized Arrow UDF)
# ---------------------------------------------------------------------------
_SPAN_RE = re.compile(
    r'<script type="application/ld\+json">(?P<ld>.*?)</script>'
    r"|<h1[^>]*>(?P<h1>.*?)</h1>"
    r'|<img src="(?P<img>[^"]+)">'
    r"|<p[^>]*>(?P<p>.*?)</p>"
    r"|<dt>(?P<dt>.*?)</dt>\s*<dd>(?P<dd>.*?)</dd>",
    re.S,
)

from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPANS_TYPE = ArrayType(
    StructType(
        [
            StructField("kind", StringType()),
            StructField("text", StringType()),
            StructField("media_ref", StringType()),
            StructField("offset", IntegerType()),
        ]
    )
)


def _spans_of(html: str) -> list[dict]:
    if html is None:
        return []
    out: list[dict] = []
    for m in _SPAN_RE.finditer(html):
        if m.group("ld") is not None:
            out.append({"kind": "text", "text": m.group("ld").strip(), "media_ref": None})
        elif m.group("h1") is not None:
            out.append({"kind": "text", "text": m.group("h1").strip(), "media_ref": None})
        elif m.group("img") is not None:
            out.append({"kind": "media", "text": None, "media_ref": m.group("img")})
        elif m.group("p") is not None:
            out.append({"kind": "text", "text": m.group("p").strip(), "media_ref": None})
        else:
            label = m.group("dt").strip()
            val = m.group("dd").strip()
            out.append({"kind": "text", "text": f"{label}: {val}", "media_ref": None})
    for i, s in enumerate(out):
        s["offset"] = i
    return out


@pandas_udf(SPANS_TYPE)
def parse_spans_udf(html: pd.Series) -> pd.Series:
    return html.map(_spans_of)
