"""FundaItem field extractors over interleaved span sequences (P1-P16).

The reference extracts every field imperatively from the live HTML
response with CSS-selector ladders + regex fallbacks
(funda_spider.py:188-453, pipelines.py:8-52). Here the page is already
a span sequence (documents.spans, BASELINE.json input_hint), and every
extractor is a **pure JVM column expression** — regexp_extract /
get_json_object / coalesce ladders that stay inside whole-stage
codegen. No Python runs in this projection at all (the single pandas
UDF in the pipeline is the HTML→spans split, crawl/parse.py).

Extractor ladders mirror the reference's precedence:
  P1 energy label: dd selector → JSON-LD → description regex
     (funda_spider.py:206-257; documentation/energy.md)
  P3 price: JSON-LD offers.price → '€ 1.234.567' text (funda_spider.py:352-374;
     pipelines.py:12-18 strips dots)
  P4 living area: JSON-LD floorSize.value → '(\\d+) m²' (funda_spider.py:395-417)
  P5 rooms: '(\\d+) kamers' (funda_spider.py:384-393)
  P6 year built: 'Bouwjaar' 4 digits (funda_spider.py:376-382)
  P7 Dutch date: JSON-LD datePosted/dateSold → month-name map
     (funda_spider.py:419-441; funda_spider_sold.py:291-331)
  P8 postal code: JSON-LD address.postalCode → '\\d{4} ?[A-Z]{2}' from title
     (funda_spider.py:333-349)
  P2/P9 street / city / neighborhood / type: JSON-LD address fields
     (funda_spider.py:259-343)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MONTHS_NL = {
    "januari": "01", "februari": "02", "maart": "03", "april": "04",
    "mei": "05", "juni": "06", "juli": "07", "augustus": "08",
    "september": "09", "oktober": "10", "november": "11", "december": "12",
}


def _nn(c: Column) -> Column:
    """regexp_extract returns '' on miss; normalize to NULL."""
    return F.nullif(c, F.lit(""))


def text_blob(spans: Column) -> Column:
    """All text spans joined (document order preserved)."""
    return F.array_join(
        F.transform(F.filter(spans, lambda s: s["kind"] == "text"), lambda s: s["text"]),
        "\n",
    )


def jsonld_of(spans: Column) -> Column:
    """First text span that is a JSON object — the JSON-LD blob."""
    cand = F.filter(
        spans, lambda s: (s["kind"] == "text") & s["text"].startswith("{")
    )
    return F.element_at(cand, 1)["text"]


def media_refs(spans: Column) -> Column:
    return F.transform(
        F.filter(spans, lambda s: s["kind"] == "media"), lambda s: s["media_ref"]
    )


def extract_price(jsonld: Column, text: Column) -> Column:
    """P3: JSON-LD offers.price, else the € amount from text. The
    pipeline strips '€', '.', AND ',' before int conversion
    (pipelines.py:12-18) — '€ 1,250,000' and '€ 1.250.000' both parse."""
    from_ld = F.get_json_object(jsonld, "$.offers.price").cast("long")
    from_text = _nn(F.regexp_extract(text, r"€\s*([\d.,]+)", 1))
    from_text = F.regexp_replace(from_text, r"[.,]", "").cast("long")
    return F.coalesce(from_ld, from_text)


def extract_living_area(jsonld: Column, text: Column) -> Column:
    from_ld = F.get_json_object(jsonld, "$.floorSize.value").cast("int")
    from_text = _nn(F.regexp_extract(text, r"(\d+)\s*m[²2]", 1)).cast("int")
    return F.coalesce(from_ld, from_text)


def extract_rooms(text: Column) -> Column:
    return _nn(F.regexp_extract(text, r"(\d+)\s+kamers?", 1)).cast("int")


def extract_year_built(text: Column) -> Column:
    return _nn(F.regexp_extract(text, r"Bouwjaar:?\s*(\d{4})", 1)).cast("int")


def extract_energy_label(text: Column, jsonld: Column | None = None) -> Column:
    """P1, the reference's full 3-stage ladder (funda_spider.py:204-253),
    with per-stage validation matching the reference BIT-FOR-BIT
    (round-3 advice #3 — a blanket final whitelist deviated on stage 2):
    (1) the dd/HTML label: the WHOLE cleaned value must match the
        ^[A-G](\\+{1,2})?$ whitelist (funda_spider.py:219-221) — a dd
        of 'A+++' fails stage 1 entirely (no truncation to 'A++');
    (2) the JSON-LD blob regex energy(Label|Data): the RAW capture
        ([A-G]\\+*) is assigned unvalidated (funda_spider.py:236-238),
        so 'A+++' from JSON-LD IS kept;
    (3) the description text: re.search with ([a-g](?:\\+{1,2})?), a
        substring match — 'energielabel a+++' yields 'A++'
        (funda_spider.py:248-252). First stage that yields wins."""
    # the WHOLE cleaned dd value (rest of line, trimmed) must pass the
    # whitelist, mirroring the reference's strip().upper() + full-match
    # on the complete dd text — a multi-token dd like 'B (voorlopig)'
    # fails stage 1 entirely (no first-token truncation to 'B')
    from_dd_raw = F.upper(
        _nn(F.trim(F.regexp_extract(text, r"Energielabel:?[ \t]*([^\n\r]+)", 1)))
    )
    from_dd = F.when(from_dd_raw.rlike(r"^[A-G](\+{1,2})?$"), from_dd_raw)
    stages = [from_dd]
    if jsonld is not None:
        from_ld = F.upper(
            _nn(
                F.regexp_extract(
                    jsonld,
                    r'(?i)["\']energy(?:Label|Data)["\']\s*:\s*["\']([A-Ga-g]\+*)["\']',
                    1,
                )
            )
        )
        stages.append(from_ld)
    from_desc = F.upper(
        _nn(
            F.regexp_extract(
                F.lower(text), r"energi(?:elabel|eklasse)\s*([a-g]\+{0,2})", 1
            )
        )
    )
    stages.append(from_desc)
    return F.coalesce(*stages)


def dutch_date_to_iso(raw: Column) -> Column:
    """'12 maart 2024' -> date. Chained regexp_replace month map (P7)."""
    s = F.lower(F.trim(raw))
    for name, mm in MONTHS_NL.items():
        s = F.regexp_replace(s, rf"\s{name}\s", f"-{mm}-")
    # now 'd-MM-yyyy'
    return F.to_date(_nn(F.regexp_extract(s, r"^(\d{1,2}-\d{2}-\d{4})$", 1)), "d-MM-yyyy")


def extract_listing_date(jsonld: Column, text: Column) -> Column:
    from_ld = F.to_date(F.get_json_object(jsonld, "$.datePosted"))
    raw = _nn(F.regexp_extract(text, r"Aangeboden sinds:?\s*(\d{1,2} \w+ \d{4})", 1))
    return F.coalesce(from_ld, dutch_date_to_iso(raw))


def extract_selling_date(jsonld: Column, text: Column) -> Column:
    from_ld = F.to_date(F.get_json_object(jsonld, "$.dateSold"))
    raw = _nn(F.regexp_extract(text, r"Verkoopdatum:?\s*(\d{1,2} \w+ \d{4})", 1))
    return F.coalesce(from_ld, dutch_date_to_iso(raw))


def extract_postal_code(jsonld: Column, text: Column) -> Column:
    from_ld = F.get_json_object(jsonld, "$.address.postalCode")
    from_text = _nn(F.regexp_extract(text, r"\b(\d{4}\s?[A-Z]{2})\b", 1))
    return F.coalesce(from_ld, from_text)


def extract_street(jsonld: Column) -> Column:
    addr = F.get_json_object(jsonld, "$.address.streetAddress")
    return _nn(F.regexp_extract(addr, r"^(.*?)\s*\d+(?:\s*[a-zA-Z-]?\d*)?\s*$", 1))


def extract_city(jsonld: Column) -> Column:
    loc = F.get_json_object(jsonld, "$.address.addressLocality")
    return F.trim(F.split(loc, ",")[0])


def extract_neighborhood(jsonld: Column) -> Column:
    loc = F.get_json_object(jsonld, "$.address.addressLocality")
    parts = F.split(loc, ",")
    return F.when(F.size(parts) > 1, F.trim(parts[1]))


def extract_property_type(jsonld: Column) -> Column:
    t = F.lower(F.get_json_object(jsonld, "$['@type']"))
    return (
        F.when(t == "appartement", "appartement")
        .when(t == "huis", "huis")
        .otherwise(t)
    )


def normalize_city(c: Column) -> Column:
    """P11, config/cities.go:24-43: lowercase, strip apostrophes,
    's-hertogenbosch -> den-bosch, spaces -> hyphens."""
    s = F.lower(F.trim(c))
    s = F.regexp_replace(s, r"'", "")
    s = F.when(s == "s-hertogenbosch", F.lit("den-bosch")).otherwise(s)
    return F.regexp_replace(s, r"\s+", "-")


def extract_items(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans, ...) -> FundaItem projection (S7/P1-P9).

    Pure column expressions end-to-end: Catalyst prunes to (doc_id,
    spans) at the scan and the whole projection runs in codegen.
    """
    spans = F.col("spans")
    ld = jsonld_of(spans)
    txt = text_blob(spans)
    extra = [c for c in ("wave", "city", "discovered_on_page", "page_pos") if c in docs.columns]
    selling = extract_selling_date(ld, txt)
    return docs.select(
        F.col("doc_id").alias("url"),
        F.xxhash64("doc_id").alias("url_hash"),
        extract_street(ld).alias("street"),
        extract_neighborhood(ld).alias("neighborhood"),
        extract_property_type(ld).alias("property_type"),
        extract_city(ld).alias("item_city"),
        extract_postal_code(ld, txt).alias("postal_code"),
        extract_price(ld, txt).alias("price"),
        extract_year_built(txt).alias("year_built"),
        extract_living_area(ld, txt).alias("living_area"),
        extract_rooms(txt).alias("num_rooms"),
        F.when(selling.isNotNull(), F.lit("sold")).otherwise(F.lit("active")).alias("status"),
        extract_listing_date(ld, txt).alias("listing_date"),
        selling.alias("selling_date"),
        extract_energy_label(txt, ld).alias("energy_label"),
        F.size(media_refs(spans)).alias("n_media"),
        *[F.col(c) for c in extra],
    )
