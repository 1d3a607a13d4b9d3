"""Deterministic synthetic funda-style site.

Generates the world both crawlers (the pure-Python reference simulator
and the Spark frontier pipeline) run against:

- per-city listings with the field formats the reference extracts
  (funda_spider.py:188-453): price "€ 450.000 k.k.", "N kamers",
  "Bouwjaar YYYY", energy labels, Dutch dates, postal codes, JSON-LD;
- search-result pages (page_size listings, sort=date_down) with a
  JSON-LD ItemList (funda_spider.py:96-107) and a next-page anchor
  (funda_spider.py:159-165);
- detail pages whose body is an interleaved sequence of text blocks and
  media (photos/floorplans) — the span-sequence shape mandated by
  BASELINE.json input_hint.

Everything derives from (seed, index); dates derive from a fixed epoch.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field

BASE = "https://www.funda.nl"
EPOCH_ORD = 739000  # fixed date ordinal (≈2024-03) — no wall-clock anywhere

STREETS = [
    "Keizersgracht", "Prinsengracht", "Herengracht", "Dorpsstraat",
    "Kerkstraat", "Molenweg", "Stationsplein", "Wilhelminalaan",
    "Beatrixstraat", "Julianalaan", "Lindelaan", "Hoofdstraat",
]
NEIGHBORHOODS = ["Centrum", "Noord", "Zuid", "Oost", "West", "Binnenstad"]
ENERGY_LABELS = ["A++", "A+", "A", "B", "C", "D", "E", "F", "G"]
PROPERTY_TYPES = ["appartement", "huis"]
MONTHS_NL = [
    "januari", "februari", "maart", "april", "mei", "juni", "juli",
    "augustus", "september", "oktober", "november", "december",
]
DESCRIPTION_WORDS = [
    "ruime", "lichte", "karakteristieke", "moderne", "sfeervolle",
    "woning", "appartement", "tuin", "balkon", "dakterras", "keuken",
    "badkamer", "woonkamer", "slaapkamer", "gelegen", "nabij", "centrum",
]


def _date_str(ordinal: int) -> str:
    import datetime

    return datetime.date.fromordinal(ordinal).isoformat()


def _dutch_date(ordinal: int) -> str:
    import datetime

    d = datetime.date.fromordinal(ordinal)
    return f"{d.day} {MONTHS_NL[d.month - 1]} {d.year}"


@dataclass
class Listing:
    listing_id: int
    city: str
    url: str
    street: str
    house_number: int
    neighborhood: str
    property_type: str
    postal_code: str
    price: int | None
    living_area: int | None
    num_rooms: int | None
    year_built: int | None
    energy_label: str | None
    listing_date_ord: int
    status: str  # 'active' | 'sold'
    selling_date_ord: int | None
    # field-source knobs: exercise the extractor coalesce ladders
    price_in_jsonld: bool = True
    area_in_jsonld: bool = True
    energy_in_dd: bool = True  # else JSON-LD (if energy_in_jsonld) or description
    energy_in_jsonld: bool = False  # P1 middle stage: label ONLY in the JSON-LD blob
    price_comma_fmt: bool = False  # P3: '€ 1,250,000' (comma thousands) in the dd text
    date_in_jsonld: bool = True  # else only 'Aangeboden sinds' Dutch date
    # description-stream seed override: a clone listing shares its
    # source's seed so the rendered description text is IDENTICAL —
    # the deterministic near-dup fixture for the crawl dedup hook
    desc_seed_id: int | None = None

    @property
    def listing_date(self) -> str:
        return _date_str(self.listing_date_ord)

    @property
    def selling_date(self) -> str | None:
        return None if self.selling_date_ord is None else _date_str(self.selling_date_ord)


@dataclass
class SyntheticSite:
    seed: int
    cities: list[str]
    page_size: int
    listings: list[Listing] = field(default_factory=list)
    # page_url -> html ; detail url -> html
    search_pages: dict[str, str] = field(default_factory=dict)
    detail_pages: dict[str, str] = field(default_factory=dict)
    # page metadata: city -> ordered list of (page_url, [listing urls in page order])
    pages_by_city: dict[str, list[tuple[str, list[str]]]] = field(default_factory=dict)

    def search_url(self, city: str, page: int) -> str:
        # funda_spider.py:50-59 shape: place + sort=date_down (+ page);
        # percent-encoded so the URL survives href="..." attributes
        area = f"%5B%22{city}%22%5D"
        suffix = "" if page == 1 else f"&search_result={page}"
        return f"{BASE}/zoeken/koop?selected_area={area}&sort=date_down{suffix}"

    def manual_url(self, city: str, page: int) -> str:
        """The manually-constructed pagination URL shape the reference
        falls back to when the next button is absent (funda_spider.py:
        172-184): base search params + page=N."""
        return f"{self.search_url(city, 1)}&page={page}"

    def fetch(self, url: str) -> str | None:
        return self.search_pages.get(url) or self.detail_pages.get(url)


def _jsonld_detail(l: Listing) -> str:
    obj: dict = {
        "@type": "Appartement" if l.property_type == "appartement" else "Huis",
        "address": {
            "streetAddress": f"{l.street} {l.house_number}",
            "postalCode": l.postal_code,
            "addressLocality": f"{l.city.capitalize()}, {l.neighborhood}",
        },
        "url": l.url,
    }
    if l.date_in_jsonld:
        obj["datePosted"] = l.listing_date
    if l.price is not None and l.price_in_jsonld:
        obj["offers"] = {"price": l.price, "priceCurrency": "EUR"}
    if l.living_area is not None and l.area_in_jsonld:
        obj["floorSize"] = {"value": l.living_area, "unitCode": "MTK"}
    if l.status == "sold" and l.selling_date:
        obj["dateSold"] = l.selling_date
    if l.energy_label is not None and not l.energy_in_dd and l.energy_in_jsonld:
        # the reference finds this via the energy(Label|Data) regex over
        # the raw blob (funda_spider.py:225-242) — P1's middle stage
        obj["energyLabel"] = l.energy_label
    return json.dumps(obj, separators=(",", ":"), sort_keys=True)


DESCRIPTION_LEN = 24  # overridable via build_site(description_words=...)


def _description(rng: random.Random, l: Listing, n_words: int = 24) -> str:
    # rng.choices is ~4.6x faster than a randrange loop (one C-level
    # random() per word) — the description is half the render cost of a
    # bench-weight page, and the render stands in for network+decode
    # work in every throughput leg. Still seed-deterministic.
    words = rng.choices(DESCRIPTION_WORDS, k=n_words)
    desc = " ".join(words)
    if not l.energy_in_dd and not l.energy_in_jsonld and l.energy_label:
        # description-text energy fallback (funda_spider.py:246-257)
        desc += f" energielabel {l.energy_label.lower()} aanwezig"
    return desc


def _fmt_price(price: int, comma: bool = False) -> str:
    # both thousands styles appear in the wild; the pipeline strips '.'
    # AND ',' before int() (pipelines.py:12-18)
    s = f"{price:,}" if comma else f"{price:,}".replace(",", ".")
    return f"€ {s} k.k."


def render_detail_html(rng: random.Random, l: Listing, description_words: int = 24) -> str:
    """Detail page: interleaved text blocks + media, stable order."""
    parts = [
        "<html><head>",
        f'<script type="application/ld+json">{_jsonld_detail(l)}</script>',
        "</head><body>",
        f'<h1 class="object-header__title">{l.street} {l.house_number}, '
        f"{l.postal_code} {l.city.capitalize()}</h1>",
    ]
    n_photos = 1 + rng.randrange(3)
    for i in range(n_photos):
        parts.append(f'<img src="{BASE}/media/{l.listing_id}_{i}.jpg">')
    parts.append(
        f'<p class="object-description-body">{_description(rng, l, description_words)}</p>'
    )
    parts.append(f'<img src="{BASE}/media/{l.listing_id}_plattegrond.png">')
    dd: list[tuple[str, str]] = []
    if l.price is not None:
        dd.append(("Vraagprijs", _fmt_price(l.price, comma=l.price_comma_fmt)))
    if l.living_area is not None:
        dd.append(("Wonen", f"{l.living_area} m²"))
    if l.num_rooms is not None:
        slaap = max(1, l.num_rooms - 1)
        dd.append(("Aantal kamers", f"{l.num_rooms} kamers ({slaap} slaapkamers)"))
    if l.year_built is not None:
        dd.append(("Bouwjaar", str(l.year_built)))
    if l.energy_label is not None and l.energy_in_dd:
        dd.append(("Energielabel", l.energy_label))
    dd.append(("Aangeboden sinds", _dutch_date(l.listing_date_ord)))
    if l.status == "sold" and l.selling_date_ord is not None:
        dd.append(("Verkoopdatum", _dutch_date(l.selling_date_ord)))
    for k, v in dd:
        parts.append(f"<dt>{k}</dt><dd>{v}</dd>")
    parts.append(f'<p class="object-buurt">Buurt: {l.neighborhood}</p>')
    parts.append("</body></html>")
    return "".join(parts)


def render_search_html(
    site: SyntheticSite,
    city: str,
    page: int,
    include_jsonld: bool = True,
    relative_css: bool = False,
    include_next: bool | None = None,
) -> str:
    """Search page. Knobs exercise the reference's extraction paths:
    ``include_jsonld=False`` -> CSS-only page (funda_spider.py:109-116
    is the only URL source); ``relative_css`` -> hrefs need urljoin;
    anchors alternate between the two CSS selector shapes the reference
    reads; ``include_next=False`` -> next button absent mid-sequence
    (the manual ?page=N construction fallback, :172-184)."""
    pages = site.pages_by_city[city]
    _, urls = pages[page - 1]
    parts = ["<html><head>"]
    if include_jsonld:
        items = [
            {"@type": "ListItem", "position": i + 1, "url": u}
            for i, u in enumerate(urls)
        ]
        ld = json.dumps(
            {"@type": "ItemList", "itemListElement": items}, separators=(",", ":")
        )
        parts.append(f'<script type="application/ld+json">{ld}</script>')
    parts.append("</head><body>")
    for i, u in enumerate(urls):
        href = u[len(BASE):] if relative_css else u
        if i % 2 == 0:
            parts.append(
                f'<div data-test-id="search-result-item"><a href="{href}"></a></div>'
            )
        else:
            parts.append(
                f'<div class="search-result__header-title-col"><a href="{href}"></a></div>'
            )
    if include_next is None:
        include_next = page < len(pages)
    if include_next and page < len(pages):
        parts.append(
            f'<a data-test-id="next-page-button" href="{site.search_url(city, page + 1)}">Volgende</a>'
        )
    parts.append("</body></html>")
    return "".join(parts)


# the bot-verification interstitial body (funda_spider.py:190-192) — a
# 200 response the reference drops permanently without retry
BLOCK_MARKER = "Je bent bijna op de pagina die je zoekt"
BLOCKED_HTML = f"<html><body><p>{BLOCK_MARKER}</p></body></html>"


def web_rows(site: SyntheticSite) -> list[tuple[str, str]]:
    """All (url, html) pairs — materialize as the Spark 'web' table the
    distributed fetcher joins against."""
    rows = list(site.search_pages.items()) + list(site.detail_pages.items())
    rows.sort()
    return rows


# --- executor-side rendering (large-scale variant) -------------------------
# at frontier scale the synthetic web can't be materialized on the driver;
# detail pages ship as compact specs and render inside the fetch stage
# (standing in for network transfer + decode cost of a real fetch)

_SPEC_FIELDS = (
    "listing_id", "city", "url", "street", "house_number", "neighborhood",
    "property_type", "postal_code", "price", "living_area", "num_rooms",
    "year_built", "energy_label", "listing_date_ord", "status",
    "selling_date_ord", "price_in_jsonld", "area_in_jsonld", "energy_in_dd",
    "energy_in_jsonld", "price_comma_fmt",
    "date_in_jsonld", "desc_seed_id",
)


def listing_spec(l: Listing, seed: int, description_words: int) -> str:
    d = {f: getattr(l, f) for f in _SPEC_FIELDS}
    d["seed"] = seed
    d["description_words"] = description_words
    return json.dumps(d, separators=(",", ":"))


def render_from_spec(spec_json: str) -> str:
    d = json.loads(spec_json)
    seed = d.pop("seed")
    desc_words = d.pop("description_words")
    l = Listing(**d)
    sid = l.desc_seed_id if l.desc_seed_id is not None else l.listing_id
    return render_detail_html(random.Random(seed * 1_000_003 + sid), l, desc_words)


def spec_web_rows(
    site: SyntheticSite, description_words: int = 24
) -> tuple[list[tuple[str, str, str]], int]:
    """(url, html, spec) rows: search pages carry html, detail pages carry
    a spec rendered executor-side. Returns (rows, n_detail)."""
    rows: list[tuple[str, str, str]] = [
        (u, h, None) for (u, h) in site.search_pages.items()
    ]
    for l in site.listings:
        rows.append((l.url, None, listing_spec(l, site.seed, description_words)))
    rows.sort(key=lambda r: r[0])
    return rows, len(site.listings)


def build_site(
    seed: int = 42,
    cities: tuple[str, ...] = ("amsterdam", "utrecht"),
    listings_per_city: int = 40,
    page_size: int = 15,
    sold_fraction: float = 0.25,
    null_fraction: float = 0.15,
    empty_tail_pages: int = 0,
    description_words: int = 24,
    render_details: bool = True,
    css_only_pages: tuple[int, ...] = (),
    relative_css: bool = False,
    omit_next_button_pages: tuple[int, ...] = (),
    manual_aliases: bool = True,
    blocked_listing_every: int = 0,
    blocked_search_pages: tuple[int, ...] = (),
    project_urls_per_city: int = 0,
    clone_every: int = 0,
) -> SyntheticSite:
    """Build the deterministic site. ``empty_tail_pages`` appends pages with
    zero listings after the real ones (exercises the 3-empty-pages stop,
    funda_spider.py:39-40,127-135). ``css_only_pages`` renders those page
    numbers without JSON-LD (CSS selectors become the only URL source);
    ``omit_next_button_pages`` drops the next button there (crawlers must
    fall back to the manual ?page=N URL, which ``manual_aliases``
    registers for every page ≥2); ``blocked_listing_every`` replaces
    every Nth listing's detail page with the bot interstitial;
    ``project_urls_per_city`` appends '/koop/<city>/project-…' URLs (no
    '/detail/' segment) to page 1 — visible to the refresh pass's looser
    '/koop/' filter but invisible to the crawl's '/detail/koop/'.
    ``clone_every`` turns every Nth listing per city into a field-clone
    of the listing generated just before it (own url/listing_id, same
    content fields AND the same description word stream via
    desc_seed_id) — deterministic jaccard≈1 near-dup pairs for the
    crawl dedup hook; 0 disables and leaves all rng streams
    untouched."""
    rng = random.Random(seed)
    site = SyntheticSite(seed=seed, cities=list(cities), page_size=page_size)
    lid = 0
    for ci, city in enumerate(cities):
        city_listings: list[Listing] = []
        for i in range(listings_per_city):
            lid += 1
            street = STREETS[rng.randrange(len(STREETS))]
            num = 1 + rng.randrange(200)
            ptype = PROPERTY_TYPES[rng.randrange(2)]
            slug = f"{ptype}-{street.lower()}-{num}-{lid}"
            url = f"{BASE}/detail/koop/{city}/{slug}/{43000000 + lid}/"
            postal = f"{1000 + ci * 500 + rng.randrange(40)} {chr(65 + rng.randrange(26))}{chr(65 + rng.randrange(26))}"
            sold = rng.random() < sold_fraction
            ldate = EPOCH_ORD - i - rng.randrange(3)  # date_down ≈ newest first
            listing = Listing(
                listing_id=lid,
                city=city,
                url=url,
                street=street,
                house_number=num,
                neighborhood=NEIGHBORHOODS[rng.randrange(len(NEIGHBORHOODS))],
                property_type=ptype,
                postal_code=postal,
                price=None if rng.random() < null_fraction else 150_000 + rng.randrange(850) * 1000,
                living_area=None if rng.random() < null_fraction else 30 + rng.randrange(220),
                num_rooms=None if rng.random() < null_fraction else 1 + rng.randrange(8),
                year_built=None if rng.random() < null_fraction else 1900 + rng.randrange(125),
                energy_label=None if rng.random() < null_fraction else ENERGY_LABELS[rng.randrange(9)],
                listing_date_ord=ldate,
                status="sold" if sold else "active",
                selling_date_ord=(ldate + 10 + rng.randrange(120)) if sold else None,
                price_in_jsonld=rng.random() > 0.3,
                price_comma_fmt=rng.random() > 0.7,
                area_in_jsonld=rng.random() > 0.3,
                energy_in_dd=(x_energy := rng.random()) > 0.45,
                energy_in_jsonld=0.25 < x_energy <= 0.45,
                date_in_jsonld=rng.random() > 0.3,
            )
            if clone_every and i % clone_every == clone_every - 1 and city_listings:
                src = city_listings[-1]
                for fname in _SPEC_FIELDS:
                    if fname not in ("listing_id", "city", "url"):
                        setattr(listing, fname, getattr(src, fname))
                listing.desc_seed_id = (
                    src.desc_seed_id if src.desc_seed_id is not None else src.listing_id
                )
            city_listings.append(listing)
            site.listings.append(listing)
        # sort=date_down: newest first, id tiebreak (deterministic)
        city_listings.sort(key=lambda l: (-l.listing_date_ord, l.listing_id))
        pages: list[tuple[str, list[str]]] = []
        for p0 in range(0, len(city_listings), page_size):
            page_no = len(pages) + 1
            urls = [l.url for l in city_listings[p0 : p0 + page_size]]
            if page_no == 1:
                urls = urls + [
                    f"{BASE}/koop/{city}/project-nieuwbouw-{i}/"
                    for i in range(project_urls_per_city)
                ]
            pages.append((site.search_url(city, page_no), urls))
        for _ in range(empty_tail_pages):
            page_no = len(pages) + 1
            pages.append((site.search_url(city, page_no), []))
        site.pages_by_city[city] = pages
        for page_no in range(1, len(pages) + 1):
            html = render_search_html(
                site,
                city,
                page_no,
                include_jsonld=page_no not in css_only_pages,
                relative_css=relative_css,
                include_next=(
                    False if page_no in omit_next_button_pages else None
                ),
            )
            if page_no in blocked_search_pages:
                html = BLOCKED_HTML
            site.search_pages[pages[page_no - 1][0]] = html
            if manual_aliases and page_no >= 2:
                site.search_pages[site.manual_url(city, page_no)] = html
        if render_details:
            for j, l in enumerate(city_listings):
                blocked = blocked_listing_every and (j % blocked_listing_every == blocked_listing_every - 1)
                site.detail_pages[l.url] = (
                    BLOCKED_HTML
                    if blocked
                    else render_detail_html(
                        random.Random(
                            seed * 1_000_003
                            + (l.desc_seed_id if l.desc_seed_id is not None else l.listing_id)
                        ),
                        l,
                        description_words,
                    )
                )
    return site
