"""Field extractors (P1-P9) vs the synthetic site's ground truth.

Every extractor is a JVM column expression over the span sequence; the
ground truth is the Listing dataclass the page was rendered from — so
this round-trips render → span parse → extract."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from fundamental_spark.crawl.parse import parse_spans_udf
from fundamental_spark.functions.extractors import extract_items, normalize_city
from fundamental_spark.synth.site import build_site


@pytest.fixture(scope="module")
def extracted(spark):
    site = build_site(seed=31, cities=("amsterdam", "utrecht"), listings_per_city=50)
    docs = spark.createDataFrame(
        list(site.detail_pages.items()), "doc_id string, html string"
    ).select("doc_id", parse_spans_udf(F.col("html")).alias("spans"))
    rows = {r["url"]: r for r in extract_items(docs).collect()}
    truth = {l.url: l for l in site.listings}
    assert set(rows) == set(truth)
    return rows, truth


def test_price_ladder(extracted):
    rows, truth = extracted
    # the fixture must exercise the comma-thousands dd format (P3:
    # pipelines.py strips ',' as well as '.')
    assert any(
        l.price_comma_fmt and not l.price_in_jsonld and l.price is not None
        for l in truth.values()
    )
    for u, l in truth.items():
        assert rows[u]["price"] == l.price, (u, l.price_in_jsonld, l.price_comma_fmt)


def test_living_area_ladder(extracted):
    rows, truth = extracted
    for u, l in truth.items():
        assert rows[u]["living_area"] == l.living_area


def test_rooms_and_year(extracted):
    rows, truth = extracted
    for u, l in truth.items():
        assert rows[u]["num_rooms"] == l.num_rooms
        assert rows[u]["year_built"] == l.year_built


def test_energy_label_three_stage(extracted):
    rows, truth = extracted
    # all three ladder stages must be present in the fixture: dd label,
    # JSON-LD-only (funda_spider.py:225-242), description-only
    labelled = [l for l in truth.values() if l.energy_label is not None]
    assert any(l.energy_in_dd for l in labelled)
    assert any(not l.energy_in_dd and l.energy_in_jsonld for l in labelled)
    assert any(not l.energy_in_dd and not l.energy_in_jsonld for l in labelled)
    for u, l in truth.items():
        assert rows[u]["energy_label"] == l.energy_label, (
            u, l.energy_in_dd, l.energy_in_jsonld,
        )


def test_dates_and_status(extracted):
    rows, truth = extracted
    for u, l in truth.items():
        assert rows[u]["listing_date"] == datetime.date.fromisoformat(l.listing_date), (
            u,
            l.date_in_jsonld,
        )
        assert rows[u]["status"] == l.status
        if l.status == "sold":
            assert rows[u]["selling_date"] == datetime.date.fromisoformat(l.selling_date)
        else:
            assert rows[u]["selling_date"] is None


def test_address_fields(extracted):
    rows, truth = extracted
    for u, l in truth.items():
        assert rows[u]["street"] == l.street
        assert rows[u]["postal_code"] == l.postal_code
        assert rows[u]["item_city"] == l.city.capitalize()
        assert rows[u]["neighborhood"] == l.neighborhood
        assert rows[u]["property_type"] == l.property_type
        assert rows[u]["n_media"] >= 2  # photos + floorplan


def test_city_normalization(spark):
    # P11, config/cities.go:24-43
    df = spark.createDataFrame(
        [("'s-Hertogenbosch",), ("Den Haag",), ("AMSTERDAM",)], "c string"
    ).select(normalize_city(F.col("c")).alias("n"))
    assert [r["n"] for r in df.collect()] == ["den-bosch", "den-haag", "amsterdam"]


def test_extraction_plan_has_no_python(spark):
    """input_hint mandate: no per-row Python in the projection — the
    physical plan of extract_items must contain no Python eval nodes."""
    site = build_site(seed=5, cities=("delft",), listings_per_city=5)
    docs = spark.createDataFrame(
        list(site.detail_pages.items()), "doc_id string, html string"
    ).select("doc_id", parse_spans_udf(F.col("html")).alias("spans"))
    # write out so the extraction plan starts from a parquet scan
    import tempfile, os

    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "docs"))
    plan = (
        extract_items(spark.read.parquet(os.path.join(d, "docs")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # extraction itself is pure JVM


def test_energy_label_per_stage_validation(spark):
    """Round-4 parity fix (advice #3): stage-specific validation matches
    funda_spider.py bit-for-bit — a dd of 'A+++' fails stage 1's
    whole-value whitelist (no truncation), the JSON-LD stage keeps the
    raw 'A+++' capture unvalidated, and the description stage's
    substring regex yields 'A++' from 'a+++'."""
    from pyspark.sql import functions as F

    from fundamental_spark.functions.extractors import extract_energy_label

    rows = [
        # (text, jsonld)
        ("Energielabel: A+++", None),                       # stage1 reject, no fallback
        ("Energielabel: A+++", '{"energyLabel":"A+++"}'),   # stage2 raw keeps A+++
        ("geen label hier energielabel a+++ aanwezig", None),  # stage3 substring -> A++
        ("Energielabel: b", None),                          # stage1 upper() -> B
        ("Energielabel: A++", None),                        # stage1 pass
    ]
    df = spark.createDataFrame(rows, "text string, jsonld string")
    got = [
        r["label"]
        for r in df.select(
            extract_energy_label(F.col("text"), F.col("jsonld")).alias("label")
        ).collect()
    ]
    assert got == [None, "A+++", "A++", "B", "A++"]
