"""Full-pipeline integration: crawl → streaming ingest → lifecycle →
analytics over the properties warehouse, checked against the synthetic
site's ground-truth listings (the A1/A3 shapes computed two ways)."""

from __future__ import annotations

import datetime
import statistics

from pyspark.sql import functions as F

from fundamental_spark.crawl.runner import CrawlRunner
from fundamental_spark.streaming.jobs import stream_ingest_documents
from fundamental_spark.synth.site import build_site, web_rows
from fundamental_spark.tableformat import Warehouse


def test_crawl_to_analytics_pipeline(spark, tmp_path):
    site = build_site(seed=61, cities=("arnhem", "nijmegen"), listings_per_city=35,
                      page_size=12)
    web = spark.createDataFrame(web_rows(site), "url string, html string")
    runner = CrawlRunner(spark=spark, warehouse_root=str(tmp_path / "crawl"), web=web)
    runner.init([(site.search_url(c, 1), c) for c in site.cities])
    runner.run()

    stream_ingest_documents(
        spark, str(tmp_path / "crawl"), str(tmp_path / "props"), str(tmp_path / "ck")
    )
    wh = Warehouse(spark, str(tmp_path / "props"))
    props = wh.read("properties")
    assert props.count() == len(site.listings)

    # A1 shape: weighted active/sold price stats vs ground truth
    row = props.agg(
        F.count(F.when(F.col("status") == "active", 1)).alias("na"),
        F.avg(F.when(F.col("status") == "active", F.col("price"))).alias("aa"),
        F.count(F.when(F.col("status") == "sold", 1)).alias("ns"),
        F.avg(F.when(F.col("status") == "sold", F.col("price"))).alias("sa"),
    ).first()
    truth_active = [l for l in site.listings if l.status == "active"]
    truth_sold = [l for l in site.listings if l.status == "sold"]
    assert row["na"] == len(truth_active) and row["ns"] == len(truth_sold)
    ta = [l.price for l in truth_active if l.price is not None]
    if ta:
        assert abs(row["aa"] - statistics.mean(ta)) < 1e-6

    # A3 shape: exact city median price vs ground truth
    med = {
        r["city"]: r["m"]
        for r in props.filter(F.col("price").isNotNull())
        .groupBy("city")
        .agg(F.median("price").alias("m"))
        .collect()
    }
    for city in site.cities:
        prices = [l.price for l in site.listings if l.city == city and l.price is not None]
        assert abs(med[city.capitalize()] - statistics.median(prices)) < 1e-6

    # P14 shape: days-to-sell matches date arithmetic on the ground truth
    d2s = props.filter(F.col("status") == "sold").select(
        F.datediff("selling_date", "listing_date").alias("d")
    )
    got = sorted(r["d"] for r in d2s.collect())
    expect = sorted(
        (datetime.date.fromisoformat(l.selling_date) - datetime.date.fromisoformat(l.listing_date)).days
        for l in truth_sold
    )
    assert got == expect
