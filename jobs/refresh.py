#!/usr/bin/env python
"""spark-submit entry: the weekly refresh pass + mark-inactive.

  spark-submit --py-files dist/fundamental_spark.zip jobs/refresh.py \\
      --crawl-warehouse /data/refresh_wh --props-warehouse /data/props \\
      --cities amsterdam utrecht

Mirrors scheduler.go:214-254 -> funda_spider.refresh_active_listings:
a CrawlRunner in refresh mode collects every listed URL per city under
the looser '/koop/' filter (search pages only, no detail fetches), then
mark_inactive_from_refresh transitions the stale actives. The sandbox
runs against the deterministic synthetic site; production swaps in the
HTTP fetcher web table.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crawl-warehouse", required=True)
    ap.add_argument("--props-warehouse", required=True)
    ap.add_argument("--cities", nargs="+", default=["amsterdam", "utrecht"])
    ap.add_argument("--listings-per-city", type=int, default=40)
    ap.add_argument("--page-size", type=int, default=15)
    ap.add_argument("--max-pages", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from fundamental_spark.crawl.runner import CrawlRunner
    from fundamental_spark.operators.lifecycle import mark_inactive_from_refresh
    from fundamental_spark.session import get_spark
    from fundamental_spark.synth.site import build_site, web_rows
    from fundamental_spark.tableformat import Warehouse

    spark = get_spark("fundamental-refresh")
    site = build_site(
        seed=args.seed,
        cities=tuple(args.cities),
        listings_per_city=args.listings_per_city,
        page_size=args.page_size,
    )
    web = spark.createDataFrame(web_rows(site), "url string, html string")
    runner = CrawlRunner(
        spark=spark,
        warehouse_root=args.crawl_warehouse,
        web=web,
        mode="refresh",
        max_pages=args.max_pages,
    )
    runner.init([(site.search_url(c, 1), c) for c in site.cities])
    waves = runner.run()
    refreshed = runner.table("refreshed_urls")

    wh = Warehouse(spark, args.props_warehouse)
    n_inactive = (
        mark_inactive_from_refresh(wh, refreshed, wave=runner.wave)
        if wh.exists("properties")
        else 0
    )
    print(json.dumps({
        "waves": waves,
        "refreshed_urls": refreshed.count(),
        "marked_inactive": n_inactive,
    }))


if __name__ == "__main__":
    main()
