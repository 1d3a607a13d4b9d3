#!/usr/bin/env python
"""spark-submit entry: the scheduler-cadence orchestration loop.

  spark-submit --py-files dist/fundamental_spark.zip jobs/scheduler.py \\
      --warehouse /data/sched_wh --cities amsterdam utrecht \\
      --weekday 0 --hours 0 1 2

Twin of scheduler.go:84-282: iterates scheduler ticks and executes each
tick's job list STRICTLY SERIALLY (the jobMutex — one Spark job
pipeline at a time; waves inside a job are still fully distributed).
Job types map to the engine's modes:

  active  -> CrawlRunner(spider_type='active') drain + property ingest
  sold    -> CrawlRunner(spider_type='sold') drain + property ingest
  refresh -> CrawlRunner(mode='refresh') + mark_inactive_from_refresh
  hulls   -> district hull rebuild (operators.geo pipeline)

The sandbox compresses time: ticks are simulated (no sleeping) against
the deterministic synthetic site; a deployment drives the same loop
from a real clock and the HTTP fetcher web table.
"""

from __future__ import annotations

import argparse
import json


def execute_job(spark, job_type: str, city: str, args, web, site) -> dict:
    """Run ONE scheduler job to completion (serial: caller must not
    overlap calls — the jobMutex contract)."""
    from pyspark.sql import functions as F

    from fundamental_spark.crawl.runner import CrawlRunner
    from fundamental_spark.functions.extractors import extract_items
    from fundamental_spark.operators.lifecycle import (
        mark_inactive_from_refresh,
        upsert_properties,
    )
    from fundamental_spark.tableformat import Warehouse

    wh_root = f"{args.warehouse}/{job_type}_{city}"
    props = Warehouse(spark, f"{args.warehouse}/props")

    if job_type == "hulls":
        # rebuild hulls from the accumulated district_points table (the
        # reference reads its district points from the DB the same way,
        # district.go:60-90); nothing geocoded yet -> skip, like a fresh
        # deployment's first 00:30 tick
        from fundamental_spark.operators.geo import dedup_points, district_hulls

        if not props.exists("district_points"):
            return {"job": job_type, "skipped": "no district points yet"}
        hulls = district_hulls(dedup_points(props.read("district_points")))
        props.overwrite("district_hulls", hulls)
        return {"job": job_type, "districts": hulls.count()}

    mode = "refresh" if job_type == "refresh" else "crawl"
    runner = CrawlRunner(
        spark=spark,
        warehouse_root=wh_root,
        web=web,
        spider_type="sold" if job_type == "sold" else "active",
        mode=mode,
        max_pages=args.max_pages,
    )
    runner.init([(site.search_url(city, 1), city)])
    waves = runner.run()
    out = {"job": job_type, "city": city, "waves": waves}
    if mode == "refresh":
        refreshed = runner.table("refreshed_urls")
        if props.exists("properties"):
            out["marked_inactive"] = mark_inactive_from_refresh(
                props, refreshed, wave=runner.wave
            )
        out["refreshed_urls"] = refreshed.count()
    else:
        docs = runner.table("documents")
        items = extract_items(docs)
        if job_type == "sold":
            items = items.withColumn("status", F.lit("sold"))
        upsert_properties(props, items, wave=runner.wave)
        out["documents"] = docs.count()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--cities", nargs="+", default=["amsterdam", "utrecht"])
    ap.add_argument("--listings-per-city", type=int, default=20)
    ap.add_argument("--page-size", type=int, default=10)
    ap.add_argument("--max-pages", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--weekday", type=int, default=0, help="Go weekday: Sunday=0")
    ap.add_argument("--hours", type=int, nargs="+", default=[0],
                    help="which hours of the simulated day to tick")
    ap.add_argument("--max-jobs", type=int, default=0, help="0 = unlimited")
    args = ap.parse_args()

    from fundamental_spark.crawl.schedule import jobs_at
    from fundamental_spark.session import get_spark
    from fundamental_spark.synth.site import build_site, web_rows

    spark = get_spark("fundamental-scheduler")
    site = build_site(
        seed=args.seed,
        cities=tuple(args.cities),
        listings_per_city=args.listings_per_city,
        page_size=args.page_size,
    )
    web = spark.createDataFrame(web_rows(site), "url string, html string")

    executed = []
    for hour in args.hours:
        for minute in (0, 30):
            for job_type, city in jobs_at(args.weekday, hour, minute, args.cities):
                if args.max_jobs and len(executed) >= args.max_jobs:
                    break
                res = execute_job(spark, job_type, city, args, web, site)
                res.update({"weekday": args.weekday, "hour": hour, "minute": minute})
                executed.append(res)
                print(json.dumps(res), flush=True)
    print(json.dumps({"total_jobs": len(executed)}), flush=True)


if __name__ == "__main__":
    main()
