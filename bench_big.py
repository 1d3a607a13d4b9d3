#!/usr/bin/env python
"""Big-scale bench leg: the sf0.1 suite at 10x (a synthetic "sf1").

Purpose (BENCH/BASELINE.md): pin that the LSH-vs-exact crossovers and
per-wave crawl flatness measured at sf0.1 still hold an order of
magnitude up, where a wrong plan would blow up quadratically.

- Dedup corpus: sf0.1's documents replicated 10x with a per-replica
  token suffix (regexp_replace '(\\S+)' -> '$1r<k>'), making replicas
  DISJOINT in shingle space — duplicate structure (and therefore the
  true pair set) scales exactly linearly, so any super-linear runtime
  is the algorithm's fault, not the data's. Deterministic, no RNG.
- Crawl: the bench.py synthetic frontier at sf=1.0 sizing (400 cities
  x 300 listings = 120k listings), executor-side page rendering.

Prints ONE JSON line. Not part of the driver's per-round bench
(bench.py); run manually: python bench_big.py [--crawl-only|--dedup-only]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

BIG_DIR = os.environ.get("FS_BIG_DIR", "/tmp/fs_sf1")
REPLICAS = int(os.environ.get("FS_BIG_REPLICAS", "10"))
DEDUP_QUERIES = ["dedup_exact", "dedup_winnow", "dedup_minhash_lsh",
                 "dedup_ngram_jaccard",
                 # assembly tier (round 4): 10x growth evidence
                 "gopher_repetition", "benchmark_contamination",
                 "packing_stats", "train_split_stats", "pii_stats",
                 # round-5 corpus ops: 10x growth evidence
                 "dup_span_stats", "gopher_quality", "lm_fluency_buckets",
                 "dsir_weights", "training_order"]


def build_big_documents(spark, src_dir: str) -> str:
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{src_dir}/documents.parquet")
    parts = []
    for k in range(REPLICAS):
        parts.append(
            src.select(
                F.concat(F.col("doc_id"), F.lit(f"#r{k}")).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1r{k}").alias("text"),
                *[c for c in src.columns if c not in ("doc_id", "text")],
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    out = os.path.join(BIG_DIR, "documents.parquet")
    big.repartition(64).write.mode("overwrite").parquet(out)
    return BIG_DIR


def scheduler_leg(spark, cpus: int) -> dict:
    """One simulated scheduler DAY over the 10x (400-city, 122k-page)
    site under jobs/scheduler.py's cadence twin (r4 verdict #6), in
    batched mode: each tick's per-city jobs of one type collapse into
    one multi-seed distributed drain (job-TYPE order preserved — the
    jobMutex contract granularity). The known-URL set carries across
    ticks, so the 23 hourly active re-crawls fetch only search pages
    until the no-new rule fires — the reference's steady-state day.
    The day's first full crawl (the midnight sold batch) is asserted
    equal, on wave_metrics totals, to a standalone runner drain of the
    same site with the same spider type."""
    import tempfile
    from types import SimpleNamespace

    from fundamental_spark.crawl.runner import CrawlRunner
    from fundamental_spark.synth.site import build_site, spec_web_rows

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from jobs.scheduler import simulate_day_batched

    n_cities, listings = 400, 300
    site = build_site(
        seed=42,
        cities=tuple(f"city{i:03d}" for i in range(n_cities)),
        listings_per_city=listings,
        page_size=50,
        description_words=24,
        render_details=False,
    )
    rows, _ = spec_web_rows(site, description_words=24)
    web = spark.createDataFrame(
        rows, "url string, html string, spec string"
    ).repartition(cpus).cache()
    web.count()

    out: dict = {"cities": n_cities, "listings_per_city": listings}
    std_root = tempfile.mkdtemp(prefix="fs_sched_std_")
    day_root = tempfile.mkdtemp(prefix="fs_sched_day_")
    try:
        # standalone reference drain (sold spider — the day's first job)
        t0 = time.perf_counter()
        std = CrawlRunner(
            spark=spark, warehouse_root=std_root, web=web, spider_type="sold"
        )
        std.init([(site.search_url(c, 1), c) for c in site.cities])
        std.run()
        std_metrics = std.table("wave_metrics").collect()
        out["standalone_sold"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "pages": int(sum(m["pages_fetched"] for m in std_metrics)),
            "new_urls": int(sum(m["new_listing_urls"] for m in std_metrics)),
        }

        args = SimpleNamespace(warehouse=day_root, max_pages=100)
        t0 = time.perf_counter()
        day = simulate_day_batched(spark, args, web, site, weekday=0)
        out["day_sec"] = round(time.perf_counter() - t0, 2)
        out["jobs"] = len(day)
        out["day_pages_total"] = int(
            sum(j.get("pages_fetched", 0) for j in day)
        )
        first_crawl = next(j for j in day if j["job"] == "sold")
        out["midnight_sold"] = {
            "pages": first_crawl["pages_fetched"],
            "new_urls": first_crawl["new_listing_urls"],
        }
        out["matches_standalone"] = (
            first_crawl["pages_fetched"] == out["standalone_sold"]["pages"]
            and first_crawl["new_listing_urls"] == out["standalone_sold"]["new_urls"]
        )
        by_type: dict[str, dict] = {}
        for j in day:
            b = by_type.setdefault(
                j["job"], {"jobs": 0, "pages": 0, "waves": 0}
            )
            b["jobs"] += 1
            b["pages"] += j.get("pages_fetched", 0)
            b["waves"] += j.get("waves", 0)
        out["by_type"] = by_type

        # analytics over the day's ingested table (r4 verdict #9
        # stretch): district medians at the crawl's own 10x scale —
        # the full extract -> bucketed MERGE -> analysis path, timed
        from fundamental_spark.operators.analysis import district_price_medians
        from fundamental_spark.tableformat import Warehouse

        props = Warehouse(spark, f"{day_root}/props")
        t0 = time.perf_counter()
        med = district_price_medians(
            props.read("properties"), as_of="2024-06-01"
        )
        n_districts = med.count()
        out["district_medians"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "districts": int(n_districts),
            "properties": int(props.read("properties").count()),
        }
    finally:
        shutil.rmtree(std_root, ignore_errors=True)
        shutil.rmtree(day_root, ignore_errors=True)
        web.unpersist()
    return out


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    crawl_only = "--crawl-only" in sys.argv
    dedup_only = "--dedup-only" in sys.argv
    scheduler_only = "--scheduler-only" in sys.argv

    from fundamental_spark.session import get_spark

    spark = get_spark(
        "fundamental-spark-bench-big",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("FS_BENCH_SHUFFLE", "64")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"replicas": REPLICAS, "cpus": cpus, "src": src_dir}

    if scheduler_only:
        result["scheduler"] = scheduler_leg(spark, cpus)
        print(json.dumps(result))
        return

    if not dedup_only:
        import bench

        os.environ.setdefault("FS_BENCH_EXEC_RENDER", "1")
        result["crawl"] = bench.crawl_bench(spark, sf=1.0, cpus=cpus)

    if not crawl_only:
        from fundamental_spark.queries import SPARK_QUERIES

        big = build_big_documents(spark, src_dir)
        n = spark.read.parquet(f"{big}/documents.parquet").count()
        result["n_docs"] = n
        timings: dict[str, dict] = {}
        for name in DEDUP_QUERIES:
            t0 = time.perf_counter()
            rows = SPARK_QUERIES[name](spark, big).count()
            timings[name] = {
                "sec": round(time.perf_counter() - t0, 2),
                "rows": rows,
            }
        result["dedup"] = timings
        shutil.rmtree(BIG_DIR, ignore_errors=True)

        # near-dup-heavy leg: the regime real crawl corpora live in.
        # 1000 source docs x 10 replicas, each replica = the source text
        # plus 3 replica-unique trailing tokens -> replicas share ALL
        # source shingles (jaccard ~ S/(S+6), well above threshold).
        # Shingle document frequency rises 10x, so the exact inverted-
        # index join pays (10 x df)^2 per shingle (~100x) while
        # MinHash-LSH pays per-candidate only — the crossover that makes
        # LSH the 100 TB path.
        result["neardup"] = neardup_leg(spark, src_dir)
        result["boilerplate"] = boilerplate_leg(spark, src_dir)

    if not crawl_only and not dedup_only:
        result["scheduler"] = scheduler_leg(spark, cpus)

    print(json.dumps(result))


def neardup_leg(spark, src_dir: str, n_src: int = 1000) -> dict:
    from pyspark.sql import functions as F

    from fundamental_spark.queries import SPARK_QUERIES

    src = (
        spark.read.parquet(f"{src_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(n_src)
    )
    parts = []
    for k in range(REPLICAS):
        parts.append(
            src.select(
                F.concat(F.col("doc_id"), F.lit(f"#n{k}")).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(f" uq{k}a uq{k}b uq{k}c")
                ).alias("text"),
                *[c for c in src.columns if c not in ("doc_id", "text")],
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    out_dir = os.path.join(BIG_DIR + "_neardup", "")
    out = os.path.join(out_dir, "documents.parquet")
    big.repartition(64).write.mode("overwrite").parquet(out)
    timings: dict[str, dict] = {"n_docs": n_src * REPLICAS}
    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard"):
        t0 = time.perf_counter()
        rows = SPARK_QUERIES[name](spark, out_dir.rstrip("/")).count()
        timings[name] = {
            "sec": round(time.perf_counter() - t0, 2),
            "rows": rows,
        }
    # verify-plan A/B (round-5, r4 verdict #8): the same registered
    # operating point with the interpreted long-array intersect vs the
    # codegen explode-join count — outputs must be identical; the auto
    # switch picks 'join' at dense candidate volumes based on this.
    from fundamental_spark.operators.dedup import minhash_lsh_pairs

    docs_df = spark.read.parquet(out)
    for plan in ("array", "join"):
        t0 = time.perf_counter()
        rows = minhash_lsh_pairs(
            docs_df, threshold=0.1, k=64, bands=16,
            allow_low_recall=True, verify_plan=plan,
        ).count()
        timings[f"minhash_verify_{plan}"] = {
            "sec": round(time.perf_counter() - t0, 2), "rows": rows,
        }
    shutil.rmtree(out_dir, ignore_errors=True)
    return timings


def boilerplate_leg(spark, src_dir: str, n_src: int = 1000) -> dict:
    """The regime that makes MinHash-LSH the web-scale plan: every page
    shares a small boilerplate block (nav/footer text — universal in
    crawl corpora). Its shingles have df = n, so the exact inverted-
    index join materializes df² = n² intermediate rows PER boilerplate
    shingle (4 x 10^8 here; quadratic in corpus size), while the LSH
    signature treats boilerplate as 4 more shingles per doc and its
    banded candidates stay proportional to TRUE near-dup pairs (the
    boilerplate lifts the jaccard floor to ~0.04, under threshold)."""
    from pyspark.sql import functions as F

    from fundamental_spark.queries import SPARK_QUERIES

    src = (
        spark.read.parquet(f"{src_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(n_src)
    )
    boiler = " funda nl alle rechten voorbehouden 2024"  # 6 tokens -> 4 shingles
    parts = []
    for k in range(REPLICAS):
        parts.append(
            src.select(
                F.concat(F.col("doc_id"), F.lit(f"#b{k}")).alias("doc_id"),
                F.concat(
                    F.regexp_replace(F.col("text"), r"(\S+)", f"$1b{k}"),
                    F.lit(boiler),
                ).alias("text"),
                *[c for c in src.columns if c not in ("doc_id", "text")],
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    out_dir = os.path.join(BIG_DIR + "_boiler", "")
    out = os.path.join(out_dir, "documents.parquet")
    big.repartition(64).write.mode("overwrite").parquet(out)
    timings: dict[str, dict] = {"n_docs": n_src * REPLICAS}
    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard"):
        t0 = time.perf_counter()
        rows = SPARK_QUERIES[name](spark, out_dir.rstrip("/")).count()
        timings[name] = {
            "sec": round(time.perf_counter() - t0, 2),
            "rows": rows,
        }
    # winnow capped (the registered max_fp_df=64 boilerplate guard,
    # round 4) vs uncapped (pure MOSS): the final winnow window of the
    # shared footer selects the SAME min-hash in every document, so the
    # uncapped fingerprint index carries a df=n fingerprint and the
    # join materializes n²/2 rows from it — the round-3 hot-key blowup
    # this leg exists to demonstrate.
    from fundamental_spark.operators.dedup import winnow_pairs

    docs_df = spark.read.parquet(out)
    t0 = time.perf_counter()
    rows = SPARK_QUERIES["dedup_winnow"](spark, out_dir.rstrip("/")).count()
    timings["dedup_winnow_capped"] = {
        "sec": round(time.perf_counter() - t0, 2), "rows": rows,
    }
    t0 = time.perf_counter()
    rows = winnow_pairs(docs_df, min_shared=2).count()
    timings["dedup_winnow_uncapped"] = {
        "sec": round(time.perf_counter() - t0, 2), "rows": rows,
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    return timings


if __name__ == "__main__":
    main()
