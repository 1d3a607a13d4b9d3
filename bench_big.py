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
                 "packing_stats", "train_split_stats", "pii_stats"]


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


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    crawl_only = "--crawl-only" in sys.argv
    dedup_only = "--dedup-only" in sys.argv

    from fundamental_spark.session import get_spark

    spark = get_spark(
        "fundamental-spark-bench-big",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("FS_BENCH_SHUFFLE", "64")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"replicas": REPLICAS, "cpus": cpus, "src": src_dir}

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
