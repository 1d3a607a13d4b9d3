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
                 "dedup_ngram_jaccard"]


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

    print(json.dumps(result))


if __name__ == "__main__":
    main()
