#!/usr/bin/env python
"""JVM-only DRAM-bandwidth calibration for the scaling windows.

Measures a pure-JVM string-heavy stage (regex extract + aggregate over
~50 KB synthetic page bodies — the crawl's per-page working set, NO
Python workers, NO shuffle of the bodies) at two core counts in fresh
subprocesses. If this stage stops scaling between the core counts, the
box's memory bandwidth — not the pipeline — is the binding resource in
that window; a real executor scale-up multiplies private DRAM per node.

Prints one JSON line: {"legs": {cores: sec}, "jvm_scaling_efficiency": e}
Usage: python bench_jvm_calib.py [--cores 8,32] [--pages 120000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
cores, pages = int(sys.argv[1]), int(sys.argv[2])
from fundamental_spark.session import get_spark
spark = get_spark("jvm-calib", master=f"local[{cores}]",
                  shuffle_partitions=max(cores, 8))
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
# ~50KB body per row, JVM-generated (repeat/concat), deterministic
base = spark.range(pages).select(
    F.col("id"),
    F.concat(
        F.lit("<html><body>"),
        F.repeat(
            F.concat(F.lit("woord"), (F.col("id") % 977).cast("string"), F.lit(" ")),
            4000,
        ),
        F.lit("Energielabel: B Vraagprijs: "), (F.col("id") % 900000 + 100000).cast("string"),
        F.lit(" Woonoppervlakte: "), (F.col("id") % 200 + 40).cast("string"),
        F.lit(" m2</body></html>"),
    ).alias("html"),
)
def q_of(df):
    return df.select(
        F.regexp_extract("html", r"Vraagprijs: (\d+)", 1).cast("long").alias("price"),
        F.regexp_extract("html", r"Woonoppervlakte: (\d+)", 1).cast("long").alias("area"),
        F.length("html").alias("n"),
    ).agg(F.sum("price"), F.sum("area"), F.sum("n"))
# warm-up on a 10x-smaller DISTINCT plan (codegen/JIT warm, no shuffle
# reuse — re-collecting the same plan would reuse its materialized
# shuffle stage and measure nothing)
q_of(base.limit(pages // 10)).collect()
t0 = time.perf_counter()
q_of(base).collect()
print(json.dumps({"cores": cores, "sec": round(time.perf_counter() - t0, 2)}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--pages", type=int, default=120_000)
    args = ap.parse_args()
    cores = [int(c) for c in args.cores.split(",")]
    legs = {}
    for c in cores:
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(c), str(args.pages)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        legs[c] = json.loads(out.stdout.strip().splitlines()[-1])["sec"]
        print(f"local[{c}]: {legs[c]}s", flush=True)
    a, b = cores[0], cores[-1]
    eff = round((legs[a] / legs[b]) / (b / a), 3)
    print(json.dumps({"legs": legs, "jvm_scaling_efficiency": eff}))


if __name__ == "__main__":
    main()
