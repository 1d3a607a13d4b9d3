#!/usr/bin/env python
"""Extra benchmarks (round 7) — NOT part of the frozen driver surface.

Noop-sink isolation per the optimization guide §1.4: times the full
computation of any registered query with

    df.write.format("noop").mode("overwrite").save()

so every column of every row is computed and discarded — no sink cost,
no count-triggered column pruning. ``bench.py`` (frozen) remains the
driver-measured surface; this file exists so OPTIMIZATION_r07.md can
cite sink-independent per-query numbers and repeats.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 \
    python bench_extra.py [--reps N] query [query ...]
    python bench_extra.py --reps 3 all          # every headline query
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = [a for a in sys.argv[1:]]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    from bench import HEADLINE_QUERIES
    from fundamental_spark.queries import SPARK_QUERIES
    from fundamental_spark.session import get_spark

    names = HEADLINE_QUERIES if args == ["all"] else args
    spark = get_spark(
        "fundamental-spark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("FS_BENCH_SHUFFLE", max(cpus, 16))),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"noop: {name}")
            t0 = time.perf_counter()
            SPARK_QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "noop_secs": out}))


if __name__ == "__main__":
    main()
