#!/usr/bin/env python
"""spark-submit entry: run registered analytics queries.

  spark-submit --py-files dist/fundamental_spark.zip jobs/analytics.py \\
      --sf-dir /root/testdata/sf0.01 --queries pricing_summary group_median

Omit --queries to run every registered query; add --explain to print
the formatted physical plan instead of executing.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    from fundamental_spark.queries import SPARK_QUERIES
    from fundamental_spark.session import get_spark

    spark = get_spark("fundamental-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries or sorted(SPARK_QUERIES)
    out = {}
    for name in names:
        df = SPARK_QUERIES[name](spark, args.sf_dir)
        if args.explain:
            print(f"=== {name} ===")
            df.explain("formatted")
            continue
        t0 = time.perf_counter()
        out[name] = {"rows": df.count(), "sec": round(time.perf_counter() - t0, 3)}
    if not args.explain:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
