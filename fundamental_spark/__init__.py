"""fundamental_spark — a PySpark-native rebuild of BattermanZ/FundaMental.

A distributed URL-frontier + fetch scheduler (crawl tier) plus the full
analytics workload the reference computes, re-expressed Spark-first:
DataFrame/SQL plans optimized by Catalyst, vectorized pandas/Arrow UDFs
for extraction, and a parquet-backed table shim with MERGE semantics
standing in for Iceberg when the runtime jar is unavailable.

Reference (read-only, public): /root/reference — Scrapy spiders + Go
orchestrator + SQLite analytics. We reproduce its *capabilities*, not
its machinery.
"""

__version__ = "0.1.0"
