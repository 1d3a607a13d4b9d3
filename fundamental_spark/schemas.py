"""Engine schemas.

Shapes come from the reference data model (SURVEY.md §1) and from
BASELINE.json's ``input_hint``:

- ``documents``: interleaved text + media span sequences per page —
  (doc_id, spans:array<struct<kind,text,media_ref,offset>>). The
  reference parses detail pages *in place* (funda_spider.py:188-453);
  we materialize the page as an order-preserved span array first and
  project fields from it.
- ``properties``: the fact table (server/internal/database/database.go:390-413).
- ``frontier`` / ``url_seen`` / lineage: the crawl state the reference
  keeps as Scrapy queues + an in-memory-and-SQLite URL set
  (funda_spider.py:35,46; database.py:37-51).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# BASELINE.json input_hint: spans:array<struct<kind,text,media_ref,offset:int32>>
SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),        # 'text' | 'media'
        StructField("text", StringType()),        # NULL for media spans
        StructField("media_ref", StringType()),   # NULL for text spans
        StructField("offset", IntegerType()),     # 0-based, order-preserved
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),      # canonical listing URL
        StructField("spans", ArrayType(SPAN_TYPE)),
        StructField("wave", IntegerType()),       # micro-batch that fetched it
        StructField("fetched_at_wave_ts", LongType()),  # deterministic wave-derived ts
    ]
)

# server/internal/database/database.go:390-413 (types mapped per SURVEY.md §1.2)
PROPERTIES_SCHEMA = StructType(
    [
        StructField("url", StringType(), nullable=False),  # natural key (UNIQUE)
        StructField("url_hash", LongType()),
        StructField("street", StringType()),
        StructField("neighborhood", StringType()),
        StructField("property_type", StringType()),
        StructField("city", StringType()),
        StructField("postal_code", StringType()),
        StructField("price", LongType()),
        StructField("year_built", IntegerType()),
        StructField("living_area", IntegerType()),
        StructField("num_rooms", IntegerType()),
        StructField("status", StringType()),      # active|inactive|republished|sold
        StructField("listing_date", DateType()),
        StructField("selling_date", DateType()),
        StructField("energy_label", StringType()),
        StructField("republish_count", IntegerType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("geocoding_attempted", BooleanType()),
        StructField("scraped_at", TimestampType()),
    ]
)

# append-only lineage log (database.go:420-429)
PROPERTY_HISTORY_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", StringType()),
        StructField("price", LongType()),
        StructField("listing_date", DateType()),
        StructField("wave", IntegerType()),
    ]
)

# Crawl frontier. Priorities (SURVEY.md §1.1/4): 1 = new-listing detail fetch,
# 2 = detail refresh, 3 = pagination discovery. State machine:
# pending -> fetched | failed(attempt<retries -> pending again) | dropped.
FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), nullable=False),
        StructField("url_hash", LongType()),
        StructField("domain_shard", IntegerType()),
        StructField("priority", IntegerType()),
        StructField("wave_enqueued", IntegerType()),
        StructField("page_pos", IntegerType()),   # on-page position (crawl-order key)
        StructField("kind", StringType()),        # 'search' | 'detail'
        StructField("attempt", IntegerType()),
        StructField("state", StringType()),       # pending | fetched | dropped
    ]
)

URL_SEEN_SCHEMA = StructType(
    [
        StructField("url", StringType(), nullable=False),
        StructField("url_hash", LongType()),
        StructField("domain_shard", IntegerType()),
        StructField("first_seen_wave", IntegerType()),
    ]
)

# per-wave metrics/lineage (reference crawl-run stats funda_spider.py:530-537)
WAVE_METRICS_SCHEMA = StructType(
    [
        StructField("wave", IntegerType()),
        StructField("pages_fetched", LongType()),
        StructField("new_listing_urls", LongType()),
        StructField("items_parsed", LongType()),
        StructField("shard_counts", StringType()),  # json map shard->fetches (skew evidence)
    ]
)
