"""Wave-driven crawl runner: the distributed twin of the Scrapy spider.

One **wave** = one micro-batch over the frontier (SURVEY.md §2.8 T1):

  pending frontier rows
    → politeness budget (canonical-order top-k per domain)
    → distributed fetch (join against the synthetic web table; a real
      deployment swaps in the mapInPandas HTTP fetcher, fetch.py)
    → search pages parsed JVM-side → candidate listing URLs
    → two-stage seen-set filter (bloom prefilter + exact anti-join)
    → new detail rows + next-page rows enqueued
    → detail pages parsed into interleaved span sequences (Arrow UDF)
      → documents table
    → lineage: crawl_log + per-wave metrics (incl. per-shard fetch
      counts — the skew evidence for the salted single-host key)

Sequential-pagination semantics are preserved *structurally*: page p+1
is only discovered while parsing page p, so each city has at most one
pending search page per wave — the stop counters (3 consecutive empty
pages, 3/1 consecutive pages without new listings, max_pages;
funda_spider.py:39-42,127-145, funda_spider_sold.py:139-141) update on
a per-seed aggregate that stays O(#cities) regardless of frontier size.

Exact resume (T5): every table write is a new immutable snapshot
(tableformat.py); a wave commits by atomically writing
``checkpoint.json`` pinning each table's snapshot version. A crash
mid-wave leaves the previous checkpoint intact; reopening the runner
replays from the pinned versions, producing a final state identical to
an uninterrupted run (verified by tests/test_resume.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..tableformat import Warehouse
from . import PRIORITY_DETAIL, PRIORITY_PAGINATION, PRIORITY_REFRESH, PRIORITY_SEED
from .canonical import DEFAULT_N_SHARDS, with_url_keys
from .parse import parse_search_pages
from .politeness import PolitenessConfig, select_wave
from .seen import filter_new_urls

# F3 (funda_spider.py:88-90,190-192): a 200 DETAIL response whose body
# carries the bot-verification interstitial is DROPPED permanently —
# parse_house returns without yielding and Scrapy retries only the HTTP
# codes in RETRY_HTTP_CODES, so no retry. A blocked SEARCH page is NOT
# dropped: the reference's parse() only checks the marker in the detail
# parsers, so an interstitial search page flows through as a page with
# zero listings — the empty-page counter and the manual ?page=N
# fallback handle it. (Only this one marker appears in the reference.)
BLOCK_MARKERS = ("Je bent bijna op de pagina die je zoekt",)


FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType()),
        StructField("domain", StringType()),
        StructField("domain_shard", IntegerType()),
        StructField("kind", StringType()),               # 'search' | 'detail'
        StructField("priority", IntegerType()),
        StructField("city", StringType()),
        StructField("page_idx", IntegerType()),          # search: its page number; detail: page found on
        StructField("discovered_on_page", IntegerType()),
        StructField("page_pos", IntegerType()),
        StructField("wave_enqueued", IntegerType()),
        StructField("attempt", IntegerType()),
        StructField("state", StringType()),              # pending | fetched | failed | dropped
    ]
)

URL_SEEN_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType()),
        StructField("domain_shard", IntegerType()),
        StructField("first_seen_wave", IntegerType()),
    ]
)

DOCUMENTS_SCHEMA_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "wave int, city string, discovered_on_page int, page_pos int"
)

CRAWL_LOG_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("kind", StringType()),
        StructField("city", StringType()),
        StructField("discovered_on_page", IntegerType()),
        StructField("priority", IntegerType()),
        StructField("page_pos", IntegerType()),
        StructField("wave_fetched", IntegerType()),
    ]
)

RESPONSE_CACHE_SCHEMA_DDL = "url string, html string, wave int"

REFRESHED_URLS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("city", StringType()),
        StructField("found_on_page", IntegerType()),
        StructField("wave", IntegerType()),
    ]
)

WAVE_METRICS_SCHEMA = StructType(
    [
        StructField("wave", IntegerType()),
        StructField("pages_fetched", LongType()),
        StructField("search_pages", LongType()),
        StructField("detail_pages", LongType()),
        StructField("new_listing_urls", LongType()),
        StructField("shard_counts", StringType()),
    ]
)


@dataclass
class CityState:
    city: str
    consecutive_empty: int = 0
    consecutive_no_new: int = 0
    stopped: bool = False


@dataclass
class CrawlRunner:
    spark: SparkSession
    warehouse_root: str
    web: DataFrame                      # synthetic web: (url, html[, fail_until_attempt])
    spider_type: str = "active"         # active: no-new stop at 3; sold: at 1
    # 'crawl' = the full frontier pipeline; 'refresh' = the reference's
    # weekly URL-collection pass (funda_spider.py:455-528): search pages
    # only, looser '/koop/' path filter, NO seen filtering, NO detail
    # fetches, NO stop counters and NO manual pagination fallback —
    # collected URLs land in the refreshed_urls table and feed
    # lifecycle.mark_inactive (scheduler.go:214-254)
    mode: str = "crawl"
    # robots.txt body for the crawled domain (north rule: honor robots
    # + crawl-delay; the reference sets ROBOTSTXT_OBEY=False). When set,
    # disallowed URLs are filtered JVM-side before they ever enter the
    # frontier, and a Crawl-delay raises the politeness delay.
    robots_txt: str | None = None
    # RFC2616-style response cache (funda/settings.py:34-39 HTTPCACHE):
    # fetched bodies append to a response_cache table; subsequent waves
    # (or a seeded fresh crawl) serve hits from it without refetching.
    # Off by default — the reference's own crawl requests set
    # dont_cache=True (funda_spider.py:81 etc.), so the cache is an
    # opt-in, exactly as deployed.
    http_cache: bool = False
    response_cache_seed: DataFrame | None = None
    max_pages: int = 100
    politeness: PolitenessConfig = field(default_factory=PolitenessConfig)
    wave_seconds: float | None = None   # None -> unlimited budget per wave
    use_bloom: bool = True
    bloom_min_seen: int = 200_000      # below this, broadcast exact anti-join wins
    # "bloom" (most compact) or "cuckoo" (deletable — crawl/cuckoo.py);
    # both are strictly prefilters in front of the exact anti-join, so
    # the crawl result is backend-invariant (pinned by test)
    seen_backend: str = "bloom"
    # fold delta snapshots into one base once this many accumulate since
    # the last compaction (Iceberg rewrite_data_files): bounds the
    # per-wave dir listing of url_seen / response_cache at O(compact_every)
    # instead of O(#waves-ever). Amortized rewrite cost per wave is
    # O(table)/compact_every.
    compact_every: int = 64
    # opt-in per-wave near-dup dedup: each wave's documents DELTA
    # probes the STORED minhash band index maintained across waves
    # (operators/dedup.minhash_probe_band_index — the production shape
    # of dedup_minhash_incremental), appends verified pairs to
    # 'neardup_pairs' and its own bands to 'neardup_bands'. Per-wave
    # cost is O(delta), never O(corpus); off by default so the crawl
    # headline bench is unaffected.
    neardup_dedup: bool = False
    neardup_threshold: float = 0.5
    n_shards: int = DEFAULT_N_SHARDS
    state_partitions: int = 4          # small-state snapshot files per commit
    wave: int = 0
    seen_count: int = 0
    city_states: dict[str, CityState] = field(default_factory=dict)
    seed_urls: dict[str, str] = field(default_factory=dict)
    domains: set[str] = field(default_factory=set)
    _versions: dict[str, int] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.wh = Warehouse(self.spark, self.warehouse_root)
        if "fail_until_attempt" not in self.web.columns:
            self.web = self.web.withColumn("fail_until_attempt", F.lit(0))
        # executor-side page rendering: detail rows may ship as compact
        # specs (url, spec) rendered inside the fetch stage — the web at
        # frontier scale never materializes on the driver
        self._has_spec = "spec" in self.web.columns
        if self.robots_txt is not None:
            from .robots import parse_robots

            self._robots = parse_robots(self.robots_txt)
            if self._robots.crawl_delay is not None:
                self.politeness.crawl_delay_s = max(
                    self.politeness.crawl_delay_s, self._robots.crawl_delay
                )
        else:
            self._robots = None
        if os.path.exists(self._ckpt_path()):
            self._load_checkpoint()

    def _robots_filter(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        if self._robots is None:
            return df
        from .robots import allowed_col

        return df.filter(allowed_col(F.col(url_col), self._robots))

    # ---- checkpointing ----------------------------------------------------
    def _ckpt_path(self) -> str:
        return os.path.join(self.warehouse_root, "checkpoint.json")

    def _commit_wave(self) -> None:
        state = {
            "wave": self.wave,
            "spider_type": self.spider_type,
            "seen_count": self.seen_count,
            "seed_urls": self.seed_urls,
            "domains": sorted(self.domains),
            "current_delay_s": self.politeness.current_delay_s,
            "versions": self._versions,
            "cities": {
                c: {
                    "consecutive_empty": s.consecutive_empty,
                    "consecutive_no_new": s.consecutive_no_new,
                    "stopped": s.stopped,
                }
                for c, s in self.city_states.items()
            },
        }
        tmp = self._ckpt_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._ckpt_path())

    def _load_checkpoint(self) -> None:
        with open(self._ckpt_path()) as f:
            state = json.load(f)
        self.wave = state["wave"]
        self.seen_count = state.get("seen_count", 0)
        self.seed_urls = state.get("seed_urls", {})
        self.domains = set(state.get("domains", []))
        if state.get("current_delay_s") is not None:
            self.politeness.current_delay_s = state["current_delay_s"]
        self._versions = state["versions"]
        # prune snapshots newer than the pinned versions (mid-wave crash
        # leaves orphan data commits without a checkpoint commit)
        for name, v in self._versions.items():
            self.wh.rollback(name, v)
        self.city_states = {
            c: CityState(city=c, **v) for c, v in state["cities"].items()
        }

    DELTA_TABLES = (
        "url_seen",
        "documents",
        "crawl_log",
        "wave_metrics",
        "refreshed_urls",
        "frontier_done",
        "response_cache",
        "neardup_bands",
        "neardup_pairs",
    )

    def _read(self, name: str) -> DataFrame:
        return self.wh.read(name, version=self._versions[name])

    def _read_deltas(self, name: str) -> DataFrame:
        return self.wh.read_deltas(name, version=self._versions[name])

    SMALL_TABLES = (
        "frontier_pending",
        "frontier_done",
        "url_seen",
        "crawl_log",
        "wave_metrics",
    )

    def _write(self, name: str, df: DataFrame) -> None:
        if name in self.SMALL_TABLES:
            # repartition (not coalesce): keeps upstream join parallelism,
            # bounds snapshot file counts
            df = df.repartition(self.state_partitions)
        self._versions[name] = self.wh.overwrite(name, df)

    def _append_delta(self, name: str, df: DataFrame) -> None:
        if name in self.SMALL_TABLES:
            df = df.repartition(self.state_partitions)
        self._versions[name] = self.wh.append_delta(name, df)

    # ---- initialization ----------------------------------------------------
    def init(
        self,
        seeds: list[tuple[str, str]],
        existing_urls: list[str] | DataFrame | None = None,
    ) -> None:
        """seeds: [(seed_search_url, city)]; existing_urls: pre-seen set
        (the DB-backed set, funda_spider.py:46) — a driver-side list or,
        at scale, a one-column DataFrame of urls that never touches the
        driver."""
        spark = self.spark
        seed_prio = PRIORITY_REFRESH if self.mode == "refresh" else PRIORITY_SEED
        seed_rows = [
            (url, "search", seed_prio, city, 1, 0, 0, 0, "pending")
            for (url, city) in seeds
        ]
        seed_df = spark.createDataFrame(
            seed_rows,
            "url string, kind string, priority int, city string, page_idx int, "
            "discovered_on_page int, page_pos int, attempt int, state string",
        )
        frontier = self._robots_filter(
            with_url_keys(seed_df, n_shards=self.n_shards)
            .withColumn("wave_enqueued", F.lit(0))
            .select(*[f.name for f in FRONTIER_SCHEMA.fields])
        )
        # frontier state is SPLIT: 'frontier_pending' holds only rows
        # still to fetch (rewritten per wave — O(pending)); rows that
        # reach a terminal state append once to the 'frontier_done' log
        # and are never rewritten. The old single-table design rewrote
        # the entire (monotonically growing) frontier every wave —
        # O(total history) I/O per wave, the #1 scale debt flagged in
        # round 1.
        inits = [("frontier_pending", frontier)]

        if isinstance(existing_urls, DataFrame):
            # init() is a RESET that drops every table under the
            # warehouse root below — but the natural at-scale source
            # for existing_urls is a PREVIOUS run's url_seen table in
            # that same root, whose files the drop loop would delete
            # before this lazy plan is evaluated by the bootstrap
            # snapshot. Materialize the snapshot eagerly (executor
            # block storage, lineage truncated) so the seen set is
            # pinned before anything is dropped.
            seen_src = existing_urls.select(
                F.col(existing_urls.columns[0]).alias("url")
            ).localCheckpoint(eager=True)
        else:
            seen_src = spark.createDataFrame(
                [(u,) for u in (existing_urls or [])], "url string"
            )
        seen = (
            with_url_keys(seen_src, n_shards=self.n_shards)
            .withColumn("first_seen_wave", F.lit(-1))
            .select(*[f.name for f in URL_SEEN_SCHEMA.fields])
        )
        inits += [
            ("frontier_done", spark.createDataFrame([], FRONTIER_SCHEMA)),
            ("url_seen", seen),
            ("documents", spark.createDataFrame([], DOCUMENTS_SCHEMA_DDL)),
            ("crawl_log", spark.createDataFrame([], CRAWL_LOG_SCHEMA)),
            ("wave_metrics", spark.createDataFrame([], WAVE_METRICS_SCHEMA)),
            ("refreshed_urls", spark.createDataFrame([], REFRESHED_URLS_SCHEMA)),
        ]
        if self.neardup_dedup:
            inits += [
                (
                    "neardup_bands",
                    spark.createDataFrame(
                        [], "doc string, band_idx int, band_hash string"
                    ),
                ),
                (
                    "neardup_pairs",
                    spark.createDataFrame(
                        [], "doc_a string, doc_b string, jaccard double, wave int"
                    ),
                ),
            ]
        if self.http_cache:
            cache0 = (
                self.response_cache_seed.select("url", "html").withColumn(
                    "wave", F.lit(0)
                )
                if self.response_cache_seed is not None
                else spark.createDataFrame([], RESPONSE_CACHE_SCHEMA_DDL)
            )
            inits.append(("response_cache", cache0))
        # init is a RESET: the scheduler reuses one warehouse root
        # across ticks, and delta tables union EVERY snapshot since the
        # floor — a leftover run's rows would leak into read_deltas (a
        # reused root reported the previous run's wave_metrics/documents
        # as this run's). Drop the table dirs (and any stale checkpoint
        # pins) before the bootstrap snapshots.
        self._versions = {}
        for name, _ in inits:
            self.wh.drop(name)
        if not self.http_cache:
            self.wh.drop("response_cache")
        if not self.neardup_dedup:
            self.wh.drop("neardup_bands")
            self.wh.drop("neardup_pairs")
        # ...and the scalar state a stale checkpoint may have restored
        # in __init__ (bloom sizing hint, AutoThrottle delay)
        self.seen_count = 0
        self.politeness.current_delay_s = None  # re-derives lazily
        # bootstrap snapshots are independent: commit them concurrently
        # (same driver-thread trick as the per-wave writes) — the serial
        # version cost ~7 scheduling round-trips of pure fixed overhead
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(inits)) as ex:
            futures = [ex.submit(self._write, name, df) for (name, df) in inits]
            for fu in futures:
                fu.result()
        self.city_states = {city: CityState(city=city) for (_, city) in seeds}
        # base search URL per city — the manual ?page=N pagination
        # fallback (funda_spider.py:172-184) appends to this
        self.seed_urls = {city: url for (url, city) in seeds}
        import re as _re

        self.domains = {
            m.group(1)
            for (url, _) in seeds
            if (m := _re.match(r"^https?://([^/]+)/", url))
        }
        self.wave = 0
        self._commit_wave()

    # ---- one wave ----------------------------------------------------------
    def step(self) -> bool:
        """Advance one wave. Returns False when the frontier is drained."""
        debug = bool(os.environ.get("FS_CRAWL_DEBUG"))
        timings: dict[str, float] = {}
        _t = time.perf_counter()

        def mark(phase: str) -> None:
            nonlocal _t
            if debug:
                now = time.perf_counter()
                timings[phase] = round(now - _t, 2)
                _t = now

        wave = self.wave + 1
        pending = self._read("frontier_pending")
        url_seen = self._read_deltas("url_seen")

        budget = (
            None
            if self.wave_seconds is None
            else self.politeness.wave_budget(self.wave_seconds)
        )
        selected = select_wave(
            pending, budget, n_domains=max(len(self.domains), 1)
        ).cache()
        # Skip the per-wave isEmpty driver round-trip when the PREVIOUS
        # wave's stats proved the frontier non-empty (exact accounting:
        # with no politeness budget selected == pending, untouched == 0,
        # and the enqueued count = retry-pending + pagination + detail
        # rows is known driver-side — see the `_next_nonempty` update
        # below). The flag is consumed here and only ever set True on
        # that exact evidence; resume/budgeted waves leave it None and
        # pay the check (round 7 — ~0.15 s/wave of fixed driver latency
        # on the measured path).
        known_nonempty = getattr(self, "_next_nonempty", None) is True
        self._next_nonempty = None
        if not known_nonempty and selected.isEmpty():
            selected.unpersist()
            return False
        mark("select")

        # one fetch join per wave; the cache is columnar so bookkeeping
        # scans that don't select `html` never deserialize the payload
        # explicit repartition: AQE's size-based coalescing sees only the
        # (small) pre-render spec/html bytes at the join and would collapse
        # the size-expanding render+parse UDFs onto a handful of tasks
        src = selected
        if self.http_cache:
            cache = self._read_deltas("response_cache").select(
                "url", F.col("html").alias("_cached_html")
            )
            src = src.join(cache, "url", "left")
        else:
            src = src.withColumn("_cached_html", F.lit(None).cast("string"))
        fetched = (
            src.join(self.web, "url", "left")
            .repartition(self.spark.sparkContext.defaultParallelism)
            .withColumn("html", F.coalesce(F.col("_cached_html"), F.col("html")))
        )
        # spec rows (executor-side rendering) keep their compact spec:
        # render+parse happen FUSED in the documents projection below,
        # so the heavy page body never materializes JVM-side
        has_body = F.col("html").isNotNull()
        if self._has_spec:
            has_body = has_body | F.col("spec").isNotNull()
        blocked = F.lit(False)
        for marker in BLOCK_MARKERS:
            blocked = blocked | F.coalesce(F.col("html").contains(marker), F.lit(False))
        # the blocked-drop applies to detail pages only (see BLOCK_MARKERS)
        blocked = blocked & (F.col("kind") == "detail")
        # outcome classes, matching the reference's Scrapy stack:
        #   fetch_ok  — 200 with a real body
        #   retryable — transient HTTP failure (RETRY_HTTP_CODES); the
        #               synthetic web models these as fail_until_attempt
        #   dropped   — 404 (URL not in the web table) or the bot
        #               interstitial body: permanent, never retried
        fail_until = F.coalesce(F.col("fail_until_attempt"), F.lit(0))
        cache_hit = F.col("_cached_html").isNotNull()
        fetched = (
            fetched.withColumn(
                "fetch_ok",
                has_body
                & ~blocked
                & (cache_hit | (F.col("attempt") >= fail_until)),
            )
            .withColumn(
                "retryable",
                has_body
                & ~blocked
                & ~cache_hit
                & (F.col("attempt") < fail_until),
            )
            .withColumn("cache_hit", cache_hit)
            .cache()
        )
        mark("fetch_join")

        # --- search pages ---------------------------------------------------
        search_ok = fetched.filter((F.col("kind") == "search") & F.col("fetch_ok"))
        # refresh mode uses the looser '/koop/' filter (funda_spider.py:465-477)
        path_filter = "/koop/" if self.mode == "refresh" else "/detail/koop/"
        parsed = parse_search_pages(search_ok, path_filter=path_filter).cache()
        candidates = (
            parsed.select(
                "city",
                F.col("page_idx").alias("discovered_on_page"),
                F.posexplode_outer("listing_urls").alias("page_pos", "cand_url"),
            )
            .filter(F.col("cand_url").isNotNull())
            .withColumnRenamed("cand_url", "url")
        )
        candidates = self._robots_filter(
            with_url_keys(candidates, n_shards=self.n_shards)
        )
        # intra-wave dedup, keeping the canonically-first occurrence.
        # min(struct(...)) instead of a row_number window: the struct
        # min is PARTIAL-aggregable (map-side combine collapses dups
        # before the exchange, no per-url sort), while the window needs
        # a full shuffle+sort of every candidate row. The trailing
        # struct fields (url_hash/domain/shard) are functions of url —
        # identical across dups — so the lexicographic struct order is
        # exactly (city, discovered_on_page, page_pos).
        candidates = (
            candidates.groupBy("url")
            .agg(
                F.min(
                    F.struct(
                        "city", "discovered_on_page", "page_pos",
                        "url_hash", "domain", "domain_shard",
                    )
                ).alias("_s")
            )
            .select("url", "_s.*")
        )
        # bloom prefilter pays for itself only on huge seen sets; below
        # the threshold an exact broadcast anti-join is strictly faster.
        # refresh mode collects ALL found URLs — no seen filtering
        # (collect_active_urls has none, funda_spider.py:488-490)
        if self.mode == "refresh":
            new_cands = candidates.cache()
        else:
            use_bloom_now = self.use_bloom and self.seen_count >= self.bloom_min_seen
            new_cands = filter_new_urls(
                candidates,
                url_seen,
                use_bloom=use_bloom_now,
                seen_count_hint=max(self.seen_count, 1),
                broadcast_seen=not use_bloom_now,
                backend=self.seen_backend,
            ).cache()
        mark("seen_filter_def")

        # --- frontier state transitions (stats-independent) -------------------
        outcome = fetched.select(
            "url",
            F.col("fetch_ok"),
            F.col("retryable"),
            (F.col("attempt") + 1).alias("next_attempt"),
        )
        untouched = pending.join(selected.select("url"), "url", "left_anti")
        transitioned = (
            selected.drop("state", "attempt")
            .join(outcome, "url")
            .withColumn(
                "state",
                F.when(F.col("fetch_ok"), F.lit("fetched"))
                .when(
                    F.col("retryable")
                    & (F.col("next_attempt") <= F.lit(self.politeness.retry_times)),
                    F.lit("pending"),
                )
                .otherwise(F.lit("dropped")),
            )
            .withColumn("attempt", F.col("next_attempt"))
            .select(*[f.name for f in FRONTIER_SCHEMA.fields])
        ).cache()
        # retries stay pending; terminal rows append ONCE to the done log
        done_rows = transitioned.filter(F.col("state") != "pending")

        # --- seen set / refreshed urls ----------------------------------------
        if self.mode == "refresh":
            seen_add = self.spark.createDataFrame([], URL_SEEN_SCHEMA)
            # cross-wave dedup: a URL listed on search pages of several
            # waves (listings shifting between pages) must land in
            # refreshed_urls ONCE, like the reference's active_urls SET
            # (funda_spider.py:488-504) — anti-join against the deltas
            # already appended (intra-wave dedup happened above)
            refreshed = new_cands.select(
                "url",
                "city",
                F.col("discovered_on_page").alias("found_on_page"),
                F.lit(wave).alias("wave"),
            ).join(
                self._read_deltas("refreshed_urls").select("url"), "url", "left_anti"
            )
        else:
            seen_add = new_cands.select(
                "url", "url_hash", "domain_shard", F.lit(wave).alias("first_seen_wave")
            )
            refreshed = self.spark.createDataFrame([], REFRESHED_URLS_SCHEMA)

        # --- documents (detail pages -> interleaved spans) --------------------
        # fused SINK, not a UDF projection (docsink.py): the Python
        # worker renders (spec pages) / receives the body, parses the
        # interleaved spans columnar, and parquet-encodes straight into
        # the snapshot dir. Span bytes cross zero exchanges and never
        # return to the JVM — only a one-row-per-task file manifest
        # does (the Iceberg task-file commit shape). This is what keeps
        # per-page DRAM traffic flat as executors are added.
        detail_ok = fetched.filter((F.col("kind") == "detail") & F.col("fetch_ok"))
        doc_cols = ["url", "html", "city", "discovered_on_page", "page_pos"]
        if self._has_spec:
            doc_cols.insert(1, "spec")
        docs_input = detail_ok.select(*doc_cols)

        def write_docs(name: str, df: DataFrame, _wave: int = wave) -> None:
            from .docsink import (
                SINK_SUMMARY_DDL,
                make_documents_sink,
                write_empty_documents,
            )

            def job(out_dir: str) -> list[str]:
                sink = make_documents_sink(out_dir, _wave, self._has_spec)
                files = [
                    r["file"]
                    for r in df.mapInArrow(sink, SINK_SUMMARY_DDL).collect()
                ]
                if not files:
                    files = [os.path.basename(write_empty_documents(out_dir))]
                return files

            self._versions[name] = self.wh.append_delta_files(name, job)

        # --- lineage ----------------------------------------------------------
        log_rows = fetched.filter(F.col("fetch_ok")).select(
            "url", "kind", "city", "discovered_on_page", "priority", "page_pos",
            F.lit(wave).alias("wave_fetched"),
        )

        # --- phase-1 snapshot commits: everything that does NOT depend on
        # the stop rules launches BEFORE the driver's stats round-trip, so
        # executor work (the heavy documents sink above all) runs UNDER the
        # driver-side collect instead of after it. Driver latency is the
        # non-scaling fraction of a wave; hiding it is a direct N->4N
        # efficiency win. (Spark schedulers are thread-safe; the tables
        # stay independent until the checkpoint pins them together.)
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=8)
        try:
            futures = [
                pool.submit(self._append_delta, "frontier_done", done_rows),
                pool.submit(self._append_delta, "crawl_log", log_rows),
            ]
            if self.mode == "refresh":
                futures.append(pool.submit(self._append_delta, "refreshed_urls", refreshed))
            else:
                futures.append(pool.submit(self._append_delta, "url_seen", seen_add))
                futures.append(pool.submit(write_docs, "documents", docs_input))
            if self.http_cache:
                cache_add = fetched.filter(
                    F.col("fetch_ok") & ~F.col("cache_hit") & F.col("html").isNotNull()
                ).select("url", "html", F.lit(wave).alias("wave"))
                futures.append(pool.submit(self._append_delta, "response_cache", cache_add))
            mark("writes_phase1_submit")

            # --- ONE union-tagged stats job (O(#cities)+O(#shards) rows) ----------
            # All per-wave driver bookkeeping folds into a single collect:
            #   p: per-search-page listing count + next-page url (stop rules)
            #   n: per-page NEW-url count after the seen filter (stop rules)
            #   s: per-shard fetched-page counts (skew lineage, wave_metrics)
            #   t: AutoThrottle ok/retryable tallies (only when throttling)
            #   d: newly seen domains (only when a politeness budget is active)
            # Separate jobs here were the dominant fixed cost per wave — each
            # driver round-trip is wall time that no added executor removes.
            legs = [
                parsed.select(
                    F.lit("p").alias("_t"),
                    F.col("city").alias("k"),
                    F.col("page_idx").alias("i"),
                    F.size(F.col("listing_urls")).alias("n"),
                    F.col("next_page").alias("s"),
                ),
                new_cands.groupBy("city", "discovered_on_page")
                .agg(F.count("*").cast("int").alias("n"))
                .select(
                    F.lit("n").alias("_t"),
                    F.col("city").alias("k"),
                    F.col("discovered_on_page").alias("i"),
                    "n",
                    F.lit(None).cast("string").alias("s"),
                ),
                fetched.filter(F.col("fetch_ok"))
                .groupBy("domain_shard")
                .agg(
                    F.count("*").cast("int").alias("n"),
                    F.count(F.when(F.col("kind") == "search", 1)).cast("int").alias("ns"),
                )
                .select(
                    F.lit("s").alias("_t"),
                    F.col("domain_shard").cast("string").alias("k"),
                    F.col("ns").alias("i"),
                    "n",
                    F.lit(None).cast("string").alias("s"),
                ),
                # r: rows that will STAY pending as retries — one tiny
                # scan of the cached frame; feeds the next wave's
                # isEmpty skip (exact frontier accounting)
                fetched.agg(
                    F.count(
                        F.when(
                            F.col("retryable")
                            & (
                                F.col("attempt") + 1
                                <= F.lit(self.politeness.retry_times)
                            ),
                            1,
                        )
                    )
                    .cast("int")
                    .alias("n")
                ).select(
                    F.lit("r").alias("_t"),
                    F.lit(None).cast("string").alias("k"),
                    F.lit(None).cast("int").alias("i"),
                    "n",
                    F.lit(None).cast("string").alias("s"),
                ),
            ]
            if self.wave_seconds is not None:
                legs.append(
                    new_cands.select("domain")
                    .distinct()
                    .select(
                        F.lit("d").alias("_t"),
                        F.col("domain").alias("k"),
                        F.lit(None).cast("int").alias("i"),
                        F.lit(None).cast("int").alias("n"),
                        F.lit(None).cast("string").alias("s"),
                    )
                )
                if self.politeness.autothrottle:
                    # Only RETRYABLE failures count — permanent misses (a
                    # past-the-end manual-pagination 404, a dropped
                    # interstitial) are not server distress and Scrapy's
                    # AutoThrottle never backs off on them
                    legs.append(
                        fetched.agg(
                            F.count(F.when(F.col("retryable"), 1)).cast("int").alias("i"),
                            F.count(F.when(F.col("fetch_ok"), 1)).cast("int").alias("n"),
                        ).select(
                            F.lit("t").alias("_t"),
                            F.lit(None).cast("string").alias("k"),
                            "i",
                            "n",
                            F.lit(None).cast("string").alias("s"),
                        )
                    )
            stats_df = legs[0]
            for leg in legs[1:]:
                stats_df = stats_df.unionByName(leg)
            stats_rows = stats_df.collect()
            page_stats = {(r["k"], r["i"]): r for r in stats_rows if r["_t"] == "p"}
            new_counts = {(r["k"], r["i"]): r["n"] for r in stats_rows if r["_t"] == "n"}
            shard_counts = {r["k"]: r["n"] for r in stats_rows if r["_t"] == "s"}
            n_retry = next(r["n"] for r in stats_rows if r["_t"] == "r")
            n_search = sum(r["i"] for r in stats_rows if r["_t"] == "s")
            n_new_total = sum(new_counts.values())
            if self.wave_seconds is not None:
                self.domains.update(r["k"] for r in stats_rows if r["_t"] == "d")
                if self.politeness.autothrottle:
                    t = next(r for r in stats_rows if r["_t"] == "t")
                    self.politeness.observe_wave(t["n"], t["i"])
            mark("stats_collect")

            # --- stop rules + pagination enqueue (sequential semantics) ----------
            next_pages: list[tuple[str, str, int]] = []  # (url, city, page_idx)
            for (city, page_idx), r in sorted(page_stats.items()):
                st = self.city_states[city]
                if self.mode == "refresh":
                    # collect_active_urls (funda_spider.py:492-504): no stop
                    # counters, next button ONLY (no manual fallback)
                    if page_idx >= self.max_pages or r["s"] is None:
                        st.stopped = True
                    elif not st.stopped:
                        next_pages.append((r["s"], city, page_idx + 1))
                    continue
                n_listings = r["n"] or 0
                n_new = new_counts.get((city, page_idx), 0)
                if n_listings == 0:
                    st.consecutive_empty += 1
                    if self.spider_type == "active":
                        # the active spider's no-new check also fires on empty
                        # pages (funda_spider.py:139-145 falls through); the
                        # sold spider's fires only on non-empty pages
                        # (funda_spider_sold.py:139-141)
                        st.consecutive_no_new += 1
                else:
                    st.consecutive_empty = 0
                    if n_new == 0:
                        st.consecutive_no_new += 1
                    else:
                        st.consecutive_no_new = 0
                no_new_threshold = 3 if self.spider_type == "active" else 1
                if (
                    st.consecutive_empty >= 3
                    or st.consecutive_no_new >= no_new_threshold
                    or page_idx >= self.max_pages
                ):
                    st.stopped = True
                elif not st.stopped:
                    # next button if present, else the manual ?page=N
                    # construction (funda_spider.py:172-184 — a missing
                    # button never stops the crawl; a past-the-end manual
                    # page 404s and is dropped without retry)
                    nxt = r["s"] or f"{self.seed_urls[city]}&page={page_idx + 1}"
                    next_pages.append((nxt, city, page_idx + 1))

            # --- build new frontier rows -----------------------------------------
            if self.mode == "refresh":
                # no detail fetches in refresh mode — collected URLs go to
                # the refreshed_urls table instead
                detail_rows = self.spark.createDataFrame([], FRONTIER_SCHEMA)
            else:
                detail_rows = new_cands.select(
                    "url",
                    "url_hash",
                    "domain",
                    "domain_shard",
                    F.lit("detail").alias("kind"),
                    F.lit(PRIORITY_DETAIL).alias("priority"),
                    "city",
                    F.col("discovered_on_page").alias("page_idx"),
                    "discovered_on_page",
                    "page_pos",
                    F.lit(wave).alias("wave_enqueued"),
                    F.lit(0).alias("attempt"),
                    F.lit("pending").alias("state"),
                ).select(*[f.name for f in FRONTIER_SCHEMA.fields])
            if next_pages and self._robots is not None:
                import re as _re

                next_pages = [
                    (u, c, p)
                    for (u, c, p) in next_pages
                    if self._robots.allowed(_re.sub(r"^https?://[^/]+", "", u))
                ]
            if next_pages:
                page_prio = (
                    PRIORITY_REFRESH if self.mode == "refresh" else PRIORITY_PAGINATION
                )
                np_df = self.spark.createDataFrame(
                    [
                        (u, "search", page_prio, c, p, p - 1, 0, 0, "pending")
                        for (u, c, p) in next_pages
                    ],
                    "url string, kind string, priority int, city string, page_idx int, "
                    "discovered_on_page int, page_pos int, attempt int, state string",
                )
                np_rows = (
                    with_url_keys(np_df, n_shards=self.n_shards)
                    .withColumn("wave_enqueued", F.lit(wave))
                    .select(*[f.name for f in FRONTIER_SCHEMA.fields])
                )
                detail_rows = detail_rows.unionByName(np_rows)
            # pending frontier = untouched + retryable + newly enqueued rows
            new_pending = (
                untouched
                .unionByName(transitioned.filter(F.col("state") == "pending"))
                .unionByName(detail_rows)
            )
            futures.append(pool.submit(self._write, "frontier_pending", new_pending))
            # exact next-wave emptiness: with no budget, selected ==
            # pending so untouched == 0, and the rebuilt frontier is
            # retries + pagination (+ detail enqueues outside refresh
            # mode). Only this exact evidence may skip next wave's
            # isEmpty; budgeted waves leave None (untouched unknown).
            if budget is None:
                enqueued = n_retry + len(next_pages)
                if self.mode != "refresh":
                    enqueued += n_new_total
                self._next_nonempty = enqueued > 0

            # wave_metrics is ONE row — append it driver-side with pyarrow
            # (tableformat.append_delta_rows): zero Spark jobs, zero
            # scheduling round-trips, identical on-disk shape for readers
            n_pages = sum(shard_counts.values())
            self._versions["wave_metrics"] = self.wh.append_delta_rows(
                "wave_metrics",
                [
                    {
                        "wave": wave,
                        "pages_fetched": n_pages,
                        "search_pages": n_search,
                        "detail_pages": n_pages - n_search,
                        "new_listing_urls": n_new_total,
                        "shard_counts": json.dumps(
                            dict(sorted(shard_counts.items())), separators=(",", ":")
                        ),
                    }
                ],
                WAVE_METRICS_SCHEMA,
            )
            for fu in futures:
                fu.result()
        finally:
            # always reap the pool — including on an exception
            # raised anywhere between the phase-1 submits and the
            # result loop (stats collect, stop rules): a leaked
            # non-daemon worker would keep snapshot writes running
            # unsupervised and block interpreter exit. Checkpoint
            # is only written on full success, so a partial wave
            # rolls back on reopen.
            pool.shutdown(wait=True)
        self.seen_count += n_new_total
        mark("snapshot_writes")

        if self.neardup_dedup and self.mode != "refresh":
            self._neardup_wave(wave)
            mark("neardup")

        self.wave = wave
        self._commit_wave()
        # compact the delta tables that are re-read EVERY wave, up to the
        # version the checkpoint just pinned (never past a durable commit:
        # resume rolls back only to >= the floor, contract kept)
        compact_names = ["url_seen", "response_cache", "refreshed_urls"]
        if self.neardup_dedup:
            # the hook re-reads documents AND the band index every wave
            compact_names += ["documents", "neardup_bands"]
        for name in compact_names:
            v = self._versions.get(name)
            if v is not None and v - self.wh.compaction_floor(name) >= self.compact_every:
                self.wh.compact_deltas(name, upto=v)
        mark("commit_compact")
        for df in (selected, fetched, parsed, new_cands, transitioned):
            df.unpersist()
        mark("unpersist")
        if debug:
            print(f"[wave {wave}] " + " ".join(f"{k}={v}" for k, v in timings.items()), flush=True)
        return True

    @staticmethod
    def _doc_text(docs: DataFrame) -> DataFrame:
        """(doc_id, wave, text): a document's text = its text spans in
        offset order, space-joined — the near-dup unit."""
        return docs.select(
            "doc_id",
            "wave",
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
                        lambda a, b: a["offset"] - b["offset"],
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text"),
        )

    def _neardup_wave(self, wave: int) -> None:
        """Dedup this wave's documents DELTA against the stored band
        index — the minhash_probe_band_index production shape: the
        probe side is O(wave docs), verification shingles only docs
        appearing in a candidate pair, and the wave's own bands append
        to the index for every future wave. Cumulative neardup_pairs
        across waves provably equals the full-corpus minhash_lsh_pairs
        set (pinned by test_crawl_neardup)."""
        from ..operators.dedup import (
            minhash_band_table,
            minhash_probe_band_index,
            plan_minhash_config,
        )

        cfg = plan_minhash_config(self.neardup_threshold)
        k, bands = cfg if cfg is not None else (64, 16)
        texts_all = self._doc_text(self._read_deltas("documents"))
        delta = texts_all.filter(F.col("wave") == wave).select("doc_id", "text")
        index = self._read_deltas("neardup_bands")
        # compute the delta's bands ONCE (materialized): the probe AND
        # the stored-index append both consume them — without the
        # checkpoint the signature aggregation would run twice
        delta_bands = minhash_band_table(delta, k=k, bands=bands).localCheckpoint(
            eager=True
        )
        pairs = minhash_probe_band_index(
            delta,
            index,
            texts_all.select("doc_id", "text"),
            threshold=self.neardup_threshold,
            k=k,
            bands=bands,
            allow_low_recall=cfg is None,
            new_bands=delta_bands,
        )
        self._append_delta(
            "neardup_pairs", pairs.withColumn("wave", F.lit(wave))
        )
        self._append_delta("neardup_bands", delta_bands)

    def run(self, max_waves: int = 1000) -> int:
        """Drain the frontier; returns the number of waves executed."""
        executed = 0
        while executed < max_waves and self.step():
            executed += 1
        return executed

    # ---- convenience readers ------------------------------------------------
    def table(self, name: str) -> DataFrame:
        if name == "frontier":  # logical view over the pending/done split
            return self._read("frontier_pending").unionByName(
                self._read_deltas("frontier_done")
            )
        if name in self.DELTA_TABLES:
            return self._read_deltas(name)
        return self._read(name)
