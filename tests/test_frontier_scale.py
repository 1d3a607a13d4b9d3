"""Frontier write-amplification: the per-wave state rewrite must be
O(pending), not O(total frontier history) — the 10^10-URL scale
requirement. The pending/done split guarantees terminal rows are
written exactly once to the append-only done log and never rewritten."""

from __future__ import annotations

from fundamental_spark.crawl.runner import CrawlRunner
from fundamental_spark.synth.site import build_site, web_rows


def test_wave_rewrite_is_pending_proportional(spark, tmp_path):
    # constant wave size (politeness budget) over many waves: done
    # history grows every wave while pending stays bounded
    site = build_site(seed=59, cities=("groningen",), listings_per_city=120,
                      page_size=10)
    web = spark.createDataFrame(web_rows(site), "url string, html string")
    runner = CrawlRunner(
        spark=spark,
        warehouse_root=str(tmp_path / "wh"),
        web=web,
        wave_seconds=12.0,  # budget 12 pages/wave
    )
    runner.init([(site.search_url(c, 1), c) for c in site.cities])
    waves = runner.run()
    assert waves >= 8  # the budget actually forced many waves

    wh = runner.wh
    total_done = runner.table("frontier_done").count()
    assert total_done >= 120

    # (a) done rows are written exactly once: the per-wave delta dirs
    # partition the done set (no rewrite amplification)
    done_v = runner._versions["frontier_done"]
    delta_counts = [
        spark.read.parquet(wh._snapshot_dir("frontier_done", v)).count()
        for v in range(1, done_v + 1)
    ]
    assert sum(delta_counts) == total_done

    # (b) every pending snapshot is small relative to the history that
    # existed when it was written: the rewrite never carries done rows.
    # (The old single-table design wrote ~cumulative-history rows per
    # wave; its final snapshot alone would exceed total_done.)
    pend_v = runner._versions["frontier_pending"]
    pending_counts = [
        spark.read.parquet(wh._snapshot_dir("frontier_pending", v)).count()
        for v in range(1, pend_v + 1)
    ]
    assert pending_counts[-1] == 0            # drained at the end
    assert max(pending_counts) < total_done / 2
    # total frontier rows ever written stays near 2x the done set
    # (each row appears once pending-enqueued per wave it waits, once done);
    # the old design was quadratic-ish: sum_w |history_w|
    assert sum(pending_counts) + total_done < 6 * total_done
