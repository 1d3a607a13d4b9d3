"""applyInPandasWithState sessionization: the streamed closed sessions
must agree exactly with the batch twin (queries.event_sessions) — the
custom-stateful-operator contract."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from fundamental_spark.queries import event_sessions
from fundamental_spark.streaming.stateful import drain_sessions

SF = "/root/testdata/sf0.001"


def test_streamed_sessions_match_batch(spark, tmp_path):
    # split events into several files so state must carry across
    # micro-batches (one file per trigger). The parquet file source
    # orders files by MODIFICATION TIME, so write the ts-slices
    # sequentially — the operator's contract is in-order micro-batches
    # (a 24/7 deployment gets that from the upstream log).
    import time as _time

    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{SF}/events.parquet")
    sliced = ev.withColumn("_slice", F.ntile(4).over(W.orderBy("ts", "event_id")))
    src = str(tmp_path / "events_src")
    for i in range(1, 5):
        sliced.filter(F.col("_slice") == i).drop("_slice").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)
    assert len(glob.glob(src + "/part-*")) >= 4

    out = str(tmp_path / "sessions")
    drain_sessions(spark, src, str(tmp_path / "ckpt"), out)

    streamed = spark.read.parquet(out)
    batch = event_sessions(spark, SF)

    # the operator emits sessions CLOSED by a later event; the final
    # open session per user has no successor to close it in a bounded
    # drain. So: streamed == batch minus each user's last session.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("session_no"))
    closed_expected = (
        batch.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") > 1)
        .drop("_rk")
    )
    key = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    got = {tuple(r[k] for k in key) for r in streamed.collect()}
    want = {tuple(r[k] for k in key) for r in closed_expected.collect()}
    assert got == want
    assert len(got) > 0  # the gap rule actually closed sessions mid-stream
