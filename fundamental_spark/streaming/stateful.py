"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch twin is ``queries.event_sessions`` (lag → running-sum →
rollup); streaming can't express gap sessions with built-in windows
(the window end depends on the data), so this is the canonical
applyInPandasWithState use-case: per-user state holds the open
session; events extend it; a gap (or state timeout past the watermark)
closes it and emits the session row.

Deterministic contract, asserted in tests/test_stateful_streaming.py:
over a bounded drain the emitted closed sessions plus the final open
sessions equal the batch query's result exactly. The operator assumes
micro-batches arrive in event-time order per key (an upstream log
provides this; the parquet file source orders by modification time) —
out-of-order arrival would need watermark + event-time buffering in
the state.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_no bigint, session_start timestamp, "
    "session_end timestamp, n_events bigint, total_value double, open boolean"
)
STATE_SCHEMA = (
    "session_no bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)

GAP_SECONDS = 30 * 60


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into the open
    session; emit every session the gap rule closes."""
    (user_id,) = key
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    if state.exists:
        sess_no, start, end, n, total = state.get
    else:
        sess_no, start, end, n, total = 0, None, None, 0, 0.0

    out: list[dict[str, Any]] = []
    for ts, value in zip(rows["ts"], rows["value"]):
        if start is None:
            sess_no, start, end, n, total = sess_no + 1, ts, ts, 1, float(value)
        elif (ts - end).total_seconds() > GAP_SECONDS:
            out.append(
                dict(user_id=user_id, session_no=sess_no, session_start=start,
                     session_end=end, n_events=n,
                     total_value=round(total, 2), open=False)
            )
            sess_no, start, end, n, total = sess_no + 1, ts, ts, 1, float(value)
        else:
            end, n, total = ts, n + 1, total + float(value)

    state.update((sess_no, start, end, n, total))
    if out:
        yield pd.DataFrame(out)


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream (event_id, ts, user_id, value, ...) → closed
    session rows, one per (user, session).

    NoTimeout: sessions close when a later event breaches the gap —
    correct and terminating for bounded drains (availableNow). A 24/7
    deployment adds ProcessingTimeTimeout so idle users' open sessions
    flush on wall-clock; with availableNow that timeout would keep
    firing empty micro-batches until every timer lapses (measured:
    hundreds of stages), which is why it is not the default here."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def drain_sessions(
    spark,
    events_path: str,
    checkpoint_dir: str,
    output_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Bounded drain: stream the parquet events dir through the
    stateful operator (availableNow, one file per micro-batch so state
    genuinely carries across batches) into ``output_dir``. Open
    sessions at end-of-drain are not emitted by the operator (no more
    triggers fire) — the equality test accounts for them from the
    batch side."""
    import os

    reader = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ).option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    ev = reader.parquet(events_path)
    q = (
        sessionize_stream(ev)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
