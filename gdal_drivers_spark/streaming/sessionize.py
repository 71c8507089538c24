"""Custom stateful streaming operator — gap-based sessionization via
``applyInPandasWithState``.

No reference analogue (the reference is batch-only); this is the
engine's demonstration of the Structured Streaming custom-state
surface: per-user event streams are folded into sessions that close
when no event arrives within ``gap_s`` seconds. State = the open
session (start, last ts, count, value sum); timeout = event-time
(watermark-driven, so a drained availableNow run terminates).

The batch twin (``sessionize_batch``) computes identical sessions with
a window-function lag/cumsum — the exactness contract used by tests
(stream over a closed input == batch).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long, value_cents long"
)
_STATE_SCHEMA = "start long, last long, n long, cents long"


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch twin: sessions = cumsum over (gap > gap_s) boundaries."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        events.withColumn("_t", F.col("ts").cast("timestamp").cast("long"))
        .withColumn("_prev", F.lag("_t").over(w))
        .withColumn(
            "_new", F.when(F.col("_prev").isNull() | (F.col("_t") - F.col("_prev") > gap_s), 1).otherwise(0)
        )
        .withColumn("_sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return e.groupBy("user_id", "_sid").agg(
        F.min("_t").alias("session_start"),
        F.max("_t").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    ).drop("_sid")


def _session_fn(gap_s: int):
    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, last, n, cents)],
                columns=["user_id", "session_start", "session_end", "n_events", "value_cents"],
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("tsec")
        out = []
        if state.exists:
            start, last, n, cents = state.get
        else:
            start = last = n = cents = None
        for r in rows.itertuples():
            t, c = int(r.tsec), int(r.cents)
            if start is None:
                start, last, n, cents = t, t, 1, c
            elif t - last > gap_s:
                out.append((user_id, start, last, n, cents))
                start, last, n, cents = t, t, 1, c
            else:
                last, n, cents = t, n + 1, cents + c
        state.update((start, last, n, cents))
        # event-time timeout: fires when the watermark passes the gap
        # after the last event; must stay above the current watermark
        ts = max((last + gap_s) * 1000, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(ts)
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "session_start", "session_end", "n_events", "value_cents"],
            )

    return fn


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Streaming sessionization (update mode). Emits a session row when
    a later event closes it, or on state timeout. The final open
    session per user flushes on timeout — on a closed (availableNow)
    input, tests compare only the *closed* sessions against the batch
    twin."""
    prepped = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", f"{gap_s} seconds")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.col("ts").cast("long").alias("tsec"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
