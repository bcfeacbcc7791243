"""Custom stateful streaming operator: user sessionization with
applyInPandasWithState (the harness for arbitrary per-key state the
built-in windows can't express — SURVEY.md §2.8 extension).

Batch twin (`sessionize_batch`) uses the classic lag/cumsum window
pattern so the streaming operator has an exact oracle. Both emit
(user_id, session_id, start, end, n_events, sum_value).
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_id long, start timestamp, end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double, sid long"


def sessionize_batch(events: DataFrame, *, gap_minutes: int = 30) -> DataFrame:
    """Window twin: new session when the gap to the previous event of
    the same user exceeds ``gap``; session_id = 0-based per user."""
    gap = gap_minutes * 60
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    new_sess = (
        F.when(prev.isNull(), F.lit(1))
        .when(F.unix_timestamp("ts") - F.unix_timestamp(prev) > gap, F.lit(1))
        .otherwise(F.lit(0))
    )
    marked = events.withColumn(
        "session_id", F.sum(new_sess).over(w) - F.lit(1)
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("start"),
        F.max("ts").alias("end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def sessionize_stream(events: DataFrame, *, gap_minutes: int = 30) -> DataFrame:
    """Stateful streaming sessionization: per-user GroupState carries the
    open session; sessions close on gap timeout or an out-of-gap event.
    Event-time processing with a watermark equal to the gap."""
    gap = gap_minutes * 60

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n, total, sid = state.get
        else:
            start, last, n, total, sid = None, None, 0, 0.0, -1

        closed = []

        if state.hasTimedOut:
            if n:
                closed.append((user_id, sid, start, last, n, total))
            state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            for ts, value in zip(rows["ts"], rows["value"]):
                t = int(ts.timestamp())
                if last is None or t - last > gap:
                    if n:
                        closed.append((user_id, sid, start, last, n, total))
                    sid += 1
                    start, n, total = t, 0, 0.0
                last = t
                n += 1
                total += float(value)
            state.update((start, last, n, total, sid))
            state.setTimeoutTimestamp((last + gap) * 1000)

        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_id", "start", "end", "n_events", "sum_value"],
            )
            out["start"] = pd.to_datetime(out["start"], unit="s")
            out["end"] = pd.to_datetime(out["end"], unit="s")
            yield out

    ev = events
    if dict(ev.dtypes).get("ts") == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
