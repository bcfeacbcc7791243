"""Stateful streaming sessionization vs its batch window twin."""

from __future__ import annotations

import datetime as dt

from geodiff_spark.streaming.sessionize import sessionize_batch, sessionize_stream


def _events(spark):
    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)

    def e(user, minutes, value):
        return (user, t0 + dt.timedelta(minutes=minutes), value)

    rows = [
        e(1, 0, 1.0), e(1, 5, 2.0), e(1, 10, 3.0),    # session 0
        e(1, 60, 4.0), e(1, 70, 5.0),                 # session 1 (gap 50 > 30)
        e(2, 0, 10.0),                                # session 0
        e(2, 200, 20.0),                              # session 1
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_sessionize_batch(spark):
    out = sessionize_batch(_events(spark), gap_minutes=30).collect()
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
        for r in out
    }
    assert got == {
        (1, 0): (3, 6.0),
        (1, 1): (2, 9.0),
        (2, 0): (1, 10.0),
        (2, 1): (1, 20.0),
    }


def test_sessionize_stream_matches_batch(spark, tmp_path):
    ev = _events(spark)
    src = tmp_path / "sess_stream"
    src.mkdir()
    ev.write.parquet(str(src / "batch0"))
    stream = spark.readStream.schema(ev.schema).parquet(str(src / "*"))
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sessions").collect()
    }
    # append mode only emits CLOSED sessions: the final session per user
    # stays open (watermark hasn't passed) — compare the closed subset
    batch = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(_events(spark), gap_minutes=30).collect()
    }
    assert got  # at least the early sessions closed
    for k, v in got.items():
        assert batch[k] == v, k
