"""Streaming CDC + resumable checkpoint/lineage tests."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from geodiff_spark import TableInfo, diff_table
from geodiff_spark.plans.checkpoints import CellRange, ResumableJob, cell_ranges
from geodiff_spark.streaming.cdc import (
    changeset_stream,
    events_hourly_stream,
    streaming_summary,
)

T = TableInfo(name="t", columns=("fid", "v"), pk=("fid",))


def test_changeset_stream_summary(spark, tmp_path):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "fid long, v string")
    b = spark.createDataFrame([(1, "x2"), (3, "z")], "fid long, v string")
    cs = diff_table(a, b, T).df.withColumn("_commit_ts", F.current_timestamp())
    src = str(tmp_path / "cs_stream")
    cs.write.parquet(src)

    stream = changeset_stream(spark, src, T)
    q = (
        streaming_summary(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cs_summary")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r["op"]: r["cnt"] for r in spark.sql("select * from cs_summary").collect()}
    assert rows == {"insert": 1, "update": 1, "delete": 1}


def test_events_hourly_stream_matches_batch(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    # file streams need a directory source
    import shutil

    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(f"{sf}/events.parquet", src / "part-0.parquet")
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    q = (
        events_hourly_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_hourly")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("select * from ev_hourly").collect()
    }
    import __spark_entry__ as E

    exp = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in E.q_events_hourly(spark, sf).collect()
    }
    assert got == exp


def test_resumable_job(spark, tmp_path):
    out = str(tmp_path / "job_out")
    ranges = cell_ranges(res=4, n_ranges=4)
    assert ranges[0].lo < ranges[0].hi <= ranges[1].lo

    calls = []

    def fn(s, r: CellRange):
        calls.append(r.index)
        return s.range(r.index * 10, r.index * 10 + 5).select(
            F.col("id"), F.lit(r.index).alias("range_idx")
        )

    job = ResumableJob(spark, out, "test_job")
    stats = job.run(ranges[:2], fn, inputs=["synthetic"])
    assert stats == {"completed": 2, "skipped": 0, "seconds": stats["seconds"]}

    # resume: first two skip, remaining two run
    stats2 = job.run(ranges, fn, inputs=["synthetic"])
    assert stats2["completed"] == 2 and stats2["skipped"] == 2
    assert sorted(calls) == [0, 1, 2, 3]  # each range computed exactly once

    df = job.result()
    assert df.count() == 20
    lineage = job.metrics()
    assert len(lineage) == 4
    rec = lineage[0]
    assert {"job", "range_index", "cell_lo", "cell_hi", "rows", "seconds"} <= set(rec)
    assert os.path.exists(os.path.join(out, "_lineage.jsonl"))
    json.dumps(lineage)  # serializable
