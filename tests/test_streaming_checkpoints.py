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


def test_apply_stream_pointer_commit(spark, tmp_path):
    """apply_stream folds changeset batches into a versioned store:
    pointer-commit (crash-safe), conflicts surfaced, retried epochs
    idempotently skipped."""
    import shutil

    from geodiff_spark.streaming.cdc import (
        apply_stream,
        init_snapshot_store,
        read_snapshot,
    )

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    src = tmp_path / "cs_src"
    src.mkdir()

    base = spark.createDataFrame([(1, "a"), (2, "b")], "fid long, v string")
    init_snapshot_store(base, store)
    assert sorted(map(tuple, read_snapshot(spark, store).collect())) == [
        (1, "a"), (2, "b")]

    def drop_batch(cs_df, dest, tag):
        # file stream sources don't recurse: stage then copy part files flat
        stage = tmp_path / f"stage_{tag}"
        cs_df.coalesce(1).write.parquet(str(stage))
        for i, f in enumerate(sorted(stage.glob("part-*.parquet"))):
            shutil.copy(f, dest / f"{tag}-{i}.parquet")

    mod = spark.createDataFrame([(1, "a2"), (3, "c")], "fid long, v string")
    cs = diff_table(base, mod, T)
    drop_batch(cs.df, src, "batch0")

    stream = changeset_stream(spark, str(src), T, schema=cs.df.schema)
    q = apply_stream(stream, T, store, ckpt).start()
    q.awaitTermination(120)
    q.stop()
    got = sorted(map(tuple, read_snapshot(spark, store).collect()))
    assert got == [(1, "a2"), (3, "c")]

    # simulate a TRUE epoch retry (crash after pointer publish, before
    # the stream checkpoint commit): replay epoch 0 under the same
    # checkpoint/query identity — the pointer guard must skip it (no
    # double apply; re-deleting fid 2 would conflict)
    from geodiff_spark.streaming.cdc import _make_fold, _read_pointer

    fold = _make_fold(spark, T, store, ckpt, "log")
    fold(cs.df, 0)  # retried epoch
    assert sorted(map(tuple, read_snapshot(spark, store).collect())) == got
    assert _read_pointer(store)["dir"] == "v=000001"  # no extra version

    # whereas a GENUINELY new epoch under the same query advances state
    cs_back = diff_table(mod, base, T)
    fold(cs_back.df, 1)
    assert sorted(map(tuple, read_snapshot(spark, store).collect())) == [
        (1, "a"), (2, "b")]
    assert _read_pointer(store)["dir"] == "v=000002"
    fold(cs.df, 2)  # roll forward again so the conflict section sees `got`
    assert sorted(map(tuple, read_snapshot(spark, store).collect())) == got

    # conflict surfacing: a changeset whose guard fails (delete of a row
    # that no longer exists) lands in _conflicts and does not stop the fold
    cs2 = diff_table(mod, spark.createDataFrame([(1, "a2")], "fid long, v string"), T)
    # cs2 deletes fid 3; make it conflict by first removing 3 via another path
    ckpt3 = str(tmp_path / "ckpt3")
    src2 = tmp_path / "cs_src2"
    src2.mkdir()
    bad = diff_table(
        spark.createDataFrame([(9, "zz")], "fid long, v string"),
        spark.createDataFrame([], "fid long, v string"),
        T,
    )  # delete fid 9 — absent from the store -> delete_nothing conflict
    drop_batch(bad.df, src2, "badbatch")
    stream2 = changeset_stream(spark, str(src2), T, schema=bad.df.schema)
    q3 = apply_stream(stream2, T, store, ckpt3, on_conflicts="log").start()
    q3.awaitTermination(120)
    q3.stop()
    assert sorted(map(tuple, read_snapshot(spark, store).collect())) == got
    conf_dir = os.path.join(store, "_conflicts")
    assert os.path.exists(conf_dir)
    confs = spark.read.parquet(os.path.join(conf_dir, "epoch=0"))
    assert confs.count() == 1 and confs.collect()[0]["reason"] == "delete_nothing"


def test_dedup_stream_first_seen_wins(spark, tmp_path):
    """Streaming exact dedup drops re-arrivals of the same content key
    within the watermark; distinct contents all pass."""
    import shutil

    from geodiff_spark.streaming.dedup import content_key, dedup_stream

    rows = [
        (1, "alpha text", "2026-01-01 10:00:00"),
        (2, "alpha text", "2026-01-01 10:10:00"),   # dup within watermark
        (3, "beta text",  "2026-01-01 10:20:00"),
        (4, "gamma text", "2026-01-01 10:30:00"),
        (5, "beta text",  "2026-01-01 10:40:00"),   # dup within watermark
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp")) \
        .select("doc_id", "text", "ts", content_key("text"))
    src = tmp_path / "dedup_src"
    stage = tmp_path / "dedup_stage"
    src.mkdir()
    df.coalesce(1).write.parquet(str(stage))
    for i, f in enumerate(sorted(stage.glob("part-*.parquet"))):
        shutil.copy(f, src / f"b{i}.parquet")

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    out = dedup_stream(stream, ["content_key"], ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = sorted(r["text"] for r in spark.sql("select * from dedup_out").collect())
    assert got == ["alpha text", "beta text", "gamma text"]


def test_tile_counts_stream_matches_batch(spark, tmp_path):
    """Streaming tile rollup == batch groupBy on the same points."""
    import shutil

    from geodiff_spark.sources.tiled import tile_of_cell
    from geodiff_spark.spatial.cells import cell_expr
    from geodiff_spark.streaming.spatial import tile_counts_stream

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    # derive deterministic lat/lon from user_id (events carry no geo)
    pts_batch = ev.select(
        "ts",
        ((F.col("user_id") * 37 % 160).cast("double") - 80.0).alias("lat"),
        ((F.col("user_id") * 91 % 350).cast("double") - 175.0).alias("lon"),
    )
    src = tmp_path / "pts_stream"
    src.mkdir()
    shutil.copy(f"{sf}/events.parquet", src / "part-0.parquet")
    stream = spark.readStream.schema(ev.schema).parquet(str(src)).select(
        "ts",
        ((F.col("user_id") * 37 % 160).cast("double") - 80.0).alias("lat"),
        ((F.col("user_id") * 91 % 350).cast("double") - 175.0).alias("lon"),
    )
    q = (
        tile_counts_stream(
            stream, F.col("lat"), F.col("lon"), fine_res=9, tile_res=4,
            window="6 hours", watermark="1 hour",
        )
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tile_counts")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["window"]["start"], r["tile"]): r["n"]
        for r in spark.sql("select * from tile_counts").collect()
    }
    cell = cell_expr(F.col("lat"), F.col("lon"), 9)
    exp = {
        (r["w"]["start"], r["tile"]): r["n"]
        for r in pts_batch.withColumn("tile", tile_of_cell(cell, 9, 4))
        .groupBy(
            F.window(F.col("ts").cast("timestamp"), "6 hours").alias("w"), "tile"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp and len(got) > 10
