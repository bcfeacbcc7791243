"""Structured Streaming surface.

geodiff is strictly batch, but its changesets ARE a change-data-capture
artifact (SURVEY.md §2.8) — the Spark-idiomatic extension is treating a
directory of changeset parquet as an unbounded stream:

  * changeset_stream: readStream source over changeset files
  * streaming_summary: windowed per-op counts with a watermark (the
    streaming twin of summary_df)
  * apply_stream: foreachBatch exactly-once fold of each micro-batch
    into a snapshot store directory (batch apply_table per epoch)
  * events_hourly_stream: streaming twin of the q_events_hourly batch
    query (same semantics, window + watermark)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..changeset import ChangesetTable, TableInfo
from ..operators.apply import apply_table


def changeset_stream(
    spark: SparkSession, path: str, info: TableInfo, schema=None
) -> DataFrame:
    """Unbounded changeset source: each parquet file dropped into
    ``path`` is one committed changeset batch. Schema required by
    Structured Streaming (no inference on streams)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def streaming_summary(cs_stream: DataFrame, ts_col: str = "_commit_ts") -> DataFrame:
    """Per-op counts over 1-minute tumbling windows, 5-minute watermark
    for late changesets."""
    return (
        cs_stream.withWatermark(ts_col, "5 minutes")
        .groupBy(F.window(F.col(ts_col), "1 minute"), F.col("op"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pointer_path(store_dir: str) -> str:
    import os

    return os.path.join(store_dir, "_CURRENT")


def _read_pointer(store_dir: str) -> dict | None:
    import json
    import os

    p = _pointer_path(store_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def init_snapshot_store(df: DataFrame, store_dir: str) -> None:
    """Seed a versioned snapshot store: write v=000000, then publish the
    pointer (write-then-commit, like plans/checkpoints.py manifests)."""
    import json
    import os

    vdir = os.path.join(store_dir, "v=000000")
    df.write.mode("overwrite").parquet(vdir)
    tmp = _pointer_path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"dir": "v=000000", "epoch": -1}, f)
    os.replace(tmp, _pointer_path(store_dir))  # atomic on POSIX


def read_snapshot(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current snapshot of a versioned store."""
    import os

    ptr = _read_pointer(store_dir)
    if ptr is None:
        raise FileNotFoundError(f"no _CURRENT pointer in {store_dir}")
    return spark.read.parquet(os.path.join(store_dir, ptr["dir"]))


def apply_stream(
    cs_stream: DataFrame,
    info: TableInfo,
    store_dir: str,
    checkpoint_dir: str,
    *,
    on_conflicts: str = "log",
):
    """foreachBatch fold of each micro-batch changeset into a VERSIONED
    snapshot store (seed with :func:`init_snapshot_store`).

    Crash safety: each epoch writes a fresh ``v=<epoch>`` directory and
    only then atomically publishes the ``_CURRENT`` pointer
    (``os.replace``) — a crash at any point leaves the previous snapshot
    intact and readable. A RETRIED epoch (crash after publish, before
    the stream checkpoint commit) is detected by the epoch id recorded
    in the pointer and skipped, so the fold is idempotent and the
    exactly-once claim holds end-to-end.

    Conflicts are never swallowed: ``on_conflicts='log'`` writes them to
    ``<store>/_conflicts/epoch=<n>`` and logs the count;
    ``'error'`` raises BEFORE publishing (the epoch fails and no state
    changes — the reference's all-or-nothing savepoint semantics,
    sqlitedriver.cpp:866-987)."""
    fold = _make_fold(
        cs_stream.sparkSession, info, store_dir, checkpoint_dir, on_conflicts
    )
    return (
        cs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def _make_fold(
    spark: SparkSession,
    info: TableInfo,
    store_dir: str,
    checkpoint_dir: str,
    on_conflicts: str,
):
    """The per-epoch fold (module-level so tests can drive a simulated
    epoch retry without fighting the checkpoint manager)."""
    import json
    import os

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        ptr = _read_pointer(store_dir)
        if ptr is None:
            raise FileNotFoundError(
                f"snapshot store {store_dir} not seeded (init_snapshot_store)"
            )
        # epoch ids are only monotone WITHIN one streaming query lineage
        # (same checkpoint); scope the retry guard to the query id from
        # the checkpoint metadata so a brand-new query isn't mistaken
        # for a retry
        qid = None
        meta = os.path.join(checkpoint_dir, "metadata")
        if os.path.exists(meta):
            with open(meta) as f:
                qid = json.load(f).get("id")
        if ptr.get("query") == qid and ptr["epoch"] >= epoch_id:
            return  # retried epoch already published — idempotent skip
        cs = ChangesetTable(info=info, df=batch_df)
        current = spark.read.parquet(os.path.join(store_dir, ptr["dir"]))
        new_target, conflicts = apply_table(current, cs)
        n_conf = conflicts.count()
        if n_conf:
            if on_conflicts == "error":
                raise ValueError(
                    f"epoch {epoch_id}: {n_conf} conflicts — nothing applied"
                )
            conflicts.write.mode("overwrite").parquet(
                os.path.join(store_dir, "_conflicts", f"epoch={epoch_id}")
            )
            print(
                f"geodiff_spark.apply_stream: epoch {epoch_id} had "
                f"{n_conf} conflicting entries (kept current row values); "
                f"details in {store_dir}/_conflicts/epoch={epoch_id}"
            )
        # next version = current + 1 (NOT the epoch id: a new query
        # lineage restarts epochs at 0, which must never overwrite the
        # live version dir before the pointer moves)
        vname = f"v={int(ptr['dir'].split('=')[1]) + 1:06d}"
        new_target.write.mode("overwrite").parquet(os.path.join(store_dir, vname))
        tmp = _pointer_path(store_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"dir": vname, "epoch": epoch_id, "query": qid}, f)
        os.replace(tmp, _pointer_path(store_dir))

    return fold


def events_hourly_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of __spark_entry__.q_events_hourly."""
    # event-time must be TIMESTAMP (not NTZ) for watermarks
    if dict(events.dtypes)["ts"] == "timestamp_ntz":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("hour"), "event_type", "n", "sum_value"
        )
    )
