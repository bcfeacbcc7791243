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


def apply_stream(
    cs_stream: DataFrame,
    info: TableInfo,
    snapshot_dir: str,
    checkpoint_dir: str,
):
    """foreachBatch: fold each micro-batch changeset into the snapshot
    parquet dir. Epoch id + checkpoint give exactly-once folds; each
    epoch is one batch apply (full-outer merge) — the streaming
    equivalent of applyChangeset per commit."""
    spark = cs_stream.sparkSession

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        cs = ChangesetTable(info=info, df=batch_df)
        current = spark.read.parquet(snapshot_dir)
        new_target, _conflicts = apply_table(current, cs)
        # write-new-then-swap keeps the fold atomic at the dir level
        tmp = f"{snapshot_dir}__epoch{epoch_id}"
        new_target.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(snapshot_dir)
        shutil.move(tmp, snapshot_dir)

    return (
        cs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


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
