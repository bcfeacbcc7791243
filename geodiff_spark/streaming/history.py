"""Streaming SCD2 maintenance — the CDC stream keeps the history table
current (operators/history.py history_apply per epoch).

Same durability contract as cdc.apply_stream: versioned store +
atomic pointer publish (write-then-commit), retried epochs detected via
the epoch id in the pointer and skipped — exactly-once history folds on
top of at-least-once micro-batches.

At 100 TB the epoch cost is |changeset| + a co-located probe of the
OPEN intervals (store the history bucketed by PK); closed intervals are
immutable and never rewritten, so the store grows append-only the way
an Iceberg MERGE would.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..changeset import ChangesetTable, TableInfo
from ..operators.history import history_apply
from .cdc import _pointer_path, _read_pointer


def init_history_store(history: DataFrame, store_dir: str) -> None:
    """Seed the versioned history store (v=000000 + pointer publish)."""
    vdir = os.path.join(store_dir, "v=000000")
    history.write.mode("overwrite").parquet(vdir)
    tmp = _pointer_path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"dir": "v=000000", "epoch": -1, "version": 0}, f)
    os.replace(tmp, _pointer_path(store_dir))


def history_stream(
    cs_stream: DataFrame,
    info: TableInfo,
    store_dir: str,
    checkpoint_dir: str,
):
    """foreachBatch fold: each micro-batch changeset advances the SCD2
    history by one version (= stored version + 1)."""
    spark = cs_stream.sparkSession

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        ptr = _read_pointer(store_dir)
        if ptr is None:
            raise RuntimeError("history store not initialized "
                               "(call init_history_store)")
        if ptr.get("epoch") == epoch_id:
            return  # retried epoch: already folded and published
        if batch_df.isEmpty():
            return
        current = spark.read.parquet(os.path.join(store_dir, ptr["dir"]))
        version = int(ptr.get("version", 0)) + 1
        new_hist = history_apply(
            current, ChangesetTable(info=info, df=batch_df), version, info
        )
        vdir_name = f"v={version:06d}"
        new_hist.write.mode("overwrite").parquet(
            os.path.join(store_dir, vdir_name)
        )
        tmp = _pointer_path(store_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"dir": vdir_name, "epoch": epoch_id, "version": version}, f)
        os.replace(tmp, _pointer_path(store_dir))

    return (
        cs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def current_history(spark: SparkSession, store_dir: str) -> DataFrame:
    ptr = _read_pointer(store_dir)
    return spark.read.parquet(os.path.join(store_dir, ptr["dir"]))
