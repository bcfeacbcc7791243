"""Streaming windowed HLL — approximate distinct counts over an
unbounded arrival stream with BOUNDED state.

The exact streaming alternative (dropDuplicates on the raw key, then
count) keeps one state row per distinct key — O(corpus) state, the
thing that kills a 10^12-document ingest. The sketch keeps at most
``|groups| * 2^p`` register rows PER WINDOW, and the watermark evicts
closed windows, so state is O(groups * 2^p * open_windows) forever.

The registers are the same integer-exact kernel as the batch sketch
(operators/sketch.py hll_reg_rho); a closed window's register table
merges with any other sketch (register max) and estimates via
hll_estimate — so the stream's output composes with batch history
without re-reading raw data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geodiff_spark.operators.sketch import HLL_SEED, hll_reg_rho


def hll_stream(
    events: DataFrame,
    group_cols: list[str],
    item57: Column,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 8,
    seed: int = HLL_SEED,
) -> DataFrame:
    """(window, group..., reg, max_rho) streaming register table.

    Append-mode compatible: rows for a (window, group, reg) emit once
    the watermark passes the window end. Feed each closed window's
    registers to hll_estimate / hll_merge downstream.
    """
    d = events
    if dict(d.dtypes).get(ts_col) == "timestamp_ntz":
        d = d.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    reg, rho = hll_reg_rho(item57, p, seed)
    return (
        d.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), *group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(F.window(ts_col, window), *group_cols, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )
