"""Streaming spatial ingest: tile rollups as points arrive.

The unbounded twin of spatial.cells.pyramid_rollup — a web-scale geo
ingest assigns cells at arrival time and maintains per-tile counts in
windowed state, so the materialized tile layer is fresh without
rescanning the corpus (the streaming complement to the batch
pyramid_delta IVM path).

Scale shape: cell assignment is a narrow JVM expression (whole-stage
codegen, the same bit kernel as the batch path — no per-row Python);
the aggregation is the standard watermarked windowed count whose state
is O(active windows × occupied tiles), evicted past the watermark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..spatial.cells import cell_expr
from ..sources.tiled import tile_of_cell


def tile_counts_stream(
    points: DataFrame,
    lat: Column,
    lon: Column,
    *,
    fine_res: int,
    tile_res: int,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, tile) arrival counts with late-data handling.
    Returns (window, tile, n)."""
    d = points
    if dict(d.dtypes).get(ts_col) == "timestamp_ntz":
        d = d.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    cell = cell_expr(lat, lon, fine_res)
    d = d.withColumn("tile", tile_of_cell(cell, fine_res, tile_res))
    return (
        d.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"), "tile")
        .agg(F.count(F.lit(1)).alias("n"))
    )
