"""Raster ↔ vector tile materialization (north-rule operator).

*Raster* here = a regular grid of cell values at resolution ``res``,
grouped into tiles at a coarser resolution ``tile_res`` (a tile is the
parent cell; its pixels are the 4^(res-tile_res) descendants).

rasterize: points -> (tile, cell, value) via groupBy(cell) aggregation +
parent_udf — one shuffle, map-side partial aggregation for free.

vectorize: (tile, pixels) -> rectangle polygons covering pixels passing
a predicate, merged with a greedy run-length/stripe coalescing kernel
(numpy per tile group in applyInPandas — groups are tile-sized, i.e.
thousands of pixels, so the Arrow batches stay dense). Output rings are
closed CCW rectangles in lon/lat, ready for pip_join — giving the
raster→vector→PIP round-trip an internal consistency oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cells import RES_SHIFT, MODE_BIT, _spread_np, decode_np, parent_udf

VECTOR_SCHEMA = (
    "tile long, feature_id long, min_lon double, min_lat double, "
    "max_lon double, max_lat double, n_pixels long"
)


def rasterize(
    points: DataFrame,
    *,
    res: int,
    tile_res: int,
    value_agg=None,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """-> (tile, cell, value). Default value = point count per cell."""
    from .cells import cell_expr

    if tile_res > res:
        raise ValueError("tile_res must be coarser (<=) than res")
    value_agg = value_agg if value_agg is not None else F.count(F.lit(1))
    cells = points.withColumn("cell", cell_expr(F.col(lat_col), F.col(lon_col), res))
    agg = cells.groupBy("cell").agg(value_agg.alias("value"))
    return agg.withColumn("tile", parent_udf(F.col("cell"), tile_res)).select(
        "tile", "cell", "value"
    )


def _merge_rects(x: np.ndarray, y: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Greedy rectangle cover of a pixel set: horizontal run-length per
    row, then merge vertically-adjacent runs with identical x-extent.
    Returns (x0, y0, x1, y1) inclusive pixel rects."""
    order = np.lexsort((x, y))
    x, y = x[order], y[order]
    runs: list[tuple[int, int, int]] = []  # (y, x0, x1)
    i = 0
    n = len(x)
    while i < n:
        j = i
        while j + 1 < n and y[j + 1] == y[i] and x[j + 1] == x[j] + 1:
            j += 1
        runs.append((int(y[i]), int(x[i]), int(x[j])))
        i = j + 1
    rects: list[list[int]] = []
    open_runs: dict[tuple[int, int], list[int]] = {}
    for yy, x0, x1 in runs:
        key = (x0, x1)
        prev = open_runs.get(key)
        if prev is not None and prev[3] == yy - 1:
            prev[3] = yy
        else:
            r = [x0, yy, x1, yy]
            rects.append(r)
            open_runs[key] = r
    return [tuple(r) for r in rects]


def vectorize(
    raster: DataFrame,
    *,
    min_value: float = 1.0,
) -> DataFrame:
    """(tile, cell, value) -> rectangle features per tile (VECTOR_SCHEMA).

    Rectangles are expressed as lon/lat bboxes of merged pixel runs; use
    ``rects_to_rings`` to get PIP-compatible rings.
    """

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["value"] >= min_value]
        if pdf.empty:
            return pd.DataFrame(
                {
                    "tile": pd.Series([], dtype="int64"),
                    "feature_id": pd.Series([], dtype="int64"),
                    "min_lon": pd.Series([], dtype="float64"),
                    "min_lat": pd.Series([], dtype="float64"),
                    "max_lon": pd.Series([], dtype="float64"),
                    "max_lat": pd.Series([], dtype="float64"),
                    "n_pixels": pd.Series([], dtype="int64"),
                }
            )
        cells = pdf["cell"].to_numpy(np.int64)
        res, x, y = decode_np(cells)
        r = int(res[0])
        n = float(1 << r)
        rects = _merge_rects(x, y)
        tile = int(pdf["tile"].iloc[0])
        rows = []
        for fi, (x0, y0, x1, y1) in enumerate(rects):
            rows.append(
                {
                    "tile": tile,
                    "feature_id": fi,
                    "min_lon": x0 / n * 360.0 - 180.0,
                    "min_lat": y0 / n * 180.0 - 90.0,
                    "max_lon": (x1 + 1) / n * 360.0 - 180.0,
                    "max_lat": (y1 + 1) / n * 180.0 - 90.0,
                    "n_pixels": (x1 - x0 + 1) * (y1 - y0 + 1),
                }
            )
        return pd.DataFrame(rows)

    return raster.groupBy("tile").applyInPandas(per_tile, schema=VECTOR_SCHEMA)


def rects_to_rings(features: DataFrame) -> DataFrame:
    """Add a PIP-compatible `ring` column (closed CCW rectangle)."""
    def pt(lon, lat):
        return F.struct(lon.alias("lon"), lat.alias("lat"))

    lo_x, lo_y = F.col("min_lon"), F.col("min_lat")
    hi_x, hi_y = F.col("max_lon"), F.col("max_lat")
    ring = F.array(
        pt(lo_x, lo_y), pt(hi_x, lo_y), pt(hi_x, hi_y), pt(lo_x, hi_y), pt(lo_x, lo_y)
    )
    return features.withColumn("ring", ring)


def vector_to_raster(features: DataFrame, *, res: int, tile_res: int) -> DataFrame:
    """Inverse materialization: rectangle features -> constituent pixel
    cells (tile, cell) — exploding each rect into its grid cells with a
    vectorized pandas UDF."""
    import pyspark.sql.types as T

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def rect_cells(min_lon: pd.Series, min_lat: pd.Series, max_lon: pd.Series, max_lat: pd.Series) -> pd.Series:
        from .cells import xy_np

        out = []
        eps = 1e-12
        for lo_x, lo_y, hi_x, hi_y in zip(min_lon, min_lat, max_lon, max_lat):
            x0, y0 = xy_np(np.array([lo_y + eps]), np.array([lo_x + eps]), res)
            x1, y1 = xy_np(np.array([hi_y - eps]), np.array([hi_x - eps]), res)
            xs = np.arange(x0[0], x1[0] + 1)
            ys = np.arange(y0[0], y1[0] + 1)
            gx, gy = np.meshgrid(xs, ys)
            out.append(
                MODE_BIT
                | (np.int64(res) << RES_SHIFT)
                | _spread_np(gx.ravel())
                | (_spread_np(gy.ravel()) << 1)
            )
        return pd.Series(out)

    exploded = features.withColumn(
        "cell",
        F.explode(
            rect_cells(
                F.col("min_lon"), F.col("min_lat"), F.col("max_lon"), F.col("max_lat")
            )
        ),
    )
    return exploded.withColumn("tile", parent_udf(F.col("cell"), tile_res)).select(
        "tile", "cell"
    )


def focal_stats(
    raster: DataFrame,
    *,
    k: int = 1,
    cell_col: str = "cell",
    value_col: str = "value",
    res: int | None = None,
) -> DataFrame:
    """Focal (neighborhood) statistics over a sparse raster — the map-
    algebra smoothing/aggregation primitive (focal mean elevation, k-
    ring density): for every PRESENT cell, the sum and count of values
    over the present cells in its Chebyshev-``k`` ring (incl. itself).

    Emits (cell, value, focal_sum, focal_n); the mean is the caller's
    exact ratio (sum and count stay integers/exact for bit parity).

    Scale shape: each cell SCATTERS its value to its (2k+1)² ring in a
    zero-shuffle explode (array_distinct handles pole-clamp duplicate
    neighbors), then ONE groupBy(cell) shuffle with map-side partial
    sums folds contributions; the inner join back to the present-cell
    set rides the same hash partitioning. Ring membership is symmetric
    (lon wraps mod n on both sides; lat clamp only shrinks the ring at
    the pole rows), so scatter-to-ring == gather-from-ring exactly.
    """
    from .cells import kring_explode, kring_udf

    if res is not None:
        # static, homogeneous resolution: pure-JVM ring explode (no
        # Python boundary; bit-identical set — see cells.kring_explode)
        contrib = kring_explode(
            raster.select(F.col(cell_col).alias("_c0"), F.col(value_col).alias("_v")),
            "_c0", k, res, out_col=cell_col,
        ).select(cell_col, "_v")
    else:
        contrib = raster.select(
            F.explode(F.array_distinct(kring_udf(F.col(cell_col), k))).alias(cell_col),
            F.col(value_col).alias("_v"),
        )
    folded = contrib.groupBy(cell_col).agg(
        F.sum("_v").alias("focal_sum"), F.count(F.lit(1)).alias("focal_n")
    )
    return raster.select(cell_col, value_col).join(folded, cell_col, "inner")


def autocorr_stats(
    raster: DataFrame,
    *,
    k: int = 1,
    cell_col: str = "cell",
    value_col: str = "value",
    res: int | None = None,
) -> DataFrame:
    """Sufficient statistics for spatial autocorrelation (Moran's I /
    Geary's C with binary Chebyshev-``k`` ring weights) over a sparse
    integer raster, in ONE row: (n_cells, sum_v, sum_v2, n_pairs,
    sum_products) where pairs are ordered neighbor pairs (a ≠ b, b in
    ring(a)) and products are exact integer v_a·v_b sums. The float
    Moran's I assembles driver-side from these five integers — the
    same exact/presentation split as the HLL estimate.

    Scale shape: reuses the focal scatter — each cell ships (cell_v)
    to its ring (zero-shuffle explode), ONE groupBy(cell) join against
    the present set forms the pair products as
    v_a · (focal_sum_a − v_a), i.e. WITHOUT materializing pairs at
    all; the global fold is a single scalar aggregation.
    """
    f = focal_stats(raster, k=k, cell_col=cell_col, value_col=value_col, res=res)
    v = F.col(value_col)
    return f.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(v).alias("sum_v"),
        F.sum(v * v).alias("sum_v2"),
        F.sum(F.col("focal_n") - 1).alias("n_pairs"),
        F.sum(v * (F.col("focal_sum") - v)).alias("sum_products"),
    )
