"""Point-in-polygon: cell-join prefilter + vectorized ray-casting refine.

The join side is pure DataFrame algebra: polygons are covered by grid
cells at a chosen resolution (bbox cover), points are encoded at the
same resolution, and candidates come from a cell equi-join — the
spatial analogue of geodiff's PK-equi diff join (SURVEY.md §2.3
extension row). The exact test is an even-odd ray-casting kernel,
numpy-vectorized across *all* candidate pairs in an Arrow batch (rings
padded to the batch max; no per-row Python).

Convention: x = lon, y = lat; rings may be open (first != last) —
closing edge is implicit. Points exactly on an edge follow the even-odd
half-open rule (stable, deterministic).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .cells import MAX_RES, encode_np, xy_np

RING_TYPE = T.ArrayType(
    T.StructType(
        [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
    )
)


def _rings_to_padded(rings: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ragged rings -> padded (X, Y, nvert). Pads with vertex 0 so the
    closing edge lands at index nvert-1 -> nvert."""
    n = len(rings)
    lens = np.fromiter((len(r) for r in rings), dtype=np.int64, count=n)
    m = int(lens.max()) if n else 0
    X = np.zeros((n, m + 1)); Y = np.zeros((n, m + 1))
    for i, r in enumerate(rings):  # ring list unpack (metadata-sized loop,
        a = np.asarray([(p["lon"], p["lat"]) for p in r], dtype=np.float64)
        X[i, : lens[i]] = a[:, 0]
        Y[i, : lens[i]] = a[:, 1]
        X[i, lens[i]] = a[0, 0]
        Y[i, lens[i]] = a[0, 1]
    return X, Y, lens


def pip_np(px: np.ndarray, py: np.ndarray, X: np.ndarray, Y: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Even-odd ray casting, vectorized over (rows × edges)."""
    n, m1 = X.shape
    j = np.arange(m1 - 1)
    valid = j[None, :] < lens[:, None]
    x1, y1 = X[:, :-1], Y[:, :-1]
    x2, y2 = X[:, 1:], Y[:, 1:]
    pyc, pxc = py[:, None], px[:, None]
    straddle = (y1 > pyc) != (y2 > pyc)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (pyc - y1) / (y2 - y1) + x1
    crossing = valid & straddle & (pxc < xint)
    return (crossing.sum(axis=1) % 2).astype(bool)


@F.pandas_udf(T.BooleanType())
def pip_udf(lat: pd.Series, lon: pd.Series, ring: pd.Series) -> pd.Series:
    X, Y, lens = _rings_to_padded(ring)
    return pd.Series(
        pip_np(lon.to_numpy(np.float64), lat.to_numpy(np.float64), X, Y, lens)
    )


@F.pandas_udf(T.ArrayType(T.LongType()))
def _cover_cells_udf(ring: pd.Series, res: pd.Series) -> pd.Series:
    """Cells whose bbox-grid rectangle intersects the ring's bbox (a
    superset cover; the ray-cast refine removes false positives)."""
    out = []
    for r, rr in zip(ring, res):  # one iteration per polygon (metadata-sized)
        a = np.asarray([(p["lon"], p["lat"]) for p in r], dtype=np.float64)
        rr = int(rr)
        x0, y0 = xy_np(a[:, 1].min(None, keepdims=True), a[:, 0].min(None, keepdims=True), rr)
        x1, y1 = xy_np(a[:, 1].max(None, keepdims=True), a[:, 0].max(None, keepdims=True), rr)
        xs = np.arange(x0[0], x1[0] + 1)
        ys = np.arange(y0[0], y1[0] + 1)
        gx, gy = np.meshgrid(xs, ys)
        from .cells import MODE_BIT, RES_SHIFT, _spread_np

        cells = (
            MODE_BIT
            | (np.int64(rr) << RES_SHIFT)
            | _spread_np(gx.ravel())
            | (_spread_np(gy.ravel()) << 1)
        )
        out.append(cells)
    return pd.Series(out)


def cover_polygons(polygons: DataFrame, ring_col: str, res: int) -> DataFrame:
    """polygons + exploded covering `cell` column."""
    return polygons.withColumn(
        "cell",
        F.explode(_cover_cells_udf(F.col(ring_col), F.lit(res))),
    )


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    ring_col: str = "ring",
    lat_col: str = "lat",
    lon_col: str = "lon",
    res: int = 7,
    broadcast_polygons: bool = True,
    point_cell_col: str | None = None,
) -> DataFrame:
    """Inner join: points × polygons containing them.

    Polygon side is exploded to covering cells (small — tile polygons),
    broadcast by default so the point side never shuffles. Pass
    ``point_cell_col`` if points already carry a cell at ``res`` (e.g.
    the table's partition key) to skip re-encoding.
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError("bad resolution")
    polys = cover_polygons(polygons, ring_col, res)
    if broadcast_polygons:
        polys = F.broadcast(polys)

    if point_cell_col is None:
        from .cells import cell_expr

        pts = points.withColumn("_pcell", cell_expr(F.col(lat_col), F.col(lon_col), res))
    else:
        pts = points.withColumn("_pcell", F.col(point_cell_col))

    cand = pts.join(polys, pts["_pcell"] == polys["cell"], "inner").drop("_pcell", "cell")
    return cand.filter(pip_udf(F.col(lat_col), F.col(lon_col), F.col(ring_col)))


def zonal_stats(
    points: DataFrame,
    zones: DataFrame,
    aggs: list,
    *,
    zone_id_col: str = "tile_id",
    ring_col: str = "ring",
    lat_col: str = "lat",
    lon_col: str = "lon",
    res: int = 7,
) -> DataFrame:
    """Zonal statistics: aggregate the point measures falling inside
    each zone polygon — the raster-analysis staple (mean elevation per
    watershed; here: per-tile rollups of page/point attributes), and
    the spatial dual of :func:`geodiff_spark.spatial.tiles.rasterize`
    (which aggregates per CELL; this aggregates per POLYGON).

    ``aggs`` is a list of already-aliased aggregate Columns (keep them
    order-independent — counts, integer sums, min/max — for
    engine-exact parity; float SUM is order-dependent by nature).

    Scale shape: the zone side is exploded to covering cells and
    BROADCAST (zones are small — admin boundaries, tile schemes), so
    the point side reaches the PIP refine without any shuffle; the
    only Exchange in the plan is the final groupBy(zone) with map-side
    partial aggregation. Points falling in no zone are dropped (inner
    semantics), matching rasterize over an area of interest.
    """
    assigned = pip_join(
        points,
        zones.select(zone_id_col, ring_col),
        ring_col=ring_col,
        lat_col=lat_col,
        lon_col=lon_col,
        res=res,
    )
    return assigned.groupBy(zone_id_col).agg(*aggs)
