"""Grid interpolation: inverse-distance-weighted (IDW) fill of empty
cells from their 8-neighborhood — raster gap-filling (what GDAL's
gdal_fillnodata does locally) expressed as one explode + one groupBy.

Reference parity note: geodiff has no raster interpolation; this is the
raster<->vector surface of the north rule (tile materialization needs
hole-free rasters). The oracle contract is the repo rule: integer-exact
end to end — integer cell coords, integer values, and the IDW quotient

    est = sum(v_i / d_i^2) / sum(1 / d_i^2)

cleared to integers with the lcm trick: d^2 in the 8-neighborhood is 1
(edge) or 2 (corner), so multiplying through by 2 gives integer weights
w = 2 // d^2 in {2, 1} and

    est_milli = (sum(v_i * w_i) * 1000) // sum(w_i)

— bit-identical in Spark and DuckDB, no float division anywhere.

Scale shape (a 10^12-cell raster):
  * each SAMPLE cell explodes to its 8 neighbor targets (bounded 8x
    fan-out, the k-ring trick from spatial/knn.py);
  * ONE map-side-combining groupBy on the target cell accumulates
    (sum v*w, sum w);
  * a broadcast-free LEFT ANTI join against the sample set keeps only
    truly empty targets (both sides are cell-keyed — co-partitioned
    after the groupBy, and AQE broadcasts the smaller side when it
    fits).
No cartesian pass, no UDF, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 8-neighborhood offsets with their integer IDW weights (2 // d^2).
NEIGH = [
    (dx, dy, 2 if dx == 0 or dy == 0 else 1)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    if (dx, dy) != (0, 0)
]


def idw_fill(
    samples: DataFrame,
    x_col: str,
    y_col: str,
    val_col: str,
    *,
    scale: int = 1000,
) -> DataFrame:
    """Estimate values for empty grid cells adjacent to samples.

    ``samples``: one row per occupied integer cell (x, y, integer v).
    Returns (x, y, n_neighbors, est_milli) for every EMPTY cell with at
    least one occupied neighbor; est_milli = IDW estimate scaled by
    ``scale`` and floor-divided (exact)."""
    s = samples.select(
        F.col(x_col).cast("long").alias("sx"),
        F.col(y_col).cast("long").alias("sy"),
        F.col(val_col).cast("long").alias("v"),
    )
    contrib = s.select(
        "sx", "sy", "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("sx") + F.lit(dx)).alias("tx"),
                        (F.col("sy") + F.lit(dy)).alias("ty"),
                        F.lit(w).alias("w"),
                    )
                    for dx, dy, w in NEIGH
                ]
            )
        ).alias("t"),
    ).select(
        F.col("t.tx").alias("x"), F.col("t.ty").alias("y"),
        (F.col("v") * F.col("t.w")).alias("vw"), F.col("t.w").alias("w"),
    )
    agg = contrib.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.sum("vw").alias("_num"),
        F.sum("w").alias("_den"),
    )
    empty = agg.join(
        s.select(F.col("sx").alias("x"), F.col("sy").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    return empty.select(
        "x", "y", "n_neighbors",
        F.expr(f"(_num * {int(scale)}) div _den").alias("est_milli"),
    )


def idw_fill_sql(
    src_sql: str,
    x_col: str,
    y_col: str,
    val_col: str,
    *,
    scale: int = 1000,
) -> str:
    """DuckDB twin of :func:`idw_fill` (same integer weights, same
    floor division)."""
    offs = ", ".join(f"({dx}, {dy}, {w})" for dx, dy, w in NEIGH)
    return f"""
    WITH s AS (
      SELECT CAST({x_col} AS BIGINT) AS sx, CAST({y_col} AS BIGINT) AS sy,
             CAST({val_col} AS BIGINT) AS v
      FROM ({src_sql})
    ),
    neigh(dx, dy, w) AS (VALUES {offs}),
    contrib AS (
      SELECT s.sx + n.dx AS x, s.sy + n.dy AS y,
             s.v * n.w AS vw, n.w AS w
      FROM s CROSS JOIN neigh n
    ),
    agg AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_neighbors,
             CAST(SUM(vw) AS BIGINT) AS num, CAST(SUM(w) AS BIGINT) AS den
      FROM contrib GROUP BY x, y
    )
    SELECT a.x, a.y, a.n_neighbors,
           (a.num * {int(scale)}) // a.den AS est_milli
    FROM agg a ANTI JOIN s ON a.x = s.sx AND a.y = s.sy
    """
