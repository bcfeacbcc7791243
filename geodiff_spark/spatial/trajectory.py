"""Trajectory stay-point detection: maximal dwell episodes per moving
key.

Reference parity note: geodiff has no trajectory layer — this is part
of the geospatial-analytics surface over the same cell machinery
(spatial/cells.py): a stay is a run of consecutive pings in the SAME
quantized cell, which makes the detector deterministic and exactly
restatable in SQL (the classic Li/Zheng radius-based detector depends
on float distance accumulation order; the cell formulation does not).

Scale shape: ONE key shuffle total — the lag/flag windows, the
gaps-and-islands cumsum, and the per-(key, island) fold all reuse the
same (key) partitioning, so Catalyst plans a single Exchange. No join,
no self-join, no explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stay_points(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    lat_col: str,
    lon_col: str,
    tiebreak_col: str,
    cell_milli: int = 500,
    max_gap_s: int = 1800,
    min_duration_s: int = 900,
) -> DataFrame:
    """Maximal stay episodes per key: consecutive pings (ordered by
    (ts, tiebreak)) that fall in the same ``cell_milli``-milli-degree
    cell with every consecutive gap ≤ ``max_gap_s``; episodes shorter
    than ``min_duration_s`` are dropped. Emits one row per stay:
    (key, cell_lat, cell_lon, start_us, end_us, n_points, dur_ms) —
    all integers (cell coords are the quantized indices; the float
    centroid is a caller-side division).

    A new episode starts when the cell changes OR the gap exceeds the
    threshold (gaps-and-islands: flag + prefix-sum island id). The
    quantization is floor(coord * 1000) DIV cell_milli — the same
    milli-degree integer grid as spatial/measure.py, identical
    arithmetic in Spark and DuckDB.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    q = df.select(
        F.col(key_col).alias("k"),
        us.alias("us"),
        F.col(tiebreak_col).alias("tb"),
        F.expr(
            f"cast(floor({lat_col} * 1000) as bigint) div {int(cell_milli)}"
        ).alias("cla"),
        F.expr(
            f"cast(floor({lon_col} * 1000) as bigint) div {int(cell_milli)}"
        ).alias("clo"),
    )
    w = Window.partitionBy("k").orderBy("us", "tb")
    flagged = q.select(
        "k",
        "us",
        "tb",
        "cla",
        "clo",
        F.when(
            (F.lag("cla").over(w).isNull())
            | (F.lag("cla").over(w) != F.col("cla"))
            | (F.lag("clo").over(w) != F.col("clo"))
            | (F.col("us") - F.lag("us").over(w) > F.lit(1_000_000 * int(max_gap_s))),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    cum = Window.partitionBy("k").orderBy("us", "tb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    isl = flagged.withColumn("island", F.sum("brk").over(cum))
    out = (
        isl.groupBy("k", "island", "cla", "clo")
        .agg(
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .withColumn("dur_ms", F.expr("(end_us - start_us) div 1000"))
        .filter(F.col("dur_ms") >= F.lit(1000 * int(min_duration_s)))
        .select(
            F.col("k").alias(key_col),
            F.col("cla").alias("cell_lat"),
            F.col("clo").alias("cell_lon"),
            "start_us",
            "end_us",
            "n_points",
            "dur_ms",
        )
    )
    return out


def stay_points_sql(
    table: str,
    key_col: str,
    ts_col: str,
    lat_col: str,
    lon_col: str,
    tiebreak_col: str,
    cell_milli: int = 500,
    max_gap_s: int = 1800,
    min_duration_s: int = 900,
) -> str:
    """DuckDB twin of :func:`stay_points` (same windows, same integer
    grid)."""
    return f"""
    WITH q AS (
      SELECT {key_col} AS k, epoch_us({ts_col}) AS us, {tiebreak_col} AS tb,
             CAST(FLOOR({lat_col} * 1000) AS BIGINT) // {int(cell_milli)} AS cla,
             CAST(FLOOR({lon_col} * 1000) AS BIGINT) // {int(cell_milli)} AS clo
      FROM {table}
    ),
    flagged AS (
      SELECT k, us, tb, cla, clo,
             CASE WHEN lag(cla) OVER w IS NULL
                    OR lag(cla) OVER w <> cla
                    OR lag(clo) OVER w <> clo
                    OR us - lag(us) OVER w > {1_000_000 * int(max_gap_s)}
                  THEN 1 ELSE 0 END AS brk
      FROM q
      WINDOW w AS (PARTITION BY k ORDER BY us, tb)
    ),
    isl AS (
      SELECT *, SUM(brk) OVER (PARTITION BY k ORDER BY us, tb
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
      FROM flagged
    ),
    st AS (
      SELECT k, island, cla, clo,
             MIN(us) AS start_us, MAX(us) AS end_us,
             COUNT(*) AS n_points,
             (MAX(us) - MIN(us)) // 1000 AS dur_ms
      FROM isl GROUP BY k, island, cla, clo
    )
    SELECT k AS {key_col}, cla AS cell_lat, clo AS cell_lon,
           start_us, end_us, CAST(n_points AS BIGINT) AS n_points, dur_ms
    FROM st WHERE dur_ms >= {1000 * int(min_duration_s)}
    """


def polyline_keypoints(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    tiebreak_col: str,
    *,
    tol: int = 2,
) -> DataFrame:
    """Curvature-based trajectory decimation: keep the points that
    carry a polyline's shape, drop the collinear middles — the
    window-local cousin of Douglas-Peucker (DP's recursive global
    split is inherently sequential per line; this local criterion is
    ONE lag/lead window per key and scales to billions of pings).

    A point is a keypoint iff it is an endpoint of its key's sequence,
    or its perpendicular deviation from the chord (prev -> next)
    exceeds ``tol`` grid units. With integer coords the test clears
    denominators exactly:

        cross^2 > tol^2 * |chord|^2        (chord nonzero)
        |cur - prev|^2 > tol^2             (out-and-back: chord == 0)

    where cross = (x1-x0)*(y2-y0) - (y1-y0)*(x2-x0) — the same integer
    orientation kernel as spatial/segments.py. No floats, no UDF; the
    per-key window sort is the only shuffle.
    -> (key, ts, x, y, is_keypoint)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    x0, y0 = F.lag(x_col).over(w), F.lag(y_col).over(w)
    x2, y2 = F.lead(x_col).over(w), F.lead(y_col).over(w)
    x1, y1 = F.col(x_col), F.col(y_col)
    cross = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    chord2 = (x2 - x0) * (x2 - x0) + (y2 - y0) * (y2 - y0)
    d2 = (x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)
    t2 = F.lit(int(tol) * int(tol))
    keep = (
        x0.isNull()
        | x2.isNull()
        | F.when(chord2 == 0, d2 > t2).otherwise(cross * cross > t2 * chord2)
    )
    return df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(x_col),
        F.col(y_col),
        keep.alias("is_keypoint"),
    )


def polyline_keypoints_sql(
    src_sql: str,
    key_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    tiebreak_col: str,
    *,
    tol: int = 2,
) -> str:
    """DuckDB twin of :func:`polyline_keypoints`."""
    t2 = int(tol) * int(tol)
    return f"""
    WITH p AS (
      SELECT {key_col}, {ts_col}, {x_col}, {y_col},
             LAG({x_col}) OVER wk AS x0, LAG({y_col}) OVER wk AS y0,
             LEAD({x_col}) OVER wk AS x2, LEAD({y_col}) OVER wk AS y2
      FROM ({src_sql})
      WINDOW wk AS (PARTITION BY {key_col} ORDER BY {ts_col}, {tiebreak_col})
    )
    SELECT {key_col}, {ts_col}, {x_col}, {y_col},
      (x0 IS NULL OR x2 IS NULL OR
       CASE WHEN (x2-x0)*(x2-x0) + (y2-y0)*(y2-y0) = 0
            THEN ({x_col}-x0)*({x_col}-x0) + ({y_col}-y0)*({y_col}-y0) > {t2}
            ELSE (({x_col}-x0)*(y2-y0) - ({y_col}-y0)*(x2-x0))
                 * (({x_col}-x0)*(y2-y0) - ({y_col}-y0)*(x2-x0))
                 > {t2} * ((x2-x0)*(x2-x0) + (y2-y0)*(y2-y0)) END)
        AS is_keypoint
    FROM p
    """
