"""Segment-intersection spatial join: which segments of set A cross
segments of set B (roads x admin boundaries, cable routes x parcel
edges, ...).

Spark has no spatial join operator — a raw theta-join on the CLRS
intersection predicate plans as a broadcast-nested-loop / cartesian
product. Strategy here:

  1. cover each segment's bbox with grid cells at ``res`` (the bbox of a
     short segment spans at most 2x2 cells when the cell side exceeds
     the segment extent — fan-out is bounded and known);
  2. equi-join on the cell (one hash exchange per side, AQE skew-split);
  3. kill duplicate candidates WITHOUT a distinct shuffle: a candidate
     pair is kept only in the *first* cell of the two bboxes' overlap
     (cell_x == max of the bbox min-x cells, same for y) — that cell is
     unique per pair, so the refine sees each pair exactly once;
  4. refine with the exact orientation predicate (differences and
     products of doubles — identical expression order in the Spark
     Column and DuckDB SQL twins, so results are bit-exact).

Intersection predicate (CLRS 33.1 segments-intersect): proper crossing
via opposite orientations on both segments, plus collinear/endpoint
touches via on-segment box tests. cross(o,p,q) =
(px-ox)*(qy-oy) - (py-oy)*(qx-ox).

Scale: candidate mass is sum over cells of |A_cell|*|B_cell| — local
density products, never |A|*|B|. Long segments (bbox spanning >
``max_cells`` cells per axis) fail loudly via a row-level guard (split
them upstream), the same fail-don't-corrupt stance as diff's NULL-PK
guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell1d(v: Column, lo: float, span: float, res: int) -> Column:
    n = float(1 << res)
    hi = F.lit((1 << res) - 1).cast("long")
    return F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(span) * F.lit(n)).cast("long"),
                   F.lit(0).cast("long")),
        hi,
    )


def _cell1d_sql(v: str, lo: float, span: float, res: int) -> str:
    n = float(1 << res)
    hi = (1 << res) - 1
    return (
        f"LEAST(GREATEST(CAST(FLOOR((({v}) - {lo}) / {span} * {n}) AS BIGINT),"
        f" 0), {hi})"
    )


def _cross(ox, oy, px, py, qx, qy):
    """cross(o,p,q) — works for both Columns and SQL strings via the
    caller providing homogeneous operand types."""
    return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)


def _cross_sql(ox, oy, px, py, qx, qy) -> str:
    return (
        f"((({px}) - ({ox})) * (({qy}) - ({oy}))"
        f" - (({py}) - ({oy})) * (({qx}) - ({ox})))"
    )


def _on_seg(px, py, qx, qy, rx, ry):
    """Collinear r on box of segment pq (Columns)."""
    return (
        (F.least(px, qx) <= rx) & (rx <= F.greatest(px, qx))
        & (F.least(py, qy) <= ry) & (ry <= F.greatest(py, qy))
    )


def _on_seg_sql(px, py, qx, qy, rx, ry) -> str:
    return (
        f"(LEAST({px}, {qx}) <= {rx} AND {rx} <= GREATEST({px}, {qx})"
        f" AND LEAST({py}, {qy}) <= {ry} AND {ry} <= GREATEST({py}, {qy}))"
    )


def segments_intersect_col(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> Column:
    """CLRS segments-intersect as a Column predicate (proper + touches)."""
    d1 = _cross(bx0, by0, bx1, by1, ax0, ay0)
    d2 = _cross(bx0, by0, bx1, by1, ax1, ay1)
    d3 = _cross(ax0, ay0, ax1, ay1, bx0, by0)
    d4 = _cross(ax0, ay0, ax1, ay1, bx1, by1)
    zero = F.lit(0.0)
    proper = (
        (((d1 > zero) & (d2 < zero)) | ((d1 < zero) & (d2 > zero)))
        & (((d3 > zero) & (d4 < zero)) | ((d3 < zero) & (d4 > zero)))
    )
    return (
        proper
        | ((d1 == zero) & _on_seg(bx0, by0, bx1, by1, ax0, ay0))
        | ((d2 == zero) & _on_seg(bx0, by0, bx1, by1, ax1, ay1))
        | ((d3 == zero) & _on_seg(ax0, ay0, ax1, ay1, bx0, by0))
        | ((d4 == zero) & _on_seg(ax0, ay0, ax1, ay1, bx1, by1))
    )


def segments_intersect_sql(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> str:
    """SQL twin of :func:`segments_intersect_col` (same operation order)."""
    d1 = _cross_sql(bx0, by0, bx1, by1, ax0, ay0)
    d2 = _cross_sql(bx0, by0, bx1, by1, ax1, ay1)
    d3 = _cross_sql(ax0, ay0, ax1, ay1, bx0, by0)
    d4 = _cross_sql(ax0, ay0, ax1, ay1, bx1, by1)
    proper = (
        f"((({d1} > 0.0 AND {d2} < 0.0) OR ({d1} < 0.0 AND {d2} > 0.0))"
        f" AND (({d3} > 0.0 AND {d4} < 0.0) OR ({d3} < 0.0 AND {d4} > 0.0)))"
    )
    return (
        f"({proper}"
        f" OR ({d1} = 0.0 AND {_on_seg_sql(bx0, by0, bx1, by1, ax0, ay0)})"
        f" OR ({d2} = 0.0 AND {_on_seg_sql(bx0, by0, bx1, by1, ax1, ay1)})"
        f" OR ({d3} = 0.0 AND {_on_seg_sql(ax0, ay0, ax1, ay1, bx0, by0)})"
        f" OR ({d4} = 0.0 AND {_on_seg_sql(ax0, ay0, ax1, ay1, bx1, by1)}))"
    )


def _covered(df: DataFrame, prefix: str, res: int, max_cells: int) -> DataFrame:
    """Explode a segment table to (cell_x, cell_y) cover of its bbox,
    keeping the bbox min-cells for the dedup predicate."""
    x0, y0, x1, y1 = (F.col(f"{prefix}{c}") for c in ("x0", "y0", "x1", "y1"))
    cx_lo = _cell1d(F.least(x0, x1), -180.0, 360.0, res)
    cx_hi = _cell1d(F.greatest(x0, x1), -180.0, 360.0, res)
    cy_lo = _cell1d(F.least(y0, y1), -90.0, 180.0, res)
    cy_hi = _cell1d(F.greatest(y0, y1), -90.0, 180.0, res)
    guard = F.when(
        F.assert_true(
            (cx_hi - cx_lo < F.lit(max_cells)) & (cy_hi - cy_lo < F.lit(max_cells)),
            F.lit(f"segment bbox spans >= {max_cells} cells per axis — "
                  "split long segments upstream"),
        ).isNull(),
        cx_hi,
    )
    return (
        df.withColumn("_cx_lo", cx_lo)
        .withColumn("_cy_lo", cy_lo)
        .withColumn("_cx", F.explode(F.sequence(cx_lo, guard)))
        .withColumn("_cy", F.explode(F.sequence(F.col("_cy_lo"), cy_hi)))
    )


def segment_intersect_join(
    a: DataFrame,
    b: DataFrame,
    *,
    res: int,
    a_id: str,
    b_id: str,
    a_prefix: str = "a",
    b_prefix: str = "b",
    max_cells: int = 64,
) -> DataFrame:
    """(a_id, b_id) pairs of intersecting segments.

    ``a``/``b`` carry columns ``{prefix}x0 .. {prefix}y1`` (endpoint
    coords, degrees) + their id columns.
    """
    ac = _covered(a, a_prefix, res, max_cells)
    bc = _covered(b, b_prefix, res, max_cells)
    j = ac.alias("A").join(
        bc.alias("B"),
        (F.col("A._cx") == F.col("B._cx")) & (F.col("A._cy") == F.col("B._cy")),
        "inner",
    )
    # dedup without a shuffle: keep the pair only in the first cell of
    # the two bboxes' overlap (unique per pair)
    first_cell = (
        (F.col("A._cx") == F.greatest(F.col("A._cx_lo"), F.col("B._cx_lo")))
        & (F.col("A._cy") == F.greatest(F.col("A._cy_lo"), F.col("B._cy_lo")))
    )
    pred = segments_intersect_col(
        F.col(f"A.{a_prefix}x0"), F.col(f"A.{a_prefix}y0"),
        F.col(f"A.{a_prefix}x1"), F.col(f"A.{a_prefix}y1"),
        F.col(f"B.{b_prefix}x0"), F.col(f"B.{b_prefix}y0"),
        F.col(f"B.{b_prefix}x1"), F.col(f"B.{b_prefix}y1"),
    )
    return j.filter(first_cell & pred).select(
        F.col(f"A.{a_id}").alias(a_id), F.col(f"B.{b_id}").alias(b_id)
    )
