"""Rectangle-overlay join: intersection areas between two sets of
axis-aligned rectangles (tile schemes x admin bboxes, coverage grids x
AOI boxes).

Same candidate strategy as the segment join (spatial/segments.py): cover
each rectangle with grid cells, equi-join on the cell, keep a pair only
in the first cell of the two covers' overlap (unique per pair -> no
distinct shuffle), then compute the exact closed-form intersection:

    iw = min(ax1, bx1) - max(ax0, bx0)
    ih = min(ay1, by1) - max(ay0, by0)
    area = iw * ih  when iw > 0 and ih > 0

Pure min/max/subtract/multiply on doubles in identical order in the
Spark and SQL twins -> bit-exact cross-engine. Rectangles degenerate or
merely touching (iw == 0 or ih == 0) are excluded (open overlap), which
matches the half-open tiling convention used by pip_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cover(df: DataFrame, prefix: str, res: int, max_cells: int) -> DataFrame:
    from geodiff_spark.spatial.segments import _cell1d

    x0, y0, x1, y1 = (F.col(f"{prefix}{c}") for c in ("x0", "y0", "x1", "y1"))
    cx_lo = _cell1d(x0, -180.0, 360.0, res)
    cx_hi = _cell1d(x1, -180.0, 360.0, res)
    cy_lo = _cell1d(y0, -90.0, 180.0, res)
    cy_hi = _cell1d(y1, -90.0, 180.0, res)
    guard = F.when(
        F.assert_true(
            (cx_hi - cx_lo < F.lit(max_cells)) & (cy_hi - cy_lo < F.lit(max_cells)),
            F.lit(f"rect spans >= {max_cells} cells per axis — raise res"),
        ).isNull(),
        cx_hi,
    )
    return (
        df.withColumn("_cx_lo", cx_lo)
        .withColumn("_cy_lo", cy_lo)
        .withColumn("_cx", F.explode(F.sequence(cx_lo, guard)))
        .withColumn("_cy", F.explode(F.sequence(F.col("_cy_lo"), cy_hi)))
    )


def rect_overlap_join(
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
    """(a_id, b_id, area) for every overlapping rectangle pair.

    ``a``/``b`` carry ``{prefix}x0 <= {prefix}x1`` and ``{prefix}y0 <=
    {prefix}y1`` (normalized corners) + id columns.
    """
    ac = _cover(a, a_prefix, res, max_cells)
    bc = _cover(b, b_prefix, res, max_cells)
    j = ac.alias("A").join(
        bc.alias("B"),
        (F.col("A._cx") == F.col("B._cx")) & (F.col("A._cy") == F.col("B._cy")),
        "inner",
    )
    first_cell = (
        (F.col("A._cx") == F.greatest(F.col("A._cx_lo"), F.col("B._cx_lo")))
        & (F.col("A._cy") == F.greatest(F.col("A._cy_lo"), F.col("B._cy_lo")))
    )
    iw = F.least(F.col(f"A.{a_prefix}x1"), F.col(f"B.{b_prefix}x1")) - F.greatest(
        F.col(f"A.{a_prefix}x0"), F.col(f"B.{b_prefix}x0")
    )
    ih = F.least(F.col(f"A.{a_prefix}y1"), F.col(f"B.{b_prefix}y1")) - F.greatest(
        F.col(f"A.{a_prefix}y0"), F.col(f"B.{b_prefix}y0")
    )
    return (
        j.filter(first_cell & (iw > F.lit(0.0)) & (ih > F.lit(0.0)))
        .select(
            F.col(f"A.{a_id}").alias(a_id),
            F.col(f"B.{b_id}").alias(b_id),
            (iw * ih).alias("area"),
        )
    )


def rect_overlap_sql(
    a_src: str,
    b_src: str,
    *,
    a_id: str,
    b_id: str,
    a_prefix: str = "a",
    b_prefix: str = "b",
) -> str:
    """Semantic oracle: raw cross join + the same closed-form overlap
    (no cell replay — cross-checks cover + dedup)."""
    ap, bp = a_prefix, b_prefix
    iw = (
        f"(LEAST(a.{ap}x1, b.{bp}x1) - GREATEST(a.{ap}x0, b.{bp}x0))"
    )
    ih = (
        f"(LEAST(a.{ap}y1, b.{bp}y1) - GREATEST(a.{ap}y0, b.{bp}y0))"
    )
    return f"""
    SELECT a.{a_id} AS {a_id}, b.{b_id} AS {b_id}, {iw} * {ih} AS area
    FROM ({a_src}) a, ({b_src}) b
    WHERE {iw} > 0.0 AND {ih} > 0.0
    """
