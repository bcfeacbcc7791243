"""Point-to-segment snapping (the map-matching primitive: GPS pings ->
nearest road edge). Spark has no spatial join; the scalable shape is

  1. BLOCK: points and segments share an integer grid cell (a segment
     blocks by its FIRST endpoint's cell and is assumed short relative
     to the pitch — split long edges upstream, the same pre-condition
     as spatial/segments.py); candidates come from ONE equi-join on
     the cell, so candidate mass is the sum of per-cell density
     products, never |P|x|S|;
  2. REFINE: exact integer point-to-segment distance in CELL-LOCAL
     coordinates. The textbook formula d^2 = |pa|^2 - dot^2/L2 hides a
     division; clearing it per candidate while keeping ONE total order
     across segments of different lengths uses the scaled floor form

         d2q = (|pa|^2 * L2 - clamp-adjusted dot terms) * SCALE div L2

     — exact int64 (cell-local coords bound every product), identical
     in Spark and DuckDB, monotone in the true distance up to the
     1/SCALE quantum;
  3. PICK: argmin per point via min(struct(d2q, seg_id)) — one
     map-side-combining groupBy, deterministic tie-break to the lowest
     segment id.

Points whose cell holds no segment are absent from the output
(cell-blocked matching by contract; widen the cell or scatter segments
to a ring upstream for looser matching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SNAP_SCALE = 1024  # distance quantum: 1/32 grid-unit in d, exact in d^2


def _d2q_sql(px, py, ax, ay, bx, by) -> str:
    """Scaled squared point-segment distance, pure integer SQL (shared
    dialect: only +,-,*, comparisons, CASE — valid in Spark and DuckDB).
    Endpoint branches multiply through by L2 so every branch shares the
    (d2 * L2 * SCALE) numerator; degenerate segments (L2 = 0) fall back
    to the point distance."""
    abx, aby = f"({bx} - {ax})", f"({by} - {ay})"
    pax, pay = f"({px} - {ax})", f"({py} - {ay})"
    pbx, pby = f"({px} - {bx})", f"({py} - {by})"
    l2 = f"({abx}*{abx} + {aby}*{aby})"
    dot = f"({pax}*{abx} + {pay}*{aby})"
    pa2 = f"({pax}*{pax} + {pay}*{pay})"
    pb2 = f"({pbx}*{pbx} + {pby}*{pby})"
    return (
        f"(CASE WHEN {l2} = 0 THEN {pa2} * {SNAP_SCALE} "
        f"WHEN {dot} <= 0 THEN {pa2} * {SNAP_SCALE} "
        f"WHEN {dot} >= {l2} THEN {pb2} * {SNAP_SCALE} "
        f"ELSE (({pa2} * {l2} - {dot}*{dot}) * {SNAP_SCALE}) / {l2} END)"
    )


def snap_points(
    points: DataFrame,
    segments: DataFrame,
    *,
    cell: int,
    point_id: str = "pid",
    seg_id: str = "sid",
) -> DataFrame:
    """points(pid, x, y) x segments(sid, ax, ay, bx, by) -> per point
    the nearest same-cell segment: (pid, x, y, sid, d2q). Integer
    coords; ``cell`` is the blocking grid pitch (points and both
    segment endpoints must be non-negative ints so cell = v DIV pitch
    matches DuckDB's //).

    Overflow contract (enforced): the refine step's largest product is
    pa2 * L2 * SNAP_SCALE (dot^2 <= pa2*L2 by Cauchy-Schwarz), with
    pa2 < 2*cell^2 because the point and the segment's first endpoint
    share a cell. The 'short segments' precondition is therefore the
    concrete bound  2*cell^2 * max(L2) * SNAP_SCALE < 2^63 , i.e.
    cell * max_extent < ~4.7e7 grid units. One cheap agg over the
    (small) segments side checks it at call time and raises instead of
    silently wrapping int64 — split long edges upstream if it fires."""
    _MAX = (1 << 63) - 1
    max_l2 = segments.select(
        F.max(
            F.expr("(bx-ax)*(bx-ax) + (by-ay)*(by-ay)")
        ).alias("l2")
    ).first()["l2"]
    if max_l2 is not None and 2 * int(cell) ** 2 * int(max_l2) * SNAP_SCALE > _MAX:
        raise ValueError(
            f"snap_points overflow bound violated: 2*cell^2*max(L2)*"
            f"{SNAP_SCALE} = {2 * int(cell) ** 2 * int(max_l2) * SNAP_SCALE}"
            f" > 2^63-1 (cell={cell}, max segment L2={max_l2}); split long"
            " segments or shrink the cell pitch"
        )
    p = points.select(
        F.col(point_id), "x", "y",
        F.expr(f"x div {int(cell)}").alias("_cx"),
        F.expr(f"y div {int(cell)}").alias("_cy"),
    )
    s = segments.select(
        F.col(seg_id), "ax", "ay", "bx", "by",
        F.expr(f"ax div {int(cell)}").alias("_cx"),
        F.expr(f"ay div {int(cell)}").alias("_cy"),
    )
    # cell-local coordinates bound every product inside int64
    local = (
        p.join(s, ["_cx", "_cy"])
        .withColumn("_ox", F.col("_cx") * int(cell))
        .withColumn("_oy", F.col("_cy") * int(cell))
    )
    d2q = _d2q_sql("(x - _ox)", "(y - _oy)", "(ax - _ox)", "(ay - _oy)",
                   "(bx - _ox)", "(by - _oy)").replace("/", "div")
    scored = local.withColumn("_d2q", F.expr(d2q))
    best = (
        scored.groupBy(point_id, "x", "y")
        .agg(
            F.min(F.struct(F.col("_d2q"), F.col(seg_id))).alias("_b")
        )
        .select(
            point_id, "x", "y",
            F.col(f"_b.{seg_id}").alias(seg_id),
            F.col("_b._d2q").alias("d2q"),
        )
    )
    return best


def snap_points_sql(
    points_sql: str,
    segments_sql: str,
    *,
    cell: int,
    point_id: str = "pid",
    seg_id: str = "sid",
) -> str:
    """DuckDB twin of :func:`snap_points` (same blocking, same scaled
    integer distance, same (d2q, sid) tie-break via row_number)."""
    c = int(cell)
    ox, oy = f"(p.cx * {c})", f"(p.cy * {c})"
    d2q = _d2q_sql(f"(p.x - {ox})", f"(p.y - {oy})", f"(s.ax - {ox})",
                   f"(s.ay - {oy})", f"(s.bx - {ox})", f"(s.by - {oy})")
    d2q = d2q.replace("/", "//")
    return f"""
    WITH p AS (SELECT *, x // {c} AS cx, y // {c} AS cy FROM ({points_sql})),
    s AS (SELECT *, ax // {c} AS cx, ay // {c} AS cy FROM ({segments_sql})),
    cand AS (
      SELECT p.{point_id}, p.x, p.y, s.{seg_id}, {d2q} AS d2q
      FROM p JOIN s ON p.cx = s.cx AND p.cy = s.cy
    )
    SELECT {point_id}, x, y, {seg_id}, d2q FROM (
      SELECT *, row_number() OVER (PARTITION BY {point_id}
                                   ORDER BY d2q, {seg_id}) AS rn
      FROM cand
    ) WHERE rn = 1
    """
