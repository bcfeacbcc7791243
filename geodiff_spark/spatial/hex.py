"""Hexagonal cell assignment (the H3-style hex complement to the
square Morton index in spatial/cells.py): exact integer cube rounding
in axial coordinates.

An H3-style hex index answers "which hexagon contains this point".
The float pipeline (project lon/lat -> fractional axial -> cube-round)
hides an irrational (sqrt(3)) in the projection, so this module splits
the work the way the integer-exactness rule demands:

  * the PROJECTION (lon/lat -> milli-axial integers) is the caller's
    quantization step — same contract as the milli-degree grids in
    spatial/measure.py and trajectory.py;
  * the KERNEL — cube rounding of fractional axial coordinates
    (q, r, s = -q-r must sum to 0 after rounding; the component with
    the largest rounding error is recomputed from the other two,
    Amit Patel's classic algorithm) — is exact int64 arithmetic with
    pinned tie rules (round half up via +500 // 1000 on offset-shifted
    values so both engines round identically for negatives; diff ties
    fix q before r before s).

Pure codegen column expressions (no UDF) + a character-identical
DuckDB twin; assignment is zero-shuffle, the density rollup is one
map-side-combining groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: offset that makes every intermediate non-negative before integer
#: division (positive division truncates == floors, so Spark's `div`
#: and DuckDB's `//` agree bit for bit); divisible by the 1000 scale.
_OFF = 2_000_000_000


def _round_milli(e: str) -> str:
    """Round-half-up a milli-scaled integer expression to units,
    identically in Spark SQL and DuckDB (both truncate positive
    division)."""
    return f"(({e} + 500 + {_OFF}) DIV 1000 - {_OFF // 1000})"


def hex_round_sql(qm: str, rm: str, dialect: str) -> tuple[str, str]:
    """(hex_q, hex_r) SQL expressions for milli-axial integer inputs.

    ``dialect``: 'spark' (DIV) or 'duckdb' (//) — the ONLY difference
    between the twins is the integer-division spelling."""
    div = "DIV" if dialect == "spark" else "//"

    def rnd(e: str) -> str:
        return _round_milli(e).replace("DIV", div)

    sm = f"(-({qm}) - ({rm}))"
    rq, rr, rs = rnd(qm), rnd(rm), rnd(sm)
    dq = f"abs({rq} * 1000 - ({qm}))"
    dr = f"abs({rr} * 1000 - ({rm}))"
    ds = f"abs({rs} * 1000 - ({sm}))"
    fix_needed = f"({rq} + {rr} + {rs} <> 0)"
    hex_q = (
        f"(CASE WHEN {fix_needed} AND {dq} >= {dr} AND {dq} >= {ds} "
        f"THEN -({rr}) - ({rs}) ELSE {rq} END)"
    )
    hex_r = (
        f"(CASE WHEN {fix_needed} AND NOT ({dq} >= {dr} AND {dq} >= {ds}) "
        f"AND {dr} >= {ds} THEN -({rq}) - ({rs}) ELSE {rr} END)"
    )
    return hex_q, hex_r


def hex_round_cols(qm: Column, rm: Column) -> tuple[Column, Column]:
    """Column form of :func:`hex_round_sql` (same arithmetic)."""
    # restate the arithmetic with Column ops; /1000-then-truncate on the
    # offset-shifted positive operands equals integer division exactly
    # (quotients < 4e6, far inside double precision)
    off = F.lit(_OFF)

    def rnd(e: Column) -> Column:
        return ((e + 500 + off) / 1000).cast("long") - F.lit(_OFF // 1000)

    sm = -qm - rm
    rq, rr, rs = rnd(qm), rnd(rm), rnd(sm)
    dq = F.abs(rq * 1000 - qm)
    dr = F.abs(rr * 1000 - rm)
    ds = F.abs(rs * 1000 - sm)
    fix = rq + rr + rs != 0
    q_fix = fix & (dq >= dr) & (dq >= ds)
    r_fix = fix & ~((dq >= dr) & (dq >= ds)) & (dr >= ds)
    hex_q = F.when(q_fix, -rr - rs).otherwise(rq)
    hex_r = F.when(r_fix, -rq - rs).otherwise(rr)
    return hex_q.cast("long"), hex_r.cast("long")


def hexbin_counts(
    df: DataFrame, qm_col: str, rm_col: str, *, extra_aggs=None
) -> DataFrame:
    """Density rollup per hexagon: zero-shuffle assignment + ONE
    map-side-combining groupBy. -> (hex_q, hex_r, n[, extras])."""
    hq, hr = hex_round_cols(
        F.col(qm_col).cast("long"), F.col(rm_col).cast("long")
    )
    assigned = df.withColumn("hex_q", hq).withColumn("hex_r", hr)
    aggs = [F.count(F.lit(1)).alias("n")] + list(extra_aggs or [])
    return assigned.groupBy("hex_q", "hex_r").agg(*aggs)


def hexbin_counts_sql(src_sql: str, qm: str, rm: str) -> str:
    """DuckDB twin of :func:`hexbin_counts`."""
    hq, hr = hex_round_sql(qm, rm, "duckdb")
    return f"""
    SELECT {hq} AS hex_q, {hr} AS hex_r, COUNT(*) AS n
    FROM ({src_sql}) GROUP BY 1, 2
    """


def hex_ring_offsets(k: int = 1) -> list[tuple[int, int]]:
    """Axial offsets of the hex disk of radius ``k`` (excluding the
    center): all (dq, dr) with max(|dq|, |dr|, |dq+dr|) <= k — the
    gridDisk neighborhood (6 cells at k=1, 18 at k=2, 3k(k+1) total)."""
    return [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(-k, k + 1)
        if (dq, dr) != (0, 0) and max(abs(dq), abs(dr), abs(dq + dr)) <= k
    ]


def hex_focal_counts(
    cells: DataFrame, q_col: str, r_col: str, n_col: str, *, k: int = 1
) -> DataFrame:
    """Per-hex neighborhood rollup (the hex twin of tiles.focal_stats /
    H3 gridDisk aggregation): each occupied hex scatters its count to
    its 3k(k+1) disk neighbors — bounded literal fan-out — and ONE
    map-side-combining groupBy folds (neighbor count, neighbor sum)
    per TARGET hex; a zero-filled left join back to the occupied set
    keeps only real cells. -> (hex_q, hex_r, n, n_neigh, neigh_sum)."""
    offs = hex_ring_offsets(k)
    scattered = cells.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col(q_col) + F.lit(dq)).alias("tq"),
                        (F.col(r_col) + F.lit(dr)).alias("tr"),
                    )
                    for dq, dr in offs
                ]
            )
        ).alias("t"),
        F.col(n_col).alias("_n"),
    ).select(
        F.col("t.tq").alias(q_col), F.col("t.tr").alias(r_col), "_n"
    )
    neigh = scattered.groupBy(q_col, r_col).agg(
        F.count(F.lit(1)).alias("n_neigh"),
        F.sum("_n").alias("neigh_sum"),
    )
    return cells.join(neigh, [q_col, r_col], "left").select(
        q_col, r_col, n_col,
        F.coalesce("n_neigh", F.lit(0)).alias("n_neigh"),
        F.coalesce("neigh_sum", F.lit(0)).alias("neigh_sum"),
    )


def hex_focal_counts_sql(
    cells_sql: str, q_col: str, r_col: str, n_col: str, *, k: int = 1
) -> str:
    """DuckDB twin of :func:`hex_focal_counts`."""
    offs = ", ".join(f"({dq}, {dr})" for dq, dr in hex_ring_offsets(k))
    return f"""
    WITH cells AS ({cells_sql}),
    offs(dq, dr) AS (VALUES {offs}),
    neigh AS (
      SELECT c.{q_col} + o.dq AS {q_col}, c.{r_col} + o.dr AS {r_col},
             CAST(COUNT(*) AS BIGINT) AS n_neigh,
             CAST(SUM(c.{n_col}) AS BIGINT) AS neigh_sum
      FROM cells c CROSS JOIN offs o
      GROUP BY 1, 2
    )
    SELECT c.{q_col}, c.{r_col}, c.{n_col},
           COALESCE(n.n_neigh, 0) AS n_neigh,
           COALESCE(n.neigh_sum, 0) AS neigh_sum
    FROM cells c LEFT JOIN neigh n
      ON c.{q_col} = n.{q_col} AND c.{r_col} = n.{r_col}
    """
