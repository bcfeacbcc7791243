"""Hierarchical cell-set compaction (H3 compact/uncompact semantics).

A dense cell cover (polygon fill, tile scheme, crawl-coverage map) at a
fine resolution wastes space wherever whole parent cells are fully
covered: H3's `compact` replaces every complete sibling group by its
parent, recursively, producing the minimal mixed-resolution set with
the same coverage; `uncompact` re-expands to a uniform resolution.

On this repo's Morton quadtree (spatial/cells.py) both directions are
pure prefix arithmetic — a cell's children at depth +d are exactly the
ids sharing its morton prefix shifted left 2d bits — so:

  * parent(cell)  = head(r-1) | (morton >> 2)
  * children(cell, R) = head(R) | (morton << 2(R-r)) + j,  j ∈ [0, 4^(R-r))

and compaction is, per level, one groupBy(parent) counting siblings
(a full group has exactly 4 distinct children) — no geometry ever
touched.

Scale shape: `compact_cells` runs res−min_res rounds; each round is
ONE shuffle keyed by parent id over a set that SHRINKS ≥4× per
promoted level (survivors leave the loop immediately via the anti
join, which reuses the groupBy's hash partitioning). `uncompact_cells`
is a zero-shuffle explode of a literal integer sequence — whole-stage
codegen, no UDF. Both engines (Spark exprs, DuckDB SQL twins) share
the identical int64 bit ops, so parity is exact.

Reference analogy: geodiff's changeset grouping compacts per-table
blocks before writing (changesetwriter.cpp:28-37); here the compacted
cover is the unit shipped to executors for per-cell-range diff jobs.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, functions as F

from .cells import MODE_BIT, MORTON_MASK, RES_SHIFT


def _head(res: int) -> int:
    return MODE_BIT | (res << RES_SHIFT)


def parent_id_expr(cell, res: int):
    """Parent cell id at ``res-1`` of a cell at ``res`` (Column expr)."""
    morton = cell.bitwiseAND(F.lit(MORTON_MASK))
    return F.lit(_head(res - 1)).bitwiseOR(F.shiftright(morton, 2))


def parent_id_sql(cell: str, res: int) -> str:
    return f"({_head(res - 1)} | ((({cell}) & {MORTON_MASK}) >> 2))"


def compact_cells(
    cells: DataFrame,
    cell_col: str = "cell",
    *,
    res: int,
    min_res: int = 0,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Minimal mixed-resolution set covering exactly the input cells.

    ``cells`` must all be at resolution ``res`` (duplicates are fine —
    the set is made distinct first, so sibling counts are exact).
    ``group_cols`` compact each group's cover independently (e.g. one
    cover per tile/zone). Output: (*group_cols, cell) with cell at any
    resolution in (min_res, res].
    """
    keys = list(group_cols)
    cur = cells.select(*keys, F.col(cell_col).alias("cell")).distinct()
    out: list[DataFrame] = []
    for r in range(res, min_res, -1):
        with_p = cur.withColumn("_p", parent_id_expr(F.col("cell"), r))
        full = (
            with_p.groupBy(*keys, "_p")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") == 4)
            .drop("_n")
        )
        out.append(
            with_p.join(full, [*keys, "_p"], "left_anti").drop("_p")
        )
        cur = full.select(*keys, F.col("_p").alias("cell"))
    out.append(cur)
    return functools.reduce(DataFrame.unionByName, out)


def uncompact_cells(
    cells: DataFrame,
    cell_col: str = "cell",
    *,
    res: int,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Expand a mixed-resolution set to uniform ``res``: every cell at
    r <= res becomes its 4^(res-r) descendants (morton-prefix append).
    Zero shuffle, pure codegen — the explode sequence is bounded by
    4^(res-r), the caller's depth budget."""
    base = F.lit(_head(res)).bitwiseOR(
        F.expr(
            f"shiftleft({cell_col} & {MORTON_MASK}, "
            f"CAST(2 * ({res} - ((({cell_col}) >> {RES_SHIFT}) & 31)) AS INT))"
        )
    )
    n_children = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), "
        f"CAST(2 * ({res} - ((({cell_col}) >> {RES_SHIFT}) & 31)) AS INT))"
    )
    return (
        cells.withColumn("_base", base)
        .withColumn("_j", F.explode(F.sequence(F.lit(0).cast("long"), n_children - 1)))
        .select(*keep_cols, (F.col("_base") + F.col("_j")).alias(cell_col))
    )


def uncompact_sql(src: str, cell: str, res: int, keep: tuple[str, ...] = ()) -> str:
    """DuckDB twin of :func:`uncompact_cells` (``src`` yields ``cell``
    + ``keep`` columns)."""
    r = f"((({cell}) >> {RES_SHIFT}) & 31)"
    base = f"({_head(res)} | ((({cell}) & {MORTON_MASK}) << (2 * ({res} - {r}))))"
    n = f"(CAST(1 AS BIGINT) << (2 * ({res} - {r})))"
    cols = "".join(f"{k}, " for k in keep)
    return (
        f"SELECT {cols}{base} + unnest(range(0, {n})) AS {cell} FROM ({src})"
    )


def compact_sql(
    cover_src: str,
    res: int,
    min_res: int,
    group_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`compact_cells`, unrolled one CTE pair per
    level (levels are a compile-time constant, exactly like the
    k-means/pagerank oracle unrolls). ``cover_src`` yields
    (*group_cols, cell) at uniform ``res``."""
    keys = "".join(f"{k}, " for k in group_cols)
    on = " AND ".join(
        [f"l.{k} = f.{k}" for k in group_cols] + ["__parent = f.cell"]
    )
    ctes = [f"l{res} AS (SELECT DISTINCT {keys}cell FROM ({cover_src}))"]
    finals = []
    for r in range(res, min_res, -1):
        p = parent_id_sql("cell", r)
        ctes.append(
            f"f{r} AS (SELECT {keys}{p} AS cell FROM l{r} "
            f"GROUP BY {keys}{p} HAVING count(*) = 4)"
        )
        ctes.append(
            f"s{r} AS (SELECT l.* FROM (SELECT {keys}cell, {p} AS __parent "
            f"FROM l{r}) l ANTI JOIN f{r} f ON {on})"
        )
        ctes.append(f"l{r - 1} AS (SELECT {keys}cell FROM f{r})")
        finals.append(f"SELECT {keys}cell FROM s{r}")
    finals.append(f"SELECT {keys}cell FROM l{min_res}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)


def rect_cover(
    rects: DataFrame,
    *,
    res: int,
    x0: str = "x0",
    y0: str = "y0",
    x1: str = "x1",
    y1: str = "y1",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """All cells at ``res`` intersecting each [x0,x1)×[y0,y1) lon/lat
    rect (the polygon-fill step that feeds :func:`compact_cells`).
    Zero shuffle: two nested literal-sequence explodes + the morton
    spread, all codegen. The upper corner is pulled in by 1e-9 deg so
    an exact cell-boundary edge doesn't leak one extra column/row —
    the same f64 literal arithmetic on both engines."""
    from .cells import _spread_expr, xy_expr

    eps = F.lit(1e-9)
    xlo, ylo = xy_expr(F.col(y0), F.col(x0), res)
    xhi, yhi = xy_expr(F.col(y1) - eps, F.col(x1) - eps, res)
    return (
        rects.withColumn("_x", F.explode(F.sequence(xlo, xhi)))
        .withColumn("_y", F.explode(F.sequence(ylo, yhi)))
        .select(
            *keep_cols,
            F.lit(_head(res))
            .bitwiseOR(_spread_expr(F.col("_x"), res))
            .bitwiseOR(F.shiftleft(_spread_expr(F.col("_y"), res), 1))
            .alias("cell"),
        )
    )


def rect_cover_sql(
    rects_src: str,
    *,
    res: int,
    x0: str = "x0",
    y0: str = "y0",
    x1: str = "x1",
    y1: str = "y1",
    keep: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`rect_cover`."""
    from .cells import _spread_sql, xy_sql

    xlo, _ = xy_sql(y0, x0, res)
    xhi, _ = xy_sql(y0, f"({x1}) - 0.000000001", res)
    _, ylo = xy_sql("__y0", "0.0", res)
    _, yhi = xy_sql("(__y1) - 0.000000001", "0.0", res)
    cols = "".join(f"{k}, " for k in keep)
    return f"""
    SELECT {cols}({_head(res)} | {_spread_sql('gx')} | ({_spread_sql('gy')} << 1)) AS cell
    FROM (
      SELECT {cols}gx, unnest(range({ylo}, {yhi} + 1)) AS gy
      FROM (
        SELECT {cols}{y0} AS __y0, {y1} AS __y1,
               unnest(range({xlo}, {xhi} + 1)) AS gx
        FROM ({rects_src})
      )
    )
    """
