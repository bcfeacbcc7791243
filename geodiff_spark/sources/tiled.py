"""Spatially-partitioned table layout: directory-partition by coarse
tile, Z-order within.

The 100 TB read-path story for the spatial layer: points land in
parquet partitioned by a COARSE cell (the directory key — bounded
cardinality, prunable by Catalyst's PartitionFilters before any file
is opened) and are sorted by the FINE Morton cell inside each
partition (Z-order locality → parquet row-group min/max stats prune
within files too). A query for one neighborhood then touches a handful
of directories instead of the corpus — the same effect as Iceberg's
`PARTITIONED BY (cell)` + sorted data files.

Write side: `repartition(tile)` co-locates each tile into one task so
a tile is one file (not one file per task per tile); `partitionBy`
writes the directory layout; `sortWithinPartitions(cell)` provides the
Z-order. Read side: `read_tiled` re-derives the tile predicate from a
cell-range query so the pruning is automatic for callers.

Plan evidence (tests/test_store_ops.py): the scan shows the tile in
`PartitionFilters` and reads fewer partition directories than exist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..spatial.cells import MODE_BIT, RES_SHIFT, _M1, cell_expr, xy_expr


def tile_of_cell(cell: Column, fine_res: int, tile_res: int) -> Column:
    """Coarse tile of a fine cell via the spread-space shift identity
    (no decode round-trip)."""
    shift = 2 * (fine_res - tile_res)
    head = MODE_BIT | (tile_res << RES_SHIFT)
    morton = cell.bitwiseAND(F.lit((1 << RES_SHIFT) - 1))
    x_lane = F.shiftright(morton, shift).bitwiseAND(F.lit(_M1))
    y_lane = F.shiftright(F.shiftright(morton, 1), shift).bitwiseAND(F.lit(_M1))
    return F.lit(head).bitwiseOR(x_lane).bitwiseOR(F.shiftleft(y_lane, 1))


def write_tiled(
    df: DataFrame,
    path: str,
    lat: Column,
    lon: Column,
    fine_res: int,
    tile_res: int,
) -> None:
    """Write ``df`` partitioned by coarse tile, Z-ordered by fine cell
    within each tile (one file per tile via the pre-repartition)."""
    cell = cell_expr(lat, lon, fine_res)
    d = df.withColumn("cell", cell).withColumn(
        "tile", tile_of_cell(F.col("cell"), fine_res, tile_res)
    )
    # sort key leads with the partition column: the dynamic-partition
    # writer REQUIRES an ordering on (tile) and would re-sort (not
    # necessarily stably) if the explicit sort didn't already satisfy it
    (
        d.repartition("tile")
        .sortWithinPartitions("tile", "cell")
        .write.mode("overwrite")
        .partitionBy("tile")
        .parquet(path)
    )


def read_tiled(
    spark: SparkSession,
    path: str,
    *,
    tiles: list[int] | None = None,
) -> DataFrame:
    """Read a tiled table; with ``tiles`` the directory filter prunes
    partitions before any parquet footer is opened."""
    df = spark.read.parquet(path)
    if tiles is not None:
        df = df.filter(F.col("tile").isin([int(t) for t in tiles]))
    return df
