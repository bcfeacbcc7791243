"""Z-order (Morton) space-filling-curve keys — the data-layout side of
the spatial engine.

The cell encoder (spatial/cells.py) answers point->cell queries; Morton
keys answer a different question: HOW TO LAY THE TABLE OUT ON DISK so
that spatially-close rows land in the same files and a lat/lon range
predicate prunes most of the scan. This is exactly what Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's z-ordered sort do for their file
clustering: sort (or range-partition) the table by the interleaved key
and min/max file statistics on the key become 2-D bounding boxes.

Kernel: quantize lat/lon to 16 bits each over their full valid ranges,
then interleave the bits with the classic magic-number spread — five
shift/mask stages per axis, all in int64, all inside whole-stage
codegen (no UDF, no overflow: every intermediate < 2^32, ANSI-safe).
The DuckDB twin is the same five stages in SQL, bit-for-bit.

Scale shape: the key is a narrow per-row projection (zero shuffle);
``repartitionByRange(zkey)`` then gives spatially-local write tasks —
one range shuffle to cluster 100 TB, after which every file's zkey
min/max is a tile. ``zbucket`` (the top bits) is the coarse tile id a
file-skipping index would store.

Reference parity note: geodiff has no layout optimizer (single-node
SQLite does not need one); this module is the scale-path addition the
north rule's Iceberg 10^12-row table requires.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (mask, shift) stages spreading 16 bits to even positions of 32.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)
_Q = 1 << 16  # 16-bit quantization per axis


def _quant_col(v: Column, lo: float, hi: float) -> Column:
    """Quantize a double in [lo, hi] to [0, 2^16): floor of the affine
    map, clamped (hi itself maps to the top bucket). The arithmetic is
    two IEEE double ops in a fixed order — bit-identical cross-engine."""
    q = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(_Q)))
    return F.least(F.greatest(q, F.lit(0)), F.lit(_Q - 1)).cast("long")


def _quant_sql(v: str, lo: float, hi: float) -> str:
    return (
        f"least(greatest(CAST(floor((({v}) - CAST({lo} AS DOUBLE)) / "
        f"CAST({hi - lo} AS DOUBLE) * CAST({_Q} AS DOUBLE)) AS BIGINT), 0), {_Q - 1})"
    )


def _spread_col(x: Column) -> Column:
    for sh, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, sh)).bitwiseAND(F.lit(mask))
    return x


def _spread_sql(x: str) -> str:
    for sh, mask in _SPREAD:
        x = f"((({x}) | (({x}) << {sh})) & {mask})"
    return x


def morton_expr(lat: Column, lon: Column) -> Column:
    """32-bit Z-order key of a (lat, lon) point: lon bits at even
    positions, lat bits at odd — BIGINT, codegen-only."""
    zx = _spread_col(_quant_col(lon, -180.0, 180.0))
    zy = _spread_col(_quant_col(lat, -90.0, 90.0))
    return zx.bitwiseOR(F.shiftleft(zy, 1)).cast("long")


def morton_sql(lat: str, lon: str) -> str:
    """DuckDB twin of :func:`morton_expr` (same stages, same masks)."""
    zx = _spread_sql(_quant_sql(lon, -180.0, 180.0))
    zy = _spread_sql(_quant_sql(lat, -90.0, 90.0))
    return f"CAST((({zx}) | (({zy}) << 1)) AS BIGINT)"


def zbucket_expr(zkey: Column, bits: int = 18) -> Column:
    """Coarse layout bucket: the top ``32 - bits`` bits of the key —
    what a file-skipping index stores per file after a range-cluster."""
    return F.shiftright(zkey, bits).cast("long")


def zbucket_sql(zkey: str, bits: int = 18) -> str:
    return f"CAST((({zkey}) >> {bits}) AS BIGINT)"
