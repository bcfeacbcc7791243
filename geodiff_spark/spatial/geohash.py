"""Geohash encoder — the interoperable public cell scheme, alongside
the engine's native Morton cells (spatial/cells.py).

Standard geohash (public algorithm, base32 alphabet without a/i/l/o):
quantize lon to ceil(5p/2) bits and lat to floor(5p/2) bits, interleave
MSB-first starting with longitude, emit 5-bit groups as base32 chars.

Implementation is pure JVM expressions (floor/clamp + the Morton spread
already used by cell_expr + substr into the alphabet) with a DuckDB SQL
twin — bit/char-exact cross-engine, whole-stage-codegen friendly, no
UDFs. Even precisions only (lonbits == latbits makes the interleave a
plain Morton spread); odd precisions would need an asymmetric
interleave nobody asks for at corpus scale.

Why both schemes: Morton cells are the engine's join/layout key (integer
math, k-ring, pyramid); geohash is the interchange format (URLs,
external datasets, tile servers). ``geohash_expr(cell-compatible
coords)`` lets a pipeline emit both from one scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .cells import _spread_expr, _spread_sql

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _check_precision(precision: int) -> int:
    if precision % 2 != 0 or not (2 <= precision <= 10):
        raise ValueError("geohash_expr supports even precision in [2, 10]")
    return (5 * precision) // 2  # bits per axis


def geohash_expr(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Geohash string of (lat, lon) at even ``precision`` chars."""
    bits = _check_precision(precision)
    n = float(1 << bits)
    hi = F.lit((1 << bits) - 1).cast("long")
    lo = F.lit(0).cast("long")
    x = F.least(F.greatest(F.floor((lon + 180.0) / 360.0 * n).cast("long"), lo), hi)
    y = F.least(F.greatest(F.floor((lat + 90.0) / 180.0 * n).cast("long"), lo), hi)
    # lon occupies the even bit positions counted from the MSB of the
    # 5p-bit word -> odd positions from the LSB (5p is even)
    v = F.shiftleft(_spread_expr(x, bits), 1).bitwiseOR(_spread_expr(y, bits))
    chars = []
    for k in range(precision):
        shift = 5 * (precision - 1 - k)
        idx = F.shiftright(v, shift).bitwiseAND(F.lit(31))
        chars.append(F.substr(F.lit(ALPHABET), idx + F.lit(1), F.lit(1)))
    return F.concat(*chars)


def geohash_v_sql(lat: str, lon: str, precision: int = 6) -> str:
    """The interleaved 5p-bit word as SQL (compute once in a CTE)."""
    bits = _check_precision(precision)
    n = float(1 << bits)
    hi = (1 << bits) - 1
    x = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon}) + 180.0) / 360.0 * {n}) AS BIGINT),"
        f" 0), {hi})"
    )
    y = (
        f"LEAST(GREATEST(CAST(FLOOR((({lat}) + 90.0) / 180.0 * {n}) AS BIGINT),"
        f" 0), {hi})"
    )
    return f"(({_spread_sql(x)} << 1) | {_spread_sql(y)})"


def geohash_chars_sql(v: str, precision: int = 6) -> str:
    """Base32 chars of a (cheap, e.g. CTE-aliased) interleaved word."""
    _check_precision(precision)
    parts = []
    for k in range(precision):
        shift = 5 * (precision - 1 - k)
        parts.append(
            f"substr('{ALPHABET}', CAST(((({v}) >> {shift}) & 31) + 1 AS INT), 1)"
        )
    return "(" + " || ".join(parts) + ")"


def geohash_sql(src: str, lat: str, lon: str, out: str, keep: list[str],
                precision: int = 6) -> str:
    """Full DuckDB twin over a source relation: SELECT keep..., geohash
    AS ``out`` — the interleaved word is computed once in a CTE."""
    ks = ", ".join(keep)
    return f"""
    WITH gv AS (SELECT {ks}, {geohash_v_sql(lat, lon, precision)} AS v FROM ({src}))
    SELECT {ks}, {geohash_chars_sql('v', precision)} AS {out} FROM gv
    """
