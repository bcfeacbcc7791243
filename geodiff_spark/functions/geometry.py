"""GeoPackage binary geometry utilities.

GPKG geometry = header (magic 'GP', version, flags, srs_id int32,
optional envelope of 0/32/48/64 bytes per flag bits 1-3) + ISO WKB.
Parse rules: sqliteutils.cpp:589-620 (header size from flags); synthesis
incl. envelope computed from WKB with the GDAL-imitating rules — no
envelope for POINT, M ranges never written: sqliteutils.cpp:622-686.
Public API twins: GEODIFF_createWkbFromGpkgHeader (geodiff.h:629-646).

All Spark-facing functions are Arrow-vectorized pandas UDFs over binary
columns; the per-row byte slicing is numpy-frombuffer based.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ENVELOPE_BYTES = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}

# WKB geometry type codes (ISO, 2D base)
WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6


def gpkg_header_size(blob: bytes) -> int:
    """Bytes occupied by the GPKG header (magic+flags+srs+envelope).
    Mirrors the flag-byte decode at sqliteutils.cpp:589-620."""
    if len(blob) < 8 or blob[0:2] != b"GP":
        raise ValueError("not a GPKG geometry blob")
    flags = blob[3]
    env_code = (flags >> 1) & 0x07
    if env_code > 4:
        raise ValueError(f"invalid envelope contents indicator {env_code}")
    return 8 + _ENVELOPE_BYTES[env_code]


def wkb_from_gpkg(blob: bytes) -> bytes:
    """Strip the GPKG header -> raw WKB (GEODIFF_createWkbFromGpkgHeader)."""
    return blob[gpkg_header_size(blob):]


def _wkb_coords(wkb: bytes) -> np.ndarray:
    """All (x, y) vertex pairs of a 2D WKB geometry (point/line/polygon
    and their multi- variants). Z/M flagged types (wkb type + 1000/2000)
    are handled by skipping extra ordinates."""
    out = []

    def walk(pos: int) -> int:
        little = wkb[pos] == 1
        fmt = "<" if little else ">"
        gtype = struct.unpack_from(fmt + "I", wkb, pos + 1)[0]
        base = gtype % 1000
        dims = 2 + (1 if gtype >= 1000 else 0) + (1 if gtype >= 2000 and gtype < 3000 else 0)
        if gtype >= 3000:
            dims = 4
        pos += 5
        if base == WKB_POINT:
            xy = struct.unpack_from(fmt + "dd", wkb, pos)
            out.append(xy)
            return pos + 8 * dims
        if base == WKB_LINESTRING:
            n = struct.unpack_from(fmt + "I", wkb, pos)[0]
            pos += 4
            arr = np.frombuffer(wkb, dtype=(("<" if little else ">") + "f8"), count=n * dims, offset=pos)
            pts = arr.reshape(n, dims)[:, :2]
            out.extend(map(tuple, pts))
            return pos + 8 * dims * n
        if base == WKB_POLYGON:
            nrings = struct.unpack_from(fmt + "I", wkb, pos)[0]
            pos += 4
            for _ in range(nrings):
                n = struct.unpack_from(fmt + "I", wkb, pos)[0]
                pos += 4
                arr = np.frombuffer(wkb, dtype=(("<" if little else ">") + "f8"), count=n * dims, offset=pos)
                out.extend(map(tuple, arr.reshape(n, dims)[:, :2]))
                pos += 8 * dims * n
            return pos
        if base in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON, 7):
            n = struct.unpack_from(fmt + "I", wkb, pos)[0]
            pos += 4
            for _ in range(n):
                pos = walk(pos)
            return pos
        raise ValueError(f"unsupported WKB type {gtype}")

    walk(0)
    return np.asarray(out, dtype=np.float64)


def make_gpkg(wkb: bytes, srs_id: int = 4326) -> bytes:
    """Synthesize a GPKG blob: header + envelope from WKB, following the
    GDAL-imitating rules (sqliteutils.cpp:622-686): POINTs carry no
    envelope; others get the 32-byte XY envelope; M ranges never
    written."""
    little = wkb[0] == 1
    fmt = "<" if little else ">"
    gtype = struct.unpack_from(fmt + "I", wkb, 1)[0]
    is_point = gtype % 1000 == WKB_POINT
    flags = 0x01  # little-endian header
    if not is_point:
        flags |= 0x02  # envelope indicator 1: XY
    head = b"GP" + bytes([0, flags]) + struct.pack("<i", srs_id)
    if not is_point:
        c = _wkb_coords(wkb)
        head += struct.pack(
            "<4d", c[:, 0].min(), c[:, 0].max(), c[:, 1].min(), c[:, 1].max()
        )
    return head + wkb


def gpkg_envelope(blob: bytes) -> tuple[float, float, float, float] | None:
    """(minx, maxx, miny, maxy) from the header, or None if absent."""
    flags = blob[3]
    if (flags >> 1) & 0x07 == 0:
        return None
    little = flags & 0x01
    return struct.unpack_from(("<" if little else ">") + "4d", blob, 8)


# --- Spark surface ---------------------------------------------------------

@F.pandas_udf(T.BinaryType())
def wkb_from_gpkg_udf(blobs: pd.Series) -> pd.Series:
    return blobs.map(lambda b: None if b is None else wkb_from_gpkg(bytes(b)))


@F.pandas_udf(T.BinaryType())
def make_gpkg_udf(wkbs: pd.Series) -> pd.Series:
    return wkbs.map(lambda b: None if b is None else make_gpkg(bytes(b)))


def envelope_udf() -> Column:
    @F.pandas_udf("minx double, maxx double, miny double, maxy double")
    def _env(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            if b is None:
                rows.append((None, None, None, None))
                continue
            e = gpkg_envelope(bytes(b))
            if e is None:  # compute from WKB (points etc.)
                c = _wkb_coords(wkb_from_gpkg(bytes(b)))
                e = (c[:, 0].min(), c[:, 0].max(), c[:, 1].min(), c[:, 1].max())
            rows.append(e)
        return pd.DataFrame(rows, columns=["minx", "maxx", "miny", "maxy"])

    return _env
