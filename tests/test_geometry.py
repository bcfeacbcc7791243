"""GPKG/WKB utilities vs hand-built binary vectors
(tests/test_geometry_utils.cpp:14-56 analogue)."""

from __future__ import annotations

import struct

import pytest

from geodiff_spark.functions.geometry import (
    gpkg_envelope,
    gpkg_header_size,
    make_gpkg,
    wkb_from_gpkg,
)


def wkb_point(x, y):
    return b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", x, y)


def wkb_linestring(pts):
    out = b"\x01" + struct.pack("<I", 2) + struct.pack("<I", len(pts))
    for x, y in pts:
        out += struct.pack("<dd", x, y)
    return out


def wkb_polygon(rings):
    out = b"\x01" + struct.pack("<I", 3) + struct.pack("<I", len(rings))
    for ring in rings:
        out += struct.pack("<I", len(ring))
        for x, y in ring:
            out += struct.pack("<dd", x, y)
    return out


def test_point_no_envelope():
    wkb = wkb_point(13.37, 47.11)
    blob = make_gpkg(wkb, srs_id=4326)
    assert blob[:2] == b"GP"
    assert gpkg_header_size(blob) == 8  # POINT: no envelope (GDAL rule)
    assert gpkg_envelope(blob) is None
    assert wkb_from_gpkg(blob) == wkb
    assert struct.unpack_from("<i", blob, 4)[0] == 4326


def test_linestring_envelope():
    wkb = wkb_linestring([(0.0, 1.0), (10.0, -5.0), (3.0, 7.5)])
    blob = make_gpkg(wkb)
    assert gpkg_header_size(blob) == 40  # 8 + 32-byte XY envelope
    assert gpkg_envelope(blob) == (0.0, 10.0, -5.0, 7.5)
    assert wkb_from_gpkg(blob) == wkb


def test_polygon_envelope():
    ring = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    wkb = wkb_polygon([ring])
    blob = make_gpkg(wkb)
    assert gpkg_envelope(blob) == (0.0, 4.0, 0.0, 4.0)


def test_big_endian_wkb():
    wkb = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.0, 2.0)
    blob = make_gpkg(wkb)
    assert wkb_from_gpkg(blob) == wkb


def test_envelope_sizes_from_flags():
    # flag envelope codes map to {0: 0, 1: 32, 2: 48, 3: 48, 4: 64} extra
    for code, extra in ((0, 0), (1, 32), (2, 48), (3, 48), (4, 64)):
        blob = b"GP\x00" + bytes([code << 1]) + b"\x00" * (4 + extra) + b"wkb"
        assert gpkg_header_size(blob) == 8 + extra
    with pytest.raises(ValueError):
        gpkg_header_size(b"GP\x00" + bytes([5 << 1]) + b"\x00" * 4)
    with pytest.raises(ValueError):
        gpkg_header_size(b"XX\x00\x00\x00\x00\x00\x00")


def test_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from geodiff_spark.functions.geometry import make_gpkg_udf, wkb_from_gpkg_udf

    wkbs = [wkb_point(1, 2), wkb_linestring([(0, 0), (5, 5)]), None]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(wkbs)], "i long, wkb binary")
    out = (
        df.withColumn("gpkg", make_gpkg_udf(F.col("wkb")))
        .withColumn("back", wkb_from_gpkg_udf(F.col("gpkg")))
        .collect()
    )
    for r in out:
        assert r["back"] == r["wkb"]
