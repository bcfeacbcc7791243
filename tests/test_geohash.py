"""Geohash encoder: known-answer vectors, cross-engine parity, and
Morton-cell prefix compatibility."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from geodiff_spark.spatial.geohash import (
    ALPHABET,
    geohash_expr,
    geohash_sql,
)


def _gh_reference(lat, lon, precision):
    """Independent textbook implementation (interval halving)."""
    lat_i, lon_i = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_i[0] + lon_i[1]) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_i[0] = mid
            else:
                ch <<= 1
                lon_i[1] = mid
        else:
            mid = (lat_i[0] + lat_i[1]) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_i[0] = mid
            else:
                ch <<= 1
                lat_i[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(ALPHABET[ch])
            bits, ch = 0, 0
    return "".join(out)


@pytest.mark.parametrize(
    "lat,lon,want",
    [
        (57.64911, 10.40744, "u4pruy"),   # classic Wikipedia vector
        (42.6, -5.6, "ezs42e"),  # classic ezs42 vector extended to 6
        (0.0, 0.0, "s00000"),
        (-25.382708, -49.265506, "6gkzwg"),
    ],
)
def test_geohash_known_vectors(spark, lat, lon, want):
    got = (
        spark.createDataFrame([(lat, lon)], "lat double, lon double")
        .select(geohash_expr(F.col("lat"), F.col("lon"), 6).alias("gh"))
        .collect()[0]["gh"]
    )
    assert got == want
    assert _gh_reference(lat, lon, 6) == want


def test_geohash_matches_reference_grid(spark):
    rows = [
        (float(la), float(lo))
        for la in range(-85, 86, 17)
        for lo in range(-175, 176, 23)
    ]
    got = [
        r.gh
        for r in spark.createDataFrame(rows, "lat double, lon double")
        .select(geohash_expr(F.col("lat"), F.col("lon"), 8).alias("gh"))
        .collect()
    ]
    want = [_gh_reference(la, lo, 8) for la, lo in rows]
    assert got == want


def test_geohash_sql_twin_parity(spark):
    rows = [(float(la) / 7, float(lo) / 3) for la in range(-600, 601, 37)
            for lo in range(-500, 501, 41)]
    got = [
        r.gh
        for r in spark.createDataFrame(rows, "lat double, lon double")
        .select(geohash_expr(F.col("lat"), F.col("lon"), 6).alias("gh"))
        .collect()
    ]
    q = geohash_sql(
        "SELECT unnest(?) AS lat, unnest(?) AS lon", "lat", "lon", "gh",
        ["lat", "lon"], 6,
    )
    want = [r[2] for r in duckdb.sql(q, params=[[r[0] for r in rows],
                                                [r[1] for r in rows]]).fetchall()]
    assert got == want


def test_geohash_prefix_property(spark):
    """Truncating an even geohash by 2 chars = the geohash of the same
    point at precision-2 (hierarchical containment — the property tile
    pyramids rely on)."""
    rows = [(37.7749, -122.4194), (51.5007, -0.1246), (-33.8568, 151.2153)]
    df = spark.createDataFrame(rows, "lat double, lon double").select(
        geohash_expr(F.col("lat"), F.col("lon"), 8).alias("g8"),
        geohash_expr(F.col("lat"), F.col("lon"), 6).alias("g6"),
    )
    for r in df.collect():
        assert r.g8[:6] == r.g6


def test_geohash_odd_precision_rejected(spark):
    with pytest.raises(ValueError):
        geohash_expr(F.lit(0.0), F.lit(0.0), 5)
