"""Rectangle-overlay join + CM join-size estimation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodiff_spark.spatial.overlay import rect_overlap_join


def _rects(spark, n, mults, prefix, w, h):
    m1, m2 = mults
    return spark.range(n).select(
        F.col("id").alias(f"{prefix}id"),
        (((F.col("id") * m1) % 300).cast("double") - 160.0).alias(f"{prefix}x0"),
        (((F.col("id") * m2) % 140).cast("double") - 65.0).alias(f"{prefix}y0"),
    ).select(
        "*",
        (F.col(f"{prefix}x0") + w).alias(f"{prefix}x1"),
        (F.col(f"{prefix}y0") + h).alias(f"{prefix}y1"),
    )


def test_rect_overlap_matches_bruteforce(spark):
    a = _rects(spark, 40, (73, 37), "a", 25.0, 12.0)
    b = _rects(spark, 60, (59, 41), "b", 18.0, 20.0)
    got = sorted(
        (r.aid, r.bid, r.area)
        for r in rect_overlap_join(a, b, res=3, a_id="aid", b_id="bid").collect()
    )
    iw = F.least("ax1", "bx1") - F.greatest("ax0", "bx0")
    ih = F.least("ay1", "by1") - F.greatest("ay0", "by0")
    brute = (
        a.crossJoin(b)
        .filter((iw > 0.0) & (ih > 0.0))
        .select("aid", "bid", (iw * ih).alias("area"))
    )
    want = sorted((r.aid, r.bid, r.area) for r in brute.collect())
    assert got == want and len(got) > 0


def test_rect_overlap_touching_excluded(spark):
    a = spark.createDataFrame(
        [(1, 0.0, 0.0, 10.0, 10.0)], "aid long, ax0 double, ay0 double, ax1 double, ay1 double"
    )
    b = spark.createDataFrame(
        [(2, 10.0, 0.0, 20.0, 10.0), (3, 9.0, 9.0, 12.0, 12.0)],
        "bid long, bx0 double, by0 double, bx1 double, by1 double",
    )
    out = sorted(
        (r.aid, r.bid, r.area)
        for r in rect_overlap_join(a, b, res=3, a_id="aid", b_id="bid").collect()
    )
    assert out == [(1, 3, 1.0)]  # edge-touching pair (2) excluded


def test_rect_overlap_single_emission_across_cells(spark):
    a = spark.createDataFrame(
        [(1, -40.0, -40.0, 40.0, 40.0)], "aid long, ax0 double, ay0 double, ax1 double, ay1 double"
    )
    b = spark.createDataFrame(
        [(2, -30.0, -30.0, 30.0, 30.0)], "bid long, bx0 double, by0 double, bx1 double, by1 double"
    )
    out = rect_overlap_join(a, b, res=3, a_id="aid", b_id="bid").collect()
    assert [(r.aid, r.bid, r.area) for r in out] == [(1, 2, 3600.0)]


def test_cm_inner_product_bounds(spark):
    """est >= true join size; est <= true + depth-min bound slack."""
    from geodiff_spark.operators.sketch import M57, cm_inner_product, cm_sketch

    a = spark.range(0, 4000).select((F.col("id") % 211).alias("k"))
    b = spark.range(0, 2500).select((F.col("id") % 173).alias("k"))
    true = a.join(b, "k", "inner").count()
    width = 512
    cma = cm_sketch(a, F.col("k") % M57, depth=3, width=width)
    cmb = cm_sketch(b, F.col("k") % M57, depth=3, width=width)
    est = cm_inner_product(cma, cmb).collect()[0]["est"]
    na, nb = 4000, 2500
    assert est >= true
    assert est <= true + (2.0 * na * nb / width)
