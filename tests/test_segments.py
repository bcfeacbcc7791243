"""Segment-intersection join: brute-force parity, touch/collinear edge
cases, dedup-without-distinct, long-segment guard, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodiff_spark.spatial.segments import (
    segment_intersect_join,
    segments_intersect_col,
    segments_intersect_sql,
)


def _segs(spark, n, mults, prefix, dx, dy):
    m1, m2 = mults
    return spark.range(n).select(
        F.col("id").alias(f"{prefix}id"),
        (((F.col("id") * m1) % 16000) / 100.0 - 80.0).alias(f"{prefix}y0"),
        (((F.col("id") * m2) % 35000) / 100.0 - 175.0).alias(f"{prefix}x0"),
    ).select(
        "*",
        (F.col(f"{prefix}x0") + dx).alias(f"{prefix}x1"),
        (F.col(f"{prefix}y0") + dy).alias(f"{prefix}y1"),
    )


def test_segment_join_matches_bruteforce(spark):
    a = _segs(spark, 300, (7919, 104729), "a", 0.4, 0.3)
    b = _segs(spark, 120, (3571, 9973), "b", -0.5, 0.45)
    got = sorted(
        (r.aid, r.bid)
        for r in segment_intersect_join(
            a, b, res=6, a_id="aid", b_id="bid"
        ).collect()
    )
    pred = segments_intersect_col(
        F.col("ax0"), F.col("ay0"), F.col("ax1"), F.col("ay1"),
        F.col("bx0"), F.col("by0"), F.col("bx1"), F.col("by1"),
    )
    want = sorted((r.aid, r.bid) for r in a.crossJoin(b).filter(pred).collect())
    assert got == want and len(got) > 0


@pytest.mark.parametrize(
    "b_seg,hit",
    [
        ((0.5, -0.5, 0.5, 0.5), True),    # proper crossing
        ((1.0, 0.0, 2.0, 1.0), True),     # endpoint touch at (1,0)
        ((0.25, 0.0, 0.75, 0.0), True),   # collinear overlap
        ((0.0, 0.1, 1.0, 0.2), False),    # parallel above
        ((2.0, 0.0, 3.0, 0.0), False),    # collinear disjoint
        ((1.0000001, -1.0, 1.0000001, 1.0), False),  # just past endpoint
    ],
)
def test_segment_predicate_cases(spark, b_seg, hit):
    a = spark.createDataFrame(
        [(1, 0.0, 0.0, 1.0, 0.0)], "aid long, ax0 double, ay0 double, ax1 double, ay1 double"
    )
    bx0, by0, bx1, by1 = b_seg
    b = spark.createDataFrame(
        [(2, bx0, by0, bx1, by1)], "bid long, bx0 double, by0 double, bx1 double, by1 double"
    )
    out = segment_intersect_join(a, b, res=6, a_id="aid", b_id="bid").collect()
    assert (len(out) == 1) == hit


def test_segment_join_no_duplicate_pairs(spark):
    # a long-ish diagonal pair sharing several cells must emit ONE row
    a = spark.createDataFrame(
        [(1, -1.0, -1.0, 4.0, 4.0)], "aid long, ax0 double, ay0 double, ax1 double, ay1 double"
    )
    b = spark.createDataFrame(
        [(2, -1.0, 4.0, 4.0, -1.0)], "bid long, bx0 double, by0 double, bx1 double, by1 double"
    )
    out = segment_intersect_join(a, b, res=6, a_id="aid", b_id="bid").collect()
    assert [(r.aid, r.bid) for r in out] == [(1, 2)]


def test_segment_long_guard_raises(spark):
    a = spark.createDataFrame(
        [(1, -170.0, 0.0, 170.0, 1.0)], "aid long, ax0 double, ay0 double, ax1 double, ay1 double"
    )
    b = spark.createDataFrame(
        [(2, 0.0, -1.0, 0.1, 1.0)], "bid long, bx0 double, by0 double, bx1 double, by1 double"
    )
    with pytest.raises(Exception, match="cells"):
        segment_intersect_join(a, b, res=6, a_id="aid", b_id="bid", max_cells=8).collect()


def test_segment_sql_twin_parity(spark):
    """Spark predicate == DuckDB predicate on a grid of segment pairs."""
    import duckdb

    a = _segs(spark, 60, (7919, 104729), "a", 0.4, 0.3)
    b = _segs(spark, 40, (3571, 9973), "b", -0.5, 0.45)
    pred = segments_intersect_col(
        F.col("ax0"), F.col("ay0"), F.col("ax1"), F.col("ay1"),
        F.col("bx0"), F.col("by0"), F.col("bx1"), F.col("by1"),
    )
    got = sorted((r.aid, r.bid) for r in a.crossJoin(b).filter(pred).collect())
    sql_pred = segments_intersect_sql(
        "a.ax0", "a.ay0", "a.ax1", "a.ay1", "b.bx0", "b.by0", "b.bx1", "b.by1"
    )
    q = f"""
    WITH a AS (
      SELECT i AS aid,
        ((i * 7919) % 16000) / 100.0 - 80.0 AS ay0,
        ((i * 104729) % 35000) / 100.0 - 175.0 AS ax0,
        ((i * 104729) % 35000) / 100.0 - 175.0 + 0.4 AS ax1,
        ((i * 7919) % 16000) / 100.0 - 80.0 + 0.3 AS ay1
      FROM range(60) t(i)
    ), b AS (
      SELECT i AS bid,
        ((i * 3571) % 16000) / 100.0 - 80.0 AS by0,
        ((i * 9973) % 35000) / 100.0 - 175.0 AS bx0,
        ((i * 9973) % 35000) / 100.0 - 175.0 - 0.5 AS bx1,
        ((i * 3571) % 16000) / 100.0 - 80.0 + 0.45 AS by1
      FROM range(40) t(i)
    )
    SELECT aid, bid FROM a, b WHERE {sql_pred}
    """
    want = sorted((int(x), int(y)) for x, y in duckdb.sql(q).fetchall())
    assert got == want


def test_segment_join_plan_no_cartesian(spark):
    """Candidates come from the cell equi-join (hash/broadcast), never a
    cartesian/BNL; dedup is a filter, not a distinct Exchange."""
    a = _segs(spark, 300, (7919, 104729), "a", 0.4, 0.3)
    b = _segs(spark, 120, (3571, 9973), "b", -0.5, 0.45)
    plan = (
        segment_intersect_join(a, b, res=6, a_id="aid", b_id="bid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan
