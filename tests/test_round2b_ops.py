"""Radius join, interval join, incremental dedup-index maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodiff_spark.changeset import TableInfo
from geodiff_spark.operators.dedup import dedup_index_build, dedup_index_update
from geodiff_spark.operators.diff import diff_table
from geodiff_spark.operators.temporal import interval_join
from geodiff_spark.spatial.knn import radius_join


# --- radius join ----------------------------------------------------------

def _pts(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("pid"),
        (((F.col("id") * 7919) % 16000) / 100.0 - 80.0).alias("lat"),
        (((F.col("id") * 104729) % 35000) / 100.0 - 175.0).alias("lon"),
    )


def _qs(spark):
    rows = [(0, 10.0, 20.0), (1, -45.5, 170.0), (2, 79.0, -174.0), (3, 0.0, 0.0)]
    return spark.createDataFrame(rows, "qid long, qlat double, qlon double")


def test_radius_join_matches_bruteforce(spark):
    pts, qs = _pts(spark), _qs(spark)
    got = sorted(
        (r.qid, r.pid) for r in radius_join(
            pts, qs, radius=6.0, res=4, point_id_col="pid"
        ).collect()
    )
    brute = (
        pts.crossJoin(qs)
        .withColumn(
            "d2",
            (F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat"))
            + (F.col("lon") - F.col("qlon")) * (F.col("lon") - F.col("qlon")),
        )
        .filter(F.col("d2") <= 36.0)
    )
    want = sorted((r.qid, r.pid) for r in brute.collect())
    assert got == want and len(got) > 0


def test_radius_join_closed_ball_boundary(spark):
    pts = spark.createDataFrame([(1, 10.0, 23.0)], "pid long, lat double, lon double")
    qs = spark.createDataFrame([(0, 10.0, 20.0)], "qid long, qlat double, qlon double")
    out = radius_join(pts, qs, radius=3.0, res=4, point_id_col="pid").collect()
    assert [(r.qid, r.pid) for r in out] == [(0, 1)]  # dist == radius kept


def test_radius_join_antimeridian_wrap(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, -179.9), (2, 0.0, 179.0)], "pid long, lat double, lon double"
    )
    qs = spark.createDataFrame([(0, 0.0, 179.9)], "qid long, qlat double, qlon double")
    # euclidean-degree distance does NOT wrap (|dlon| = 359.8), but the
    # ring cover must not crash at the seam and the in-range point lands
    out = radius_join(pts, qs, radius=1.5, res=4, point_id_col="pid").collect()
    assert [(r.qid, r.pid) for r in out] == [(0, 2)]


def test_radius_join_large_radius_multi_ring(spark):
    pts, qs = _pts(spark), _qs(spark)
    got = sorted(
        (r.qid, r.pid) for r in radius_join(
            pts, qs, radius=25.0, res=4, point_id_col="pid"
        ).collect()
    )
    brute = (
        pts.crossJoin(qs)
        .withColumn(
            "d2",
            (F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat"))
            + (F.col("lon") - F.col("qlon")) * (F.col("lon") - F.col("qlon")),
        )
        .filter(F.col("d2") <= 625.0)
    )
    want = sorted((r.qid, r.pid) for r in brute.collect())
    assert got == want


# --- interval join --------------------------------------------------------

def _ev(spark, n=500):
    base = 1_700_000_000_000_000  # us
    return spark.range(n).select(
        F.col("id").alias("eid"),
        (F.lit(base) + (F.col("id") * 7_919_137) % 2_000_000_000).alias("t_us"),
    )


def _iv(spark, n=60):
    base = 1_700_000_000_000_000
    return spark.range(n).select(
        F.col("id").alias("wid"),
        (F.lit(base) + (F.col("id") * 104_729_321) % 1_900_000_000).alias("s_us"),
        (
            F.lit(base)
            + (F.col("id") * 104_729_321) % 1_900_000_000
            + 50_000_000
            + (F.col("id") % 7) * 30_000_000
        ).alias("e_us"),
    )


def test_interval_join_matches_bruteforce(spark):
    ev, iv = _ev(spark), _iv(spark)
    got = sorted(
        (r.eid, r.wid) for r in interval_join(
            ev, iv, probe_ts="t_us", start_col="s_us", end_col="e_us",
            bucket_seconds=60, probe_cols=["eid"], interval_cols=["wid"],
        ).collect()
    )
    brute = ev.crossJoin(iv).filter(
        (F.col("t_us") >= F.col("s_us")) & (F.col("t_us") <= F.col("e_us"))
    )
    want = sorted((r.eid, r.wid) for r in brute.collect())
    assert got == want and len(got) > 0


def test_interval_join_boundaries_closed(spark):
    ev = spark.createDataFrame([(1, 100_000_000), (2, 200_000_000), (3, 99_999_999)],
                               "eid long, t_us long")
    iv = spark.createDataFrame([(7, 100_000_000, 200_000_000)],
                               "wid long, s_us long, e_us long")
    got = sorted(
        (r.eid, r.wid) for r in interval_join(
            ev, iv, probe_ts="t_us", start_col="s_us", end_col="e_us",
            bucket_seconds=10, probe_cols=["eid"], interval_cols=["wid"],
        ).collect()
    )
    assert got == [(1, 7), (2, 7)]


def test_interval_join_with_keys(spark):
    ev = spark.createDataFrame(
        [(1, 10, 150), (2, 20, 150)], "eid long, user long, t_us long"
    ).withColumnRenamed("user", "u")
    iv = spark.createDataFrame(
        [(7, 10, 100, 200)], "wid long, u long, s_us long, e_us long"
    )
    got = [
        (r.eid, r.wid) for r in interval_join(
            ev, iv, probe_ts="t_us", start_col="s_us", end_col="e_us",
            bucket_seconds=1, probe_cols=["eid"], interval_cols=["wid"],
            keys=["u"],
        ).collect()
    ]
    assert got == [(1, 7)]


def test_interval_join_timestamp_inputs(spark):
    ev = spark.sql(
        "SELECT 1 AS eid, TIMESTAMP '2024-01-01 00:30:00' AS ts"
    )
    iv = spark.sql(
        "SELECT 7 AS wid, TIMESTAMP '2024-01-01 00:00:00' AS s, "
        "TIMESTAMP '2024-01-01 01:00:00' AS e"
    )
    got = [
        (r.eid, r.wid) for r in interval_join(
            ev, iv, probe_ts="ts", start_col="s", end_col="e",
            bucket_seconds=3600, probe_cols=["eid"], interval_cols=["wid"],
        ).collect()
    ]
    assert got == [(1, 7)]


def test_interval_join_max_buckets_guard(spark):
    ev = _ev(spark, 10)
    iv = spark.createDataFrame([(1, 0, 10_000_000_000_000)],
                               "wid long, s_us long, e_us long")
    bad = interval_join(
        ev, iv, probe_ts="t_us", start_col="s_us", end_col="e_us",
        bucket_seconds=60, probe_cols=["eid"], interval_cols=["wid"],
        max_buckets=100,
    )
    with pytest.raises(Exception, match="buckets"):
        bad.collect()


# --- incremental dedup index ---------------------------------------------

_DOCS_INFO = TableInfo(name="documents", columns=("doc_id", "text"), pk=("doc_id",))


def _corpus(spark, where, v2_mod):
    """Doubled corpus (id, id+1000): exact dup texts; v2 suffix on
    doc_id % v2_mod == 0."""
    d = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), (F.col("id") % 37).cast("string")).alias("text"),
    )
    d = d.unionByName(
        d.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    ).filter(where)
    return d.withColumn(
        "text",
        F.when(F.col("doc_id") % v2_mod == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")),
    )


def test_dedup_index_update_equals_scratch(spark):
    base = _corpus(spark, "doc_id % 13 != 0", 999983)  # no v2 in base
    mod = _corpus(spark, "doc_id % 19 != 0", 17)       # del %19, upd %17, ins %13
    changes = diff_table(base, mod, _DOCS_INFO)
    index = dedup_index_build(base)
    new_index, new_pairs = dedup_index_update(index, changes)

    scratch = dedup_index_build(mod)
    assert sorted(map(tuple, new_index.collect())) == sorted(
        map(tuple, scratch.collect())
    )

    changed = mod.join(base, "doc_id", "left_anti").select("doc_id").unionByName(
        changes.df.filter("op = 'update'").select(
            F.col("old_doc_id").alias("doc_id")
        )
    )
    s = scratch.alias("a").join(
        scratch.alias("b"),
        (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
        F.col("a.fp").alias("fp"),
    )
    ch = [r.doc_id for r in changed.collect()]
    want = sorted(
        (r.doc_a, r.doc_b) for r in s.collect() if r.doc_a in ch or r.doc_b in ch
    )
    got = sorted((r.doc_a, r.doc_b) for r in new_pairs.collect())
    assert got == want and len(got) > 0


def test_dedup_index_update_no_changes_is_noop(spark):
    base = _corpus(spark, "doc_id % 13 != 0", 999983)
    changes = diff_table(base, base, _DOCS_INFO)
    index = dedup_index_build(base)
    new_index, new_pairs = dedup_index_update(index, changes)
    assert new_pairs.isEmpty()
    assert sorted(map(tuple, new_index.collect())) == sorted(
        map(tuple, index.collect())
    )
