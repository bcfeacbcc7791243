"""Round-3 batch-2 operators: anchor aggregation, cohort retention,
boilerplate DF-filter, adaptive quality gate, zonal stats.

The graded oracle parity for each lives in test_entry_oracle.py (the
registry is parametrized); these tests cover the edge cases and plan
shapes the sf0.01 oracle replay can't see.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from geodiff_spark.operators.corpus import adaptive_quality_gate, boilerplate_chunks
from geodiff_spark.operators.graph import anchor_topk
from geodiff_spark.operators.temporal import cohort_retention


def test_anchor_topk_ties_and_totals(spark):
    edges = spark.createDataFrame(
        [(1, "home"), (1, "start"), (1, "home"), (1, "begin"), (2, "x")],
        "dst long, anchor string",
    )
    got = {
        (r.dst, r.anchor): (r.n, r.rk, r.total_inlinks)
        for r in anchor_topk(edges, 2).collect()
    }
    # dst=1: home wins on count; begin beats start on text asc at n=1
    assert got[(1, "home")] == (2, 1, 4)
    assert got[(1, "begin")] == (1, 2, 4)
    assert (1, "start") not in got  # k=2 cut
    assert got[(2, "x")] == (1, 1, 1)


def test_anchor_topk_total_counts_all_anchors_not_topk(spark):
    # total_inlinks must be computed BEFORE the rank cut
    edges = spark.createDataFrame(
        [(9, a) for a in "abcdefg"], "dst long, anchor string"
    )
    rows = anchor_topk(edges, 3).collect()
    assert len(rows) == 3 and all(r.total_inlinks == 7 for r in rows)


def test_cohort_retention_counts_distinct_users_once(spark):
    # one user active many times in one week still counts once per cell
    ev = spark.createDataFrame(
        [
            ("u1", "2024-01-01 08:00:00"),
            ("u1", "2024-01-03 09:00:00"),  # same ISO week
            ("u1", "2024-01-10 09:00:00"),  # +1 week
            ("u2", "2024-01-10 10:00:00"),  # cohort = week of Jan 8
        ],
        "user_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in cohort_retention(ev).collect()
    }
    assert got[("2024-01-01 00:00:00", 0)] == 1
    assert got[("2024-01-01 00:00:00", 1)] == 1
    assert got[("2024-01-08 00:00:00", 0)] == 1
    assert len(got) == 3


def test_boilerplate_drops_every_occurrence(spark):
    # chunk "a b" appears in 3 docs (df=3 > max_df=2): ALL copies go,
    # including the first one — the dual of span_dedup's first-wins
    docs = spark.createDataFrame(
        [(1, "a b x y"), (2, "a b p q"), (3, "a b"), (4, "u v")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in boilerplate_chunks(docs, "doc_id", "text", 2, 2).collect()}
    assert got[1].kept_text == "x y" and got[1].n_spans == 2 and got[1].n_kept == 1
    assert got[2].kept_text == "p q"
    assert got[3].kept_text == "" and got[3].n_kept == 0
    assert got[4].kept_text == "u v"  # df=1 chunk survives everywhere


def test_boilerplate_df_is_distinct_docs(spark):
    # chunk repeated WITHIN one doc counts once toward df
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b z z")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.kept_text for r in boilerplate_chunks(docs, "doc_id", "text", 2, 2).collect()}
    # df("a b") = 2 docs <= max_df=2 -> kept
    assert got[1] == "a b a b" and got[2] == "a b z z"


def test_boilerplate_plan_is_broadcast_anti(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = boilerplate_chunks(docs, "doc_id", "text", 2, 2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_adaptive_gate_per_group_cutoff(spark):
    rows = [(i, "en", float(i)) for i in range(10)] + [(100, "fr", 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, q double")
    kept = adaptive_quality_gate(df, "lang", "q", "doc_id", 1, 2).collect()
    en = sorted(r.doc_id for r in kept if r.lang == "en")
    fr = [r.doc_id for r in kept if r.lang == "fr"]
    # en: top ceil(10/2)=5 by q desc -> ids 5..9; fr: ceil(1/2)=1 row
    assert en == [5, 6, 7, 8, 9]
    assert fr == [100]  # a 1-row language is never emptied


def test_adaptive_gate_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [(3, "en", 1.0), (1, "en", 1.0), (2, "en", 1.0)],
        "doc_id long, lang string, q double",
    )
    kept = sorted(
        r.doc_id for r in adaptive_quality_gate(df, "lang", "q", "doc_id", 1, 2).collect()
    )
    assert kept == [1, 2]  # ceil(3/2)=2, ties broken by doc_id asc


def test_zonal_stats_matches_manual_filter(spark):
    from geodiff_spark.spatial.pip import zonal_stats

    pts = spark.createDataFrame(
        [(1, 5.0, 5.0, 10), (2, 5.5, 5.5, 20), (3, 50.0, 50.0, 1)],
        "pid long, lat double, lon double, v long",
    )
    ring = [
        {"lon": 0.0, "lat": 0.0},
        {"lon": 10.0, "lat": 0.0},
        {"lon": 10.0, "lat": 10.0},
        {"lon": 0.0, "lat": 10.0},
    ]
    zones = spark.createDataFrame(
        [(7, ring)], "tile_id long, ring array<struct<lon double, lat double>>"
    )
    got = zonal_stats(
        pts,
        zones,
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")],
        res=3,
    ).collect()
    assert len(got) == 1 and got[0].tile_id == 7
    assert (got[0].n, got[0].sv) == (2, 30)  # point 3 is outside
