"""Temporal operators (sessionize, asof_join) and the tile pyramid.

Oracle parity for the graded flavors (incl. DuckDB's NATIVE ASOF JOIN
as the asof oracle) is covered by test_entry_oracle; here: semantics on
hand-built cases (tolerance, tie handling, session boundaries), and the
plan gates (one key shuffle, no range join; pyramid stays in codegen)."""

from __future__ import annotations

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from geodiff_spark.operators.temporal import asof_join, sessionize

SF = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def evts(spark):
    rows = [
        # user 1: two sessions split by a 3h gap (threshold 1h)
        (1, _ts("2024-01-01T10:00:00"), 101),
        (1, _ts("2024-01-01T10:30:00"), 102),
        (1, _ts("2024-01-01T13:31:00"), 103),
        # user 2: single event
        (2, _ts("2024-01-01T09:00:00"), 201),
        # user 3: boundary — gap EXACTLY the threshold stays in-session
        (3, _ts("2024-01-01T08:00:00"), 301),
        (3, _ts("2024-01-01T09:00:00"), 302),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")


def test_sessionize_boundaries(evts):
    out = {
        (r.user_id, r.session_id): (r.n_events, r.start_ts, r.end_ts)
        for r in sessionize(evts, "user_id", "ts", 3600, "event_id").collect()
    }
    assert out[(1, 1)] == (2, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:30:00"))
    assert out[(1, 2)] == (1, _ts("2024-01-01T13:31:00"), _ts("2024-01-01T13:31:00"))
    assert out[(2, 1)][0] == 1
    # gap == threshold is NOT a break (strictly-greater semantics)
    assert out[(3, 1)][0] == 2 and (3, 2) not in out


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_ties(spark):
    left = _mk(spark, [
        (1, _ts("2024-01-01T12:00:00"), 10),
        (1, _ts("2024-01-01T09:00:00"), 11),   # before any right row
        (2, _ts("2024-01-01T12:00:00"), 20),   # equal-ts right row matches
    ], "k long, ts timestamp, lid long")
    right = _mk(spark, [
        (1, _ts("2024-01-01T10:00:00"), 91),
        (1, _ts("2024-01-01T11:00:00"), 92),
        (2, _ts("2024-01-01T12:00:00"), 93),
        (2, _ts("2024-01-01T12:00:00"), 94),   # duplicate ts: max tiebreak wins
    ], "k long, ts timestamp, rid long")
    got = {
        r.lid: (r.match_ts, r.match_rid)
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["rid"], tiebreak_col="rid"
        ).collect()
    }
    assert got[10] == (_ts("2024-01-01T11:00:00"), 92)   # latest <= 12:00
    assert got[11] == (None, None)                        # left-join semantics
    assert got[20] == (_ts("2024-01-01T12:00:00"), 94)   # >= match, dedup kept 94


def test_asof_tolerance_nulls_not_drops(spark):
    left = _mk(spark, [(1, _ts("2024-01-01T12:00:00"), 10)],
               "k long, ts timestamp, lid long")
    right = _mk(spark, [(1, _ts("2024-01-01T09:00:00"), 91)],
                "k long, ts timestamp, rid long")
    rows = asof_join(
        left, right, ["k"], "ts", "ts", ["rid"],
        tiebreak_col="rid", tolerance_seconds=3600,
    ).collect()
    assert len(rows) == 1 and rows[0].match_rid is None  # stale match nulled


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_plan_one_shuffle_no_range_join(spark):
    import __spark_entry__ as E

    plan = _final_plan(E.queries()["asof_clicks"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union + window: the only wide ops are the key Exchange(s) feeding
    # the sort/window — never a join operator at all
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_pyramid_codegen_and_single_shuffle(spark):
    import __spark_entry__ as E

    df = E.queries()["tile_pyramid"](spark, SF)
    plan = _final_plan(df)
    # spread-once/shift-per-level keeps the stage inside codegen
    assert re.search(r"\*\(\d+\)", plan), "pyramid fell out of WholeStageCodegen"
    assert plan.count("Exchange") <= 2  # partial agg + final agg exchange only
    # every requested level present, counts sum to rows x levels
    import __spark_entry__ as E2
    n_pts = E2._customers_geo(spark, SF).count()
    per_level = {r.level: 0 for r in df.collect()}
    rows = df.collect()
    for lv in (2, 4, 7):
        assert lv in {r.level for r in rows}
    assert sum(r.n for r in rows) == 3 * n_pts


def test_pyramid_delta_merges_to_mod_pyramid(spark):
    """IVM invariant: pyramid(base) ⊕ delta(changeset) == pyramid(mod)."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F
    from geodiff_spark.spatial.cells import merge_pyramid, pyramid_rollup

    base_p = pyramid_rollup(
        E._customers_geo(spark, SF), F.col("lat"), F.col("lon"),
        E._RES, (2, E._COARSE, E._RES),
    )
    mod_p = pyramid_rollup(
        E._geo_points_mod(spark, SF), F.col("lat"), F.col("lon"),
        E._RES, (2, E._COARSE, E._RES),
    )
    delta = E.queries()["pyramid_delta"](spark, SF)
    merged = merge_pyramid(base_p, delta)
    got = sorted(map(tuple, merged.collect()))
    exp = sorted(map(tuple, mod_p.collect()))
    assert got == exp
