"""Reference fixture-family parity (FIXTURES.md F4/F5/F6):
composite/text PKs, datetime + float edge values, NULL transitions,
multi-table datasets with skip/include filters."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from geodiff_spark import (
    TableInfo,
    apply_or_raise,
    diff_table,
    has_changes,
    summary_df,
)
from geodiff_spark.api import Dataset, create_changeset


# --- F4: PK variants -------------------------------------------------------

def test_composite_pk(spark):
    """tests/test_driver_sqlite.cpp:145 test_composite_pk."""
    T = TableInfo("t", ("fid_a", "fid_b", "payload"), pk=("fid_a", "fid_b"))
    a = spark.createDataFrame(
        [(1, 1, "x"), (1, 2, "y"), (2, 1, "z")], "fid_a long, fid_b long, payload string"
    )
    b = spark.createDataFrame(
        [(1, 1, "x2"), (2, 1, "z"), (2, 2, "w")], "fid_a long, fid_b long, payload string"
    )
    cs = diff_table(a, b, T)
    counts = {r["op"]: r["cnt"] for r in summary_df({"t": cs}).collect()}
    assert counts == {"insert": 1, "update": 1, "delete": 1}
    assert not has_changes({"t": diff_table(apply_or_raise(a, cs), b, T)})


def test_text_pk_diff(spark):
    """tests/test_driver_sqlite.cpp:161 text PK."""
    T = TableInfo("t", ("code", "payload"), pk=("code",))
    a = spark.createDataFrame([("a", "1"), ("b", "2")], "code string, payload string")
    b = spark.createDataFrame([("a", "1x"), ("c", "3")], "code string, payload string")
    cs = diff_table(a, b, T)
    assert not has_changes({"t": diff_table(apply_or_raise(a, cs), b, T)})


# --- F5: datetime / floating point ----------------------------------------

def test_datetime_ms_normalization(spark):
    """Equivalent timestamps must NOT diff (issue #143 analogue,
    sqlitedriver.cpp:542-561): sub-millisecond differences are not
    changes."""
    T = TableInfo("t", ("fid", "ts"), pk=("fid",), timestamp_cols=("ts",))
    base_ts = dt.datetime(2024, 5, 1, 12, 30, 45, 123000)
    a = spark.createDataFrame([(1, base_ts)], "fid long, ts timestamp")
    # +400 microseconds: same millisecond
    b = spark.createDataFrame(
        [(1, base_ts + dt.timedelta(microseconds=400))], "fid long, ts timestamp"
    )
    assert not has_changes({"t": diff_table(a, b, T)})
    # +1 millisecond: a real change
    c = spark.createDataFrame(
        [(1, base_ts + dt.timedelta(milliseconds=1))], "fid long, ts timestamp"
    )
    assert has_changes({"t": diff_table(a, c, T)})


def test_float_edge_values(spark):
    """floating_point_values fixture: ±0.0, denormals, huge values,
    full-precision round trip (test_driver_postgres.cpp:967-1014
    analogue)."""
    T = TableInfo("t", ("fid", "x"), pk=("fid",))
    vals = [
        (1, 0.0),
        (2, -0.0),
        (3, 5e-324),          # smallest denormal
        (4, 1.7976931348623157e308),
        (5, 0.1 + 0.2),       # classic 0.30000000000000004
        (6, float("inf")),
        (7, float("-inf")),
    ]
    a = spark.createDataFrame(vals, "fid long, x double")
    assert not has_changes({"t": diff_table(a, a, T)})
    b = spark.createDataFrame(
        [(f, x * 2 if f == 5 else x) for f, x in vals], "fid long, x double"
    )
    cs = diff_table(a, b, T)
    rows = cs.df.collect()
    assert len(rows) == 1 and rows[0]["old_fid"] == 5
    patched = apply_or_raise(a, cs)
    assert not has_changes({"t": diff_table(patched, b, T)})


def test_negative_zero_is_a_change(spark):
    """0.0 vs -0.0: IEEE-equal, so NOT a change under <=> — matches
    SQLite value comparison (0.0 = -0.0 is true)."""
    T = TableInfo("t", ("fid", "x"), pk=("fid",))
    a = spark.createDataFrame([(1, 0.0)], "fid long, x double")
    b = spark.createDataFrame([(1, -0.0)], "fid long, x double")
    assert not has_changes({"t": diff_table(a, b, T)})


def test_null_transitions(spark):
    """NULL→value, value→NULL, NULL→NULL per type (null-safe change
    predicate, postgresdriver.cpp:444-451)."""
    T = TableInfo("t", ("fid", "s", "x"), pk=("fid",))
    a = spark.createDataFrame(
        [(1, None, 1.0), (2, "v", None), (3, None, None)],
        "fid long, s string, x double",
    )
    b = spark.createDataFrame(
        [(1, "now", 1.0), (2, None, None), (3, None, None)],
        "fid long, s string, x double",
    )
    cs = diff_table(a, b, T)
    by_fid = {r["old_fid"]: r for r in cs.df.collect()}
    assert set(by_fid) == {1, 2}  # fid 3: NULL==NULL, no change
    r1 = by_fid[1]
    assert r1["old_s"] is None and r1["new_s"] == "now"
    assert (r1["old_bits"] >> T.bit("s")) & 1  # defined NULL, not Undefined
    patched = apply_or_raise(a, cs)
    assert not has_changes({"t": diff_table(patched, b, T)})


# --- F6: multi-table + skip/include ----------------------------------------

def _two_table_ds(spark, va, vb):
    T_A = TableInfo("t_a", ("fid", "v"), pk=("fid",))
    T_B = TableInfo("t_b", ("fid", "v"), pk=("fid",))
    return Dataset(
        tables={
            "t_a": spark.createDataFrame([(1, va)], "fid long, v string"),
            "t_b": spark.createDataFrame([(1, vb)], "fid long, v string"),
        },
        infos={"t_a": T_A, "t_b": T_B},
    )


def test_multi_table_and_skip(spark):
    """updates_to_different_tables + skip_tables
    (pygeodiff/tests/test_skip_tables.py:20-193)."""
    base = _two_table_ds(spark, "a", "b")
    mod = _two_table_ds(spark, "a2", "b2")
    cs = create_changeset(base, mod)
    assert set(cs) == {"t_a", "t_b"}

    import dataclasses

    skip = dataclasses.replace(base, skip_tables=("t_b",))
    skip_mod = dataclasses.replace(mod, skip_tables=("t_b",))
    cs2 = create_changeset(skip, skip_mod)
    assert set(cs2) == {"t_a"}

    incl = dataclasses.replace(base, include_tables=("t_b",))
    incl_mod = dataclasses.replace(mod, include_tables=("t_b",))
    cs3 = create_changeset(incl, incl_mod)
    assert set(cs3) == {"t_b"}

    with pytest.raises(ValueError, match="mutually exclusive"):
        dataclasses.replace(base, skip_tables=("t_a",), include_tables=("t_b",))


def test_mismatched_table_lists_fail(spark):
    base = _two_table_ds(spark, "a", "b")
    import dataclasses

    only_a = Dataset(
        tables={"t_a": base.tables["t_a"]}, infos={"t_a": base.infos["t_a"]}
    )
    with pytest.raises(ValueError, match="different table lists"):
        create_changeset(base, only_a)
