"""Property-based invariants (hypothesis): for ARBITRARY snapshot pairs
over a mixed-type schema —

    apply(a, diff(a, b)) == b
    apply(b, invert(diff(a, b))) == a
    concat(diff(a,b), diff(b,c)) applied to a == c
    diff(x, x) empty

Small example counts (Spark jobs per example), but arbitrary value
shapes: nulls everywhere, duplicate non-key values, empty snapshots,
disjoint key sets.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geodiff_spark import (
    TableInfo,
    apply_or_raise,
    concat_tables,
    diff_table,
    has_changes,
)

T = TableInfo("t", ("k", "s", "x", "b"), pk=("k",))
SCHEMA = "k long, s string, x double, b boolean"

_value_row = st.tuples(
    st.integers(min_value=0, max_value=14),  # keys collide across snapshots
    st.one_of(st.none(), st.text(alphabet="abzß日", max_size=4)),
    st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
    st.one_of(st.none(), st.booleans()),
)

_snapshot = st.lists(_value_row, max_size=12).map(
    lambda rows: list({r[0]: r for r in rows}.values())  # unique keys
)

_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(repr, df.collect()))


@given(a=_snapshot, b=_snapshot)
@_settings
def test_diff_apply_roundtrip(spark, a, b):
    da, db = _mk(spark, a), _mk(spark, b)
    cs = diff_table(da, db, T)
    assert _rows(apply_or_raise(da, cs)) == _rows(db)


@given(a=_snapshot, b=_snapshot)
@_settings
def test_invert_roundtrip(spark, a, b):
    from geodiff_spark import invert_table

    da, db = _mk(spark, a), _mk(spark, b)
    cs = diff_table(da, db, T)
    assert _rows(apply_or_raise(db, invert_table(cs))) == _rows(da)


@given(a=_snapshot, b=_snapshot, c=_snapshot)
@_settings
def test_concat_equivalence(spark, a, b, c):
    da, db, dc = _mk(spark, a), _mk(spark, b), _mk(spark, c)
    folded = concat_tables([diff_table(da, db, T), diff_table(db, dc, T)])
    assert _rows(apply_or_raise(da, folded)) == _rows(dc)


@given(a=_snapshot)
@_settings
def test_self_diff_empty(spark, a):
    da = _mk(spark, a)
    assert not has_changes({"t": diff_table(da, da, T)})
