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


# ---------------------------------------------------------------------------
# rebase properties — random concurrent edit scripts
# ---------------------------------------------------------------------------

_BASE_KEYS = list(range(8))
_INS_KEYS = list(range(10, 14))

# per-key action: 0 keep, 1 update, 2 delete; update values from a tiny
# alphabet so same-value concurrent edits (the cancel case) happen often
_side = st.tuples(
    st.lists(st.sampled_from([0, 1, 2]), min_size=8, max_size=8),
    st.lists(st.sampled_from(["p", "q"]), min_size=8, max_size=8),
    st.lists(st.booleans(), min_size=4, max_size=4),  # which ids inserted
)


def _apply_side(base_rows, side):
    ops, vals, ins = side
    out, deleted, updated = [], set(), {}
    for (k, s, x, b), op, v in zip(base_rows, ops, vals):
        if op == 2:
            deleted.add(k)
        elif op == 1:
            out.append((k, v, x, b))
            updated[k] = v
        else:
            out.append((k, s, x, b))
    inserts = {}
    for k, flag in zip(_INS_KEYS, ins):
        if flag:
            out.append((k, f"ins{k}", 1.0, True))
            inserts[k] = f"ins{k}"
    return out, deleted, updated, inserts


@given(theirs_side=_side, ours_side=_side)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rebase_merge_semantics(spark, theirs_side, ours_side):
    """For ARBITRARY concurrent edit scripts, rebase lands on the
    reference's merge table: delete wins, ours wins conflicting updates,
    same-value edits cancel, colliding inserts remap (count + values
    preserved), theirs inserts keep their ids."""
    from geodiff_spark.api import Dataset, rebase
    from geodiff_spark.plans.cache import cache_scope

    base_rows = [(k, f"s{k}", float(k), k % 2 == 0) for k in _BASE_KEYS]
    t_rows, t_del, t_upd, t_ins = _apply_side(base_rows, theirs_side)
    o_rows, o_del, o_upd, o_ins = _apply_side(base_rows, ours_side)

    def ds(rows):
        return Dataset(tables={"t": _mk(spark, rows)}, infos={"t": T})

    with cache_scope():
        final, conflicts = rebase(ds(base_rows), ds(t_rows), ds(o_rows))
        got = {r["k"]: r for r in final.tables["t"].collect()}
        n_conf = conflicts.get("t").count() if conflicts else 0

    # PK uniqueness
    assert len(got) == final.tables["t"].count()

    # deletes win (either side); survivors carry the merge-table value
    for k, s, x, b in base_rows:
        if k in t_del or k in o_del:
            assert k not in got
        elif k in o_upd:
            assert got[k]["s"] == o_upd[k]  # ours wins (or equal-cancel)
        elif k in t_upd:
            assert got[k]["s"] == t_upd[k]
        else:
            assert got[k]["s"] == s

    # theirs inserts keep their ids and values
    for k, v in t_ins.items():
        assert got[k]["s"] == v
    # ours inserts all survive (possibly remapped): match by value
    final_ins_vals = {r["s"] for k, r in got.items() if k >= 10}
    assert set(o_ins.values()) <= final_ins_vals
    assert len([k for k in got if k >= 10]) == len(t_ins) + len(o_ins)

    # conflicts only when both updated the same key differently (their
    # delete vs our update is also a conflict item)
    both_diff = [k for k in t_upd if k in o_upd and t_upd[k] != o_upd[k]]
    del_vs_upd = [k for k in o_upd if k in t_del]
    if not both_diff and not del_vs_upd:
        assert n_conf == 0
    else:
        assert n_conf >= 1
