"""Property tests for the concat 9-case merge fold.

`merge_pair` / `concat_tables` (operators/concat.py) replace the
reference's sequential per-entry hash fold (concatChangesets +
mergeEntriesForRow + mergeUpdate, changesetconcat.cpp:69-275) with one
full-outer join plus metaprogrammed per-column CASE logic. The golden
scenarios (test_concat.py, mirroring tests/test_changeset_utils.cpp)
cover the known cases; this suite covers the unknown ones, the same way
test_rebase_property.py pins the insert allocator:

  * ``seq_concat``      — straight Python transcription of the
    reference's sequential fold (hash keyed by pk; mergeEntriesForRow's
    9-case table; mergeUpdate's per-column old/new/definedness rules;
    Unsupported removes the existing entry AND discards the newer one,
    changesetconcat.cpp:245-251);
  * ``spark_merge_py``  — pure-Python transcription of merge_pair's
    CASE program, folded pairwise like concat_tables.

A hypothesis sweep (500 generated changeset triples, canonical
INSERT/DELETE shapes + arbitrarily-partial UPDATE definedness) asserts
both models produce identical merged entries AND identical
unsupported-drop sets. A seeded randomized batch then packs hundreds of
cases as distinct pks into ONE real concat_tables run, pinning the
DataFrame plumbing to the sequential model too.

Tagged values: ``U`` (TypeUndefined) vs ``("v", x)`` where x may be
None (TypeNull) — definedness mismatch is inequality, Null == Null
(changeset.h:54-69). Canonical-shape precondition: INSERTs carry fully
defined `new`, DELETEs fully defined `old` (what sqlite3session and
our diff emit); only UPDATE definedness is fuzzed.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geodiff_spark.changeset import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ChangesetTable,
    TableInfo,
)
from geodiff_spark.operators.concat import concat_tables, unsupported_pairs

# table under test: fid pk + two value columns, all long
COLS = ("fid", "a", "b")
PK_I = 0
T = TableInfo(name="t", columns=COLS, pk=("fid",))

U = ("U",)  # TypeUndefined


def v(x):  # defined value (x may be None == TypeNull)
    return ("v", x)


def is_def(t):
    return t != U


def val(t):
    return t[1] if is_def(t) else None


# --------------------------------------------------------------------------
# sequential reference model (transcribed from changesetconcat.cpp)
# --------------------------------------------------------------------------

def _merge_value(v1, v2):
    """mergeValue (changesetconcat.cpp:69-72): v2 wins if defined."""
    return v2 if is_def(v2) else v1


def _merge_update(old1, old2, new1, new2):
    """mergeUpdate (changesetconcat.cpp:78-117). old2/new2 may be None
    (the D+I call passes empty vectors). Returns (required, old, new)."""
    required = False
    out_old, out_new = [], []
    for i in range(len(COLS)):
        vo = _merge_value(old1[i], old2[i] if old2 is not None else U)
        vn = _merge_value(new1[i], new2[i] if new2 is not None else U)
        pk = i == PK_I
        if vo != vn and not pk:
            required = True
        out_old.append(vo if (pk or vo != vn) else U)
        out_new.append(vn if (not pk and vo != vn) else U)
    return required, tuple(out_old), tuple(out_new)


def _merge_entries_for_row(e1, e2):
    """mergeEntriesForRow (changesetconcat.cpp:130-191). Returns
    ('modified', entry) | ('removed',) | ('unsupported',)."""
    op1, old1, new1 = e1
    op2, old2, new2 = e2
    if (op1, op2) in {
        (OP_INSERT, OP_INSERT), (OP_UPDATE, OP_INSERT),
        (OP_DELETE, OP_UPDATE), (OP_DELETE, OP_DELETE),
    }:
        return ("unsupported",)
    if (op1, op2) == (OP_INSERT, OP_DELETE):
        return ("removed",)
    if (op1, op2) == (OP_INSERT, OP_UPDATE):
        merged_new = tuple(
            new2[i] if is_def(new2[i]) else new1[i] for i in range(len(COLS))
        )
        return ("modified", (OP_INSERT, old1, merged_new))
    if (op1, op2) == (OP_UPDATE, OP_UPDATE):
        # note the reference's argument order: old1=e2.old, old2=e1.old
        req, o, n = _merge_update(old2, old1, new1, new2)
        if not req:
            return ("removed",)
        return ("modified", (OP_UPDATE, o, n))
    if (op1, op2) == (OP_UPDATE, OP_DELETE):
        merged_old = tuple(
            old1[i] if is_def(old1[i]) else old2[i] for i in range(len(COLS))
        )
        return ("modified", (OP_DELETE, merged_old, tuple(U for _ in COLS)))
    if (op1, op2) == (OP_DELETE, OP_INSERT):
        req, o, n = _merge_update(old1, None, new2, None)
        if not req:
            return ("removed",)
        return ("modified", (OP_UPDATE, o, n))
    raise AssertionError("all 9 cases exhausted")


def _row_key(entry):
    """HashChangesetEntryPkey (changesetconcat.cpp:21-35): pk from new
    for inserts, old otherwise."""
    op, old, new = entry
    return val(new[PK_I]) if op == OP_INSERT else val(old[PK_I])


def seq_concat(changesets):
    """concatChangesets' fold (changesetconcat.cpp:196-275) over lists
    of entries. Returns (entries_by_key, dropped) where dropped records
    every Unsupported pair as (key, op1, op2)."""
    state: dict = {}
    dropped = []
    for cs in changesets:
        for e in cs:
            k = _row_key(e)
            if k not in state:
                state[k] = e
                continue
            res = _merge_entries_for_row(state[k], e)
            if res[0] == "modified":
                state[k] = res[1]
            elif res[0] == "removed":
                del state[k]
            else:  # unsupported: drop existing AND discard newer
                dropped.append((k, state[k][0], e[0]))
                del state[k]
    return state, dropped


# --------------------------------------------------------------------------
# pure-Python transcription of merge_pair's CASE program
# --------------------------------------------------------------------------

def _differs(t1, t2):
    """_differs (concat.py): definedness mismatch differs; both-defined
    compares null-safely."""
    if is_def(t1) != is_def(t2):
        return True
    return is_def(t1) and val(t1) != val(t2)


def _merge_pair_py(e1, e2):
    """One full-outer-join row of merge_pair, both sides present.
    Returns ('keep', entry) | ('drop',) | ('unsupported',)."""
    op1, old1, new1 = e1
    op2, old2, new2 = e2
    is_iu = (op1, op2) == (OP_INSERT, OP_UPDATE)
    is_uu = (op1, op2) == (OP_UPDATE, OP_UPDATE)
    is_ud = (op1, op2) == (OP_UPDATE, OP_DELETE)
    is_di = (op1, op2) == (OP_DELETE, OP_INSERT)
    is_cancel = (op1, op2) == (OP_INSERT, OP_DELETE)
    if not (is_iu or is_uu or is_ud or is_di or is_cancel):
        return ("unsupported",)
    if is_cancel:
        return ("drop",)
    # mergeUpdate value pipeline
    vo = [old1[i] if is_def(old1[i]) else old2[i] for i in range(len(COLS))]
    vn = [new2[i] if is_def(new2[i]) else new1[i] for i in range(len(COLS))]
    differ = [_differs(vo[i], vn[i]) for i in range(len(COLS))]
    merged_required = any(differ[i] for i in range(len(COLS)) if i != PK_I)
    if is_iu:
        out_new = tuple(
            new2[i] if is_def(new2[i]) else new1[i] for i in range(len(COLS))
        )
        return ("keep", (OP_INSERT, old1, out_new))
    if is_ud:
        out_old = tuple(
            old1[i] if is_def(old1[i]) else old2[i] for i in range(len(COLS))
        )
        return ("keep", (OP_DELETE, out_old, tuple(U for _ in COLS)))
    # is_uu | is_di -> merged UPDATE
    if not merged_required:
        return ("drop",)
    out_old = tuple(
        vo[i] if (i == PK_I or differ[i]) else U for i in range(len(COLS))
    )
    out_new = tuple(
        vn[i] if (i != PK_I and differ[i]) else U for i in range(len(COLS))
    )
    return ("keep", (OP_UPDATE, out_old, out_new))


def spark_merge_py(changesets):
    """concat_tables' pairwise fold, in Python. Returns the same
    (entries_by_key, dropped) shape as seq_concat."""
    dropped = []

    def merge(cs1, cs2):
        keys = list(dict.fromkeys(list(cs1) + list(cs2)))
        out = {}
        for k in keys:
            e1, e2 = cs1.get(k), cs2.get(k)
            if e1 is None:
                out[k] = e2
            elif e2 is None:
                out[k] = e1
            else:
                res = _merge_pair_py(e1, e2)
                if res[0] == "keep":
                    out[k] = res[1]
                elif res[0] == "unsupported":
                    dropped.append((k, e1[0], e2[0]))
        return out

    acc = {_row_key(e): e for e in changesets[0]}
    for cs in changesets[1:]:
        acc = merge(acc, {_row_key(e): e for e in cs})
    return acc, dropped


# --------------------------------------------------------------------------
# entry generators
# --------------------------------------------------------------------------

_VALS = [None, 1, 2]  # TypeNull plus two distinguishable values


def _gen_entry(rng, fid, op):
    """Canonical INSERT/DELETE; UPDATE with fuzzed per-column
    definedness: each non-pk column one of (U,U), (v,v'), (v,U), (U,v)."""
    n = len(COLS)
    if op == OP_INSERT:
        new = [v(fid)] + [v(rng.choice(_VALS)) for _ in range(n - 1)]
        return (OP_INSERT, tuple(U for _ in COLS), tuple(new))
    if op == OP_DELETE:
        old = [v(fid)] + [v(rng.choice(_VALS)) for _ in range(n - 1)]
        return (OP_DELETE, tuple(old), tuple(U for _ in COLS))
    old, new = [v(fid)], [U]
    for _ in range(n - 1):
        shape = rng.choices(["vv", "uu", "vu", "uv"], weights=[6, 1, 1, 1])[0]
        old.append(v(rng.choice(_VALS)) if shape[0] == "v" else U)
        new.append(v(rng.choice(_VALS)) if shape[1] == "v" else U)
    return (OP_UPDATE, tuple(old), tuple(new))


def _gen_case(rng):
    """One row's history: for each of 3 changesets, maybe an entry."""
    out = []
    for _ in range(3):
        op = rng.choice([None, OP_INSERT, OP_UPDATE, OP_DELETE])
        out.append(op)
    return out


# --------------------------------------------------------------------------
# hypothesis sweep: reference fold == Spark CASE transcription
# --------------------------------------------------------------------------

@settings(
    max_examples=500,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_concat_fold_matches_reference_model(seed):
    rng = random.Random(seed)
    n_rows = rng.randint(1, 6)
    changesets = [[], [], []]
    for fid in range(1, n_rows + 1):
        ops = _gen_case(rng)
        for ci, op in enumerate(ops):
            if op is not None:
                changesets[ci].append(_gen_entry(rng, fid, op))
    ref_state, ref_drops = seq_concat(changesets)
    spk_state, spk_drops = spark_merge_py(changesets)
    assert spk_state == ref_state
    assert sorted(spk_drops) == sorted(ref_drops)


# --------------------------------------------------------------------------
# seeded batch through the real DataFrame implementation
# --------------------------------------------------------------------------

def _to_df(spark, entries):
    """Build the IR DataFrame (op, old_*, new_*, old_bits, new_bits)."""
    rows = []
    for op, old, new in entries:
        old_bits = sum(1 << i for i in range(len(COLS)) if is_def(old[i]))
        new_bits = sum(1 << i for i in range(len(COLS)) if is_def(new[i]))
        rows.append(
            (op, *[val(t) for t in old], *[val(t) for t in new],
             old_bits, new_bits)
        )
    schema = (
        "op string, "
        + ", ".join(f"old_{c} long" for c in COLS) + ", "
        + ", ".join(f"new_{c} long" for c in COLS)
        + ", old_bits long, new_bits long"
    )
    return ChangesetTable(info=T, df=spark.createDataFrame(rows, schema))


def _from_rows(rows):
    out = {}
    for r in rows:
        old = tuple(
            v(r[f"old_{c}"]) if (r["old_bits"] >> i) & 1 else U
            for i, c in enumerate(COLS)
        )
        new = tuple(
            v(r[f"new_{c}"]) if (r["new_bits"] >> i) & 1 else U
            for i, c in enumerate(COLS)
        )
        e = (r["op"], old, new)
        out[_row_key(e)] = e
    return out


@pytest.mark.parametrize("seed", [7, 2026])
def test_concat_dataframe_matches_sequential_model(spark, seed):
    rng = random.Random(seed)
    n_rows = 300
    changesets = [[], [], []]
    for fid in range(1, n_rows + 1):
        ops = _gen_case(rng)
        while all(o is None for o in ops):
            ops = _gen_case(rng)
        for ci, op in enumerate(ops):
            if op is not None:
                changesets[ci].append(_gen_entry(rng, fid, op))
    ref_state, ref_drops = seq_concat(changesets)

    tables = [_to_df(spark, cs) for cs in changesets]
    got = _from_rows(concat_tables(tables).df.collect())
    assert got == ref_state

    # pair-level unsupported side-output == the sequential model's drop
    # set when folding just the first two changesets
    _, pair_drops = seq_concat(changesets[:2])
    side = {
        (r["fid"], r["op1"], r["op2"])
        for r in unsupported_pairs(tables[0], tables[1]).collect()
    }
    assert side == set(pair_drops)
