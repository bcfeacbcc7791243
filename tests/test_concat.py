"""Concat 9-case merge table (changesetconcat.cpp:130-191) — replicates
the reference's test_concat_changesets_* scenarios
(tests/test_changeset_utils.cpp:191-378) on a small keyed table, plus
the algebraic oracle: concat(diff(a,b), diff(b,c)) ≡ diff(a,c) after
apply.
"""

from __future__ import annotations

import pytest

from geodiff_spark import (
    TableInfo,
    apply_or_raise,
    concat_tables,
    diff_table,
    has_changes,
)
from geodiff_spark.changeset import ChangesetTable

T = TableInfo(name="t", columns=("fid", "name", "rating"), pk=("fid",))


def snap(spark, rows):
    return spark.createDataFrame(rows, "fid long, name string, rating long")


@pytest.fixture(scope="module")
def abc(spark):
    a = snap(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40), (5, "e", 50)])
    # b: update 1, delete 2, insert 6, update 3
    b = snap(spark, [(1, "a2", 10), (3, "c", 31), (4, "d", 40), (5, "e", 50), (6, "f", 60)])
    # c: delete the inserted 6 (I+D), update 1 again (U+U), re-insert 2 (D+I),
    #    delete 3 (U+D), update 4 (new change), revert 5? (5 untouched)
    c = snap(spark, [(1, "a3", 11), (2, "b", 99), (4, "d2", 40), (5, "e", 50)])
    return a, b, c


def test_concat_equals_direct_diff(spark, abc):
    a, b, c = abc
    cs_ab = diff_table(a, b, T)
    cs_bc = diff_table(b, c, T)
    folded = concat_tables([cs_ab, cs_bc])
    patched = apply_or_raise(a, folded)
    assert not has_changes({"t": diff_table(patched, c, T)})


def test_concat_insert_then_delete_drops(spark, abc):
    a, b, c = abc
    folded = concat_tables([diff_table(a, b, T), diff_table(b, c, T)])
    rows = {r["op"]: r for r in folded.df.collect() if (r["old_fid"] or r["new_fid"]) == 6}
    assert rows == {}  # fid 6: I then D → vanishes


def test_concat_update_update_merges(spark, abc):
    a, b, c = abc
    folded = concat_tables([diff_table(a, b, T), diff_table(b, c, T)])
    row = [
        r
        for r in folded.df.collect()
        if r["op"] == "update" and r["old_fid"] == 1
    ]
    assert len(row) == 1
    r = row[0]
    assert r["old_name"] == "a" and r["new_name"] == "a3"
    assert r["old_rating"] == 10 and r["new_rating"] == 11


def test_concat_delete_insert_becomes_update(spark, abc):
    a, b, c = abc
    folded = concat_tables([diff_table(a, b, T), diff_table(b, c, T)])
    row = [r for r in folded.df.collect() if r["op"] == "update" and r["old_fid"] == 2]
    assert len(row) == 1
    r = row[0]
    # only rating changed net (b→99); name stayed "b" so it's undefined
    assert r["old_rating"] == 20 and r["new_rating"] == 99
    assert r["new_name"] is None and not (r["new_bits"] >> T.bit("name")) & 1


def test_concat_update_delete_becomes_delete(spark, abc):
    a, b, c = abc
    folded = concat_tables([diff_table(a, b, T), diff_table(b, c, T)])
    row = [r for r in folded.df.collect() if r["op"] == "delete"]
    fids = {r["old_fid"] for r in row}
    assert 3 in fids
    r = [x for x in row if x["old_fid"] == 3][0]
    # old values backfilled to ORIGINAL state (rating 31 was b's value;
    # update listed old rating=30... reference: update.old wins where defined)
    assert r["old_name"] == "c" and r["old_rating"] == 30
    assert r["old_bits"] == T.full_mask()


def test_concat_cancelling_updates_drop(spark):
    a = snap(spark, [(1, "x", 1)])
    b = snap(spark, [(1, "y", 1)])
    folded = concat_tables([diff_table(a, b, T), diff_table(b, a, T)])
    assert folded.df.count() == 0


def test_concat_unsupported_drops_both(spark):
    """I+I / D+D etc. remove the row entirely
    (changesetconcat.cpp:252-258)."""
    a = snap(spark, [(1, "x", 1)])
    b = snap(spark, [])
    cs_del = diff_table(a, b, T)  # delete fid 1
    folded = concat_tables([cs_del, cs_del])  # D+D → unsupported
    assert folded.df.count() == 0


def test_concat_three_chains(spark, abc):
    a, b, c = abc
    d = snap(spark, [(1, "a3", 11), (4, "d2", 40)])  # delete 2 and 5 again
    folded = concat_tables(
        [diff_table(a, b, T), diff_table(b, c, T), diff_table(c, d, T)]
    )
    patched = apply_or_raise(a, folded)
    assert not has_changes({"t": diff_table(patched, d, T)})


def test_concat_unsupported_observed(spark):
    """Corrupt op sequences (here I+I) are dropped AND observable: the
    Observation metric rides the merge's own action, and the
    unsupported_pairs side-output names the offending keys — parity
    with the reference's per-occurrence warning
    (changesetconcat.cpp:135-139, driver warning :252-258)."""
    from pyspark.sql import Observation

    from geodiff_spark.operators.concat import merge_pair, unsupported_pairs

    a = snap(spark, [])
    b = snap(spark, [(1, "x", 1), (2, "y", 2)])
    cs_ins = diff_table(a, b, T)  # two INSERTs
    obs = Observation("concat_audit")
    merged = merge_pair(cs_ins, cs_ins, observation=obs)  # I+I twice
    assert merged.df.count() == 0  # both rows dropped
    assert obs.get["unsupported_pairs"] == 2

    side = unsupported_pairs(cs_ins, cs_ins)
    rows = sorted((r["fid"], r["op1"], r["op2"]) for r in side.collect())
    assert rows == [(1, "insert", "insert"), (2, "insert", "insert")]


def test_concat_supported_sequences_not_flagged(spark, abc):
    """A legal I→D cancellation and normal U+U merges observe zero
    unsupported pairs."""
    from pyspark.sql import Observation

    from geodiff_spark.operators.concat import unsupported_pairs

    a, b, c = abc
    cs_ab, cs_bc = diff_table(a, b, T), diff_table(b, c, T)
    obs = Observation()
    folded = concat_tables([cs_ab, cs_bc], observation=obs)
    folded.df.count()
    assert obs.get["unsupported_pairs"] == 0
    assert unsupported_pairs(cs_ab, cs_bc).count() == 0
