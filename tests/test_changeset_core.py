"""Round-trip invariants on diff/invert/apply — the reference's core
oracle (pygeodiff/tests/test_single_commit.py:44-62):

  apply(base, diff(base, modified))  == modified
  apply(modified, invert(diff))      == base
  diff(x, x) has no changes
"""

from __future__ import annotations

import pytest

from geodiff_spark import (
    ConflictsError,
    SchemaMismatchError,
    TableInfo,
    apply_or_raise,
    apply_table,
    changeset_count,
    diff_table,
    has_changes,
    invert_table,
    summary_df,
)
from geodiff_spark.sources.pages import pages_snapshot

from .conftest import assert_df_equal

PAGES = TableInfo(
    name="pages",
    columns=("url", "warc_ts", "html", "text", "lang", "lat", "lon"),
    pk=("url",),
    timestamp_cols=("warc_ts",),
)

N = 400


@pytest.fixture(scope="module")
def snaps(spark):
    v1 = pages_snapshot(spark, N, version=1).cache()
    v2 = pages_snapshot(spark, N, version=2).cache()
    v1.count(), v2.count()
    return v1, v2


def test_diff_self_is_empty(spark, snaps):
    v1, _ = snaps
    cs = diff_table(v1, v1, PAGES)
    assert not has_changes({"pages": cs})
    assert changeset_count({"pages": cs}) == 0


def test_diff_counts_match_generator(spark, snaps):
    v1, v2 = snaps
    cs = diff_table(v1, v2, PAGES)
    counts = {r["op"]: r["cnt"] for r in summary_df({"pages": cs}).collect()}
    assert counts["insert"] == 40  # 0.1 * N fresh urls
    assert counts["delete"] == len([i for i in range(N) if i % 11 == 3])
    expected_upd = len([i for i in range(N) if i % 7 == 1 and i % 11 != 3])
    assert 0 < counts["update"] <= expected_upd


def test_changeset_wire_invariants(spark, snaps):
    """insert: new fully defined/old empty; delete: inverse; update: PK in
    old only, changed cols defined both sides (docs/changeset-format.md)."""
    v1, v2 = snaps
    cs = diff_table(v1, v2, PAGES)
    full = PAGES.full_mask()
    for r in cs.df.collect():
        if r["op"] == "insert":
            assert r["new_bits"] == full and r["old_bits"] == 0
            assert r["new_url"] is not None
        elif r["op"] == "delete":
            assert r["old_bits"] == full and r["new_bits"] == 0
        else:
            pk_bit = 1 << PAGES.bit("url")
            assert r["old_bits"] & pk_bit
            assert not (r["new_bits"] & pk_bit)
            # changed non-pk cols appear on both sides
            assert r["old_bits"] ^ pk_bit == r["new_bits"]


def test_apply_roundtrip(spark, snaps):
    v1, v2 = snaps
    cs = diff_table(v1, v2, PAGES)
    patched = apply_or_raise(v1.select(*PAGES.columns), cs)
    assert_df_equal(patched, v2.select(*PAGES.columns))
    # re-diff must be empty (the reference's equals() helper)
    assert not has_changes({"pages": diff_table(patched, v2, PAGES)})


def test_invert_roundtrip(spark, snaps):
    v1, v2 = snaps
    cs = diff_table(v1, v2, PAGES)
    inv = invert_table(cs)
    restored = apply_or_raise(v2.select(*PAGES.columns), inv)
    assert_df_equal(restored, v1.select(*PAGES.columns))


def test_apply_conflicts(spark, snaps):
    """Applying a changeset to the wrong base → guard mismatches, raise
    (GEODIFF_CONFLICTS, geodiff.h:41)."""
    v1, v2 = snaps
    cs = diff_table(v1, v2, PAGES)
    with pytest.raises(ConflictsError):
        apply_or_raise(v2.select(*PAGES.columns), cs)
    _, conflicts = apply_table(v2.select(*PAGES.columns), cs)
    reasons = {r["reason"] for r in conflicts.collect()}
    assert "insert_exists" in reasons
    assert "delete_nothing" in reasons


def test_schema_drift_fails_cleanly(spark, snaps):
    v1, v2 = snaps
    with pytest.raises(SchemaMismatchError):
        diff_table(v1.drop("lang"), v2, PAGES)
    with pytest.raises(SchemaMismatchError):
        diff_table(
            v1.withColumn("lat", v1["lat"].cast("string")), v2, PAGES
        )
