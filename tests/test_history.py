"""SCD2 history from changesets: slice-equals-apply invariant, delete
intervals, attribute carry-forward, single-shuffle plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodiff_spark.changeset import TableInfo
from geodiff_spark.operators.apply import apply_or_raise
from geodiff_spark.operators.diff import diff_table
from geodiff_spark.operators.history import scd2_from_changesets, snapshot_at

INFO = TableInfo(name="t", columns=("k", "a", "b"), pk=("k",))


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_scd2_slices_equal_apply_chain(spark):
    s0 = _snap(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    s1 = _snap(spark, [(1, "x", 11), (3, "z", 30), (4, "w", 40)])   # upd 1, del 2, ins 4
    s2 = _snap(spark, [(1, "x2", 11), (3, "z", 33), (4, "w", 40), (2, "back", 99)])
    cs1 = diff_table(s0, s1, INFO)
    cs2 = diff_table(s1, s2, INFO)
    hist = scd2_from_changesets(s0, [(1, cs1), (2, cs2)], INFO)
    assert _rows(snapshot_at(hist, 0, INFO)) == _rows(s0)
    assert _rows(snapshot_at(hist, 1, INFO)) == _rows(s1)
    assert _rows(snapshot_at(hist, 2, INFO)) == _rows(s2)
    # and apply agrees (slice == apply-chain)
    assert _rows(snapshot_at(hist, 1, INFO)) == _rows(apply_or_raise(s0, cs1))


def test_scd2_intervals_and_delete_closure(spark):
    s0 = _snap(spark, [(1, "x", 10), (2, "y", 20)])
    s1 = _snap(spark, [(1, "x", 11)])                  # del 2, upd 1
    s2 = _snap(spark, [(1, "x", 11), (2, "y2", 21)])   # re-insert 2
    hist = scd2_from_changesets(
        s0, [(1, diff_table(s0, s1, INFO)), (2, diff_table(s1, s2, INFO))], INFO
    )
    got = _rows(hist)
    # k=1: [0,1) with b=10, [1,None) with b=11
    # k=2: [0,1) closed by delete, [2,None) after re-insert
    assert (1, "x", 10, 0, 1) in got and (1, "x", 11, 1, None) in got
    assert (2, "y", 20, 0, 1) in got and (2, "y2", 21, 2, None) in got
    assert len(got) == 4


def test_scd2_carry_forward_unchanged_attrs(spark):
    """An update touching only `b` must carry `a` forward (wire-faithful
    sparse update entries)."""
    s0 = _snap(spark, [(7, "keep", 1)])
    s1 = _snap(spark, [(7, "keep", 2)])
    cs = diff_table(s0, s1, INFO)
    # the IR really is sparse: new_a must be NULL on the update row
    row = cs.df.filter("op = 'update'").collect()[0]
    assert row["new_a"] is None and row["new_b"] == 2
    hist = scd2_from_changesets(s0, [(1, cs)], INFO)
    assert _rows(hist) == [(7, "keep", 1, 0, 1), (7, "keep", 2, 1, None)]


def test_scd2_version_validation(spark):
    s0 = _snap(spark, [(1, "x", 1)])
    cs = diff_table(s0, s0, INFO)
    with pytest.raises(ValueError):
        scd2_from_changesets(s0, [(0, cs)], INFO)
    with pytest.raises(ValueError):
        scd2_from_changesets(s0, [(2, cs), (1, cs)], INFO)


def test_scd2_plan_single_pk_shuffle(spark):
    s0 = _snap(spark, [(1, "x", 10), (2, "y", 20)])
    s1 = _snap(spark, [(1, "x", 11), (2, "y", 20)])
    hist = scd2_from_changesets(s0, [(1, diff_table(s0, s1, INFO))], INFO)
    plan = hist._jdf.queryExecution().executedPlan().toString()
    import re

    # every exchange hashes on the pk (k#NN) — the fold introduces no
    # second shuffle key; and the two window passes share one sort:
    # both Window operators stack with no Exchange between them
    assert not [
        m for m in re.findall(r"hashpartitioning\((\w+)#", plan) if m != "k"
    ], plan
    assert plan.count("Window") >= 1
    window_block = plan[plan.find("Window"):]
    first_sort = window_block.find("Sort")
    assert "Exchange" not in window_block[:first_sort], plan


def test_history_apply_equals_batch_fold(spark):
    """history_apply folded one changeset at a time == the one-shot
    scd2_from_changesets (incremental IVM correctness)."""
    from geodiff_spark.operators.history import history_apply

    s0 = _snap(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    s1 = _snap(spark, [(1, "x", 11), (3, "z", 30), (4, "w", 40)])
    s2 = _snap(spark, [(1, "x2", 11), (3, "z", 33), (4, "w", 40), (2, "b", 9)])
    cs1, cs2 = diff_table(s0, s1, INFO), diff_table(s1, s2, INFO)
    batch = scd2_from_changesets(s0, [(1, cs1), (2, cs2)], INFO)

    h = scd2_from_changesets(s0, [], INFO)
    h = history_apply(h, cs1, 1, INFO)
    h = history_apply(h, cs2, 2, INFO)
    assert _rows(h) == _rows(batch)


def test_history_apply_sparse_update_carries_prev(spark):
    from geodiff_spark.operators.history import history_apply

    s0 = _snap(spark, [(7, "keep", 1)])
    s1 = _snap(spark, [(7, "keep", 2)])
    h = scd2_from_changesets(s0, [], INFO)
    h = history_apply(h, diff_table(s0, s1, INFO), 1, INFO)
    assert _rows(h) == [(7, "keep", 1, 0, 1), (7, "keep", 2, 1, None)]


def test_history_stream_matches_batch(spark, tmp_path):
    """Two changeset files streamed through history_stream produce the
    same history as the one-shot batch fold."""
    import shutil

    from geodiff_spark.streaming.history import (
        current_history,
        history_stream,
        init_history_store,
    )

    s0 = _snap(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    s1 = _snap(spark, [(1, "x", 11), (3, "z", 30), (4, "w", 40)])
    s2 = _snap(spark, [(1, "x2", 11), (3, "z", 33), (4, "w", 40)])
    cs1, cs2 = diff_table(s0, s1, INFO), diff_table(s1, s2, INFO)
    batch = scd2_from_changesets(s0, [(1, cs1), (2, cs2)], INFO)

    src = tmp_path / "cs_src"
    src.mkdir()
    # one parquet file per changeset, dropped in order (file source
    # batches them by modification order with maxFilesPerTrigger=1)
    for i, cs in enumerate((cs1, cs2)):
        stage = tmp_path / f"cs_stage{i}"
        cs.df.coalesce(1).write.parquet(str(stage))
        part = sorted(stage.glob("part-*.parquet"))[0]
        shutil.copy(part, src / f"b{i}.parquet")

    store = str(tmp_path / "hist_store")
    init_history_store(scd2_from_changesets(s0, [], INFO), store)
    stream = (
        spark.readStream.schema(cs1.df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = history_stream(stream, INFO, store, str(tmp_path / "hist_ckpt")).start()
    q.awaitTermination(120)
    q.stop()
    got = current_history(spark, store)
    assert _rows(got) == _rows(batch)
