"""Physical-plan quality gates (the task brief's explain() discipline):
filters push to the parquet scan, small sides broadcast, hot paths stay
in WholeStageCodegen, the kNN point side never fans out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_diff_scan_prunes_columns(spark):
    """The diff only reads the 4 modeled columns, not the full orders
    schema (column pruning through the snapshot derivation)."""
    plan = plan_of(E.q_diff_changeset(spark, SF))
    assert "o_orderdate" not in plan  # unused column pruned from scan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scans and all("o_orderkey" in s for s in scans)


def test_filter_pushdown_lineitem(spark):
    plan = plan_of(E.q_lineitem_pricing(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_pip_broadcasts_polygons(spark):
    plan = plan_of(E.q_pip(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the big customer side must NOT be the broadcast side
    assert plan.count("BroadcastExchange") == 1


def test_knn_broadcasts_queries_not_points(spark):
    plan = plan_of(E.q_knn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastExchange") == 1
    # Spark 4 pushes the row_number<=k limit into the shuffle (partial+final)
    assert plan.count("WindowGroupLimit") == 2
    # the k-ring explode fans out the QUERY side (its row carries qlat),
    # never the big point side
    gen_line = [l for l in plan.splitlines() if "Generate explode" in l]
    assert gen_line and "qlat" in gen_line[0]


def test_diff_whole_stage_codegen(spark):
    """Mask/when projection logic compiles into codegen stages (no
    interpreted projection, no Python in the hot path). AQE only shows
    codegen annotations on the FINAL plan, so execute first."""
    import re

    df = E.q_diff_changeset(spark, SF)
    df.collect()  # count() would plan a separate query; collect finalizes THIS one
    plan = plan_of(df)
    assert "isFinalPlan=true" in plan
    # '*(N)' = whole-stage-codegen stage markers; the mask Project, the
    # change Filter and the SMJ itself must all carry one
    for op in ("Project", "Filter", "SortMergeJoin"):
        assert re.search(rf"\*\(\d+\) {op}", plan), op
    assert "ArrowEvalPython" not in plan  # pure-JVM pipeline


def test_ann_bruteforce_broadcasts_queries(spark):
    plan = plan_of(E.q_ann_bruteforce(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("BroadcastExchange") == 1


def test_ann_ivf_broadcasts_small_sides_only(spark):
    """IVF: centroids (vector-assign) and probes (candidate join) are the
    broadcast sides; the vector table itself is never broadcast and never
    cartesian-joined unboundedly."""
    plan = plan_of(E.q_ann_ivf(spark, SF))
    # centroid assignment (x2: lists + probes) is a broadcast NLJ against
    # the tiny centroid set; candidate join broadcasts the probed queries
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2
    assert "BroadcastHashJoin" in plan  # cluster-id candidate join


def test_minhash_band_join_no_cartesian(spark):
    """The band join is a hash/sort-merge equi-join on (band, bucket,
    slice) — never a cartesian/NLJ (slice equality is usable as an
    equi-key)."""
    plan = plan_of(E.q_minhash_lsh(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan)


def test_rebase_plan_no_cartesian_no_python_join(spark):
    """The distributed allocator folds into the lazy plan: equi-joins
    only, windows over the collision set, no cartesian blowup."""
    df = E.q_rebase_conflicts(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan


def test_curation_pipeline_plan_shape(spark):
    """The composed pipeline keeps its stage-level physical properties:
    benchmark grams broadcast, per-domain cap as WindowGroupLimit, no
    cartesian product anywhere."""
    import __spark_entry__ as E

    df = E.q_curation_pipeline(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_topk_delta_broadcasts_changeset_sides(spark):
    """IVM top-k refresh: the changeset-derived sides (update patch,
    touched groups, removed PKs) broadcast — the base snapshot is never
    shuffled for the join — and the top-k is a WindowGroupLimit."""
    plan = plan_of(E.q_topk_delta(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_record_linkage_single_block_key_join(spark):
    """Blocked linkage: candidates come from ONE equi-join on the
    blocking key — never a cartesian expansion."""
    plan = plan_of(E.q_record_linkage(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)


def test_gap_fill_no_join(spark):
    """Gap-fill is union+window — the LOCF never materializes as a
    range join or cartesian product."""
    plan = plan_of(E.q_gap_fill(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
