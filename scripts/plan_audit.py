#!/usr/bin/env python
"""Physical-plan audit over the ENTIRE graded registry: build every
queries() entry at a small sf and scan its executed plan for the
anti-patterns that do not survive 100 TB:

  * row-at-a-time Python (BatchEvalPython) — only Arrow paths allowed;
  * CartesianProduct / BroadcastNestedLoopJoin — no all-pairs joins;
  * "Moving all data to a single partition" global windows: a
    WindowExec with an empty partition spec renders as
    ``Window [funcs], [orderSpec]`` (two top-level bracket groups, the
    last carrying ASC/DESC) vs three groups when partitioned and two
    sort-token-free groups when partition-only — flagged from the plan
    text, with an explicit allowlist for windows whose input is
    provably bounded (post-aggregation key lists, boundary rows).

Some queries intentionally collect bounded state while BUILDING the
plan (k-means/PQ/BPE training syncs); the audit budget-times each build
but never executes the final frame. Writes BENCH/plan_audit.json:
per-query node counts + a violations list (expected: empty).

Run: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
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
    "hot_keys",         # crossJoin with the 1-row grand-total aggregate
}

# Queries whose plan legitimately contains a GLOBAL (no-partitionBy)
# window: the window's input is bounded by construction — it sits above
# an aggregation whose key cardinality is small and sf-independent, or
# above an already-truncated top-k — so "move all rows to one
# partition" is O(keys), not O(data). New global windows fail loudly.
ALLOW_GLOBAL_WINDOW: set[str] = {
    "hot_keys",           # rank over per-key aggregate (|keys| rows)
    "range_assign",       # order-statistic boundary rows (k rows)
    "bottomk_quantiles",  # rank/count over the already-truncated
                          # bottom-k sample (k rows by construction)
    "compaction_plan",    # cumsum over file-bucket keys (|files| rows,
                          # a metadata relation, never row data)
}

# The two-phase range-partitioned cumsum (corpus.global_cumsum, the
# rebase allocator, pareto_frontier) carries ONE intentionally-global
# window: the per-partition offset fold, whose input is exactly
# #partitions rows and whose sole order key is the synthetic _pid
# column — recognize that structurally instead of allowlisting every
# caller, so a REAL global window added to those queries still flags.
_PID_ONLY = re.compile(r"^\[_pid#\d+[A-Za-z]* (ASC|DESC) NULLS \w+\]$")


def _global_windows(plan: str) -> int:
    """Count Window nodes with an empty partition spec. WindowExec
    renders ``Window [funcs], [partSpec], [orderSpec]``; with no
    partitioning the middle group is absent, leaving two top-level
    groups whose LAST carries sort directions (or, for an unordered
    global frame, a single group). Partition-only windows also have
    two groups but no ASC/DESC in the last one. _pid-ordered offset
    folds (two-phase cumsum, bounded at #partitions rows) are exempt."""
    hits = 0
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ").strip()
        if not s.startswith("Window ") or s.startswith("WindowGroupLimit"):
            continue
        groups, depth, cur = [], 0, ""
        for ch in s[len("Window "):]:
            if ch == "[":
                depth += 1
            if depth:
                cur += ch
            if ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur)
                    cur = ""
        is_global = len(groups) == 1 or (
            len(groups) == 2 and (" ASC" in groups[-1] or " DESC" in groups[-1])
        )
        if is_global and not (len(groups) == 2 and _PID_ONLY.match(groups[-1])):
            hits += 1
    return hits


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
            "global_windows": _global_windows(plan),
            "build_sec": round(time.perf_counter() - t0, 2),
        }
        report[name] = row
        if row["row_python"]:
            violations.append({"query": name, "kind": "row_python"})
        if row["cartesian"]:
            violations.append({"query": name, "kind": "cartesian"})
        if row["bnlj"] and name not in ALLOW_BNLJ:
            violations.append({"query": name, "kind": "bnlj"})
        if row["global_windows"] and name not in ALLOW_GLOBAL_WINDOW:
            violations.append({"query": name, "kind": "global_window"})
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
