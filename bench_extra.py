#!/usr/bin/env python
"""Targeted per-query benchmark + plan capture (guide §1.4 noop-sink
isolation). NOT part of the driver contract — bench.py stays the frozen
measured artifact; this file exists so optimization work can time a
handful of queries in seconds instead of re-running the whole suite.

Usage:
    python bench_extra.py [--trials N] [--plans TAG] [--sf DIR] q1 q2 ...

For every named query: warm up once, run best-of-N with the noop sink
(identical methodology to bench.py: perf_counter around a noop write),
and print one JSON line {"queries": {name: best_sec}, "trials": {...}}.
With --plans TAG, also write plans/r06/<name>_<TAG>.txt containing
explain("formatted").
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    trials = 3
    plans_tag = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--trials":
            trials = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_tag = args[i + 1]; i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    from geodiff_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench_extra", cores=cpus, shuffle_partitions=max(2 * int(cpus), 16),
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )

    import __spark_entry__ as E

    qs = E.queries()
    bad = [n for n in names if n not in qs]
    if bad:
        sys.exit(f"unknown queries: {bad}")

    # warmup: codegen/JIT caches, python worker pool (same as bench.py)
    for w in ("diff_changeset", "cell_assign", "text_features"):
        qs[w](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    best: dict[str, float] = {}
    all_t: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        best[name] = min(ts)
        all_t[name] = ts
        spark.sparkContext.setJobDescription(None)
    if plans_tag:
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            with open(f"plans/r06/{name}_{plans_tag}.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
    print(json.dumps({"sf_dir": sf_dir, "queries": best, "trials": all_t}))
    spark.stop()


if __name__ == "__main__":
    main()
