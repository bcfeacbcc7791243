#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], print ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "pages_diff_rows_per_sec": ..., }

--scaling: additionally run the fixed pages-diff+spatial workload in two
fresh subprocesses at local[8] and local[32] (the sandbox stand-in for
N vs 4N executors) and write BENCH/BASELINE.md with throughput at both
levels + scaling efficiency.

--scaling-worker N: internal — run the scaling workload on local[N] and
print {"cores": N, "rows": R, "seconds": S}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_from_dir(d: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def scaling_workload(spark, n_pages: int) -> int:
    """Fixed workload: synth pages v1/v2 -> diff -> spatial rollup of the
    changeset per coarse cell. Returns rows processed (both snapshots)."""
    from pyspark.sql import functions as F

    from geodiff_spark.changeset import TableInfo
    from geodiff_spark.operators.diff import diff_table
    from geodiff_spark.sources.pages import pages_snapshot
    from geodiff_spark.spatial.cells import cell_expr

    info = TableInfo(
        name="pages",
        columns=("url", "warc_ts", "html", "text", "lang", "lat", "lon"),
        pk=("url",),
        timestamp_cols=("warc_ts",),
    )
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    v1 = pages_snapshot(spark, n_pages, version=1, partitions=parts)
    v2 = pages_snapshot(spark, n_pages, version=2, partitions=parts)
    cs = diff_table(v1, v2, info)
    out = (
        cs.df.withColumn(
            "cell",
            cell_expr(
                F.coalesce("old_lat", "new_lat"), F.coalesce("old_lon", "new_lon"), 4
            ),
        )
        .groupBy("cell", "op")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out.write.format("noop").mode("overwrite").save()
    return 2 * n_pages + int(n_pages * 0.1)


def run_scaling_worker(cores: int, n_pages: int) -> None:
    from geodiff_spark.session import get_spark

    spark = get_spark(
        f"bench_scaling_{cores}", cores=cores, shuffle_partitions=max(2 * cores, 16)
    )
    # warmup: JIT + Arrow path, small
    scaling_workload(spark, 20_000)
    t0 = time.perf_counter()
    rows = scaling_workload(spark, n_pages)
    dt = time.perf_counter() - t0
    print(json.dumps({"cores": cores, "rows": rows, "seconds": dt}))
    spark.stop()


def run_scaling(n_pages: int) -> dict:
    results = {}
    for cores in (8, 32):
        env = dict(os.environ)
        env.pop("SPARK_MASTER", None)
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-worker", str(cores), str(n_pages)],
            capture_output=True, text=True, env=env, check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    thr8 = results[8]["rows"] / results[8]["seconds"]
    thr32 = results[32]["rows"] / results[32]["seconds"]
    eff = (thr32 / thr8) / 4.0
    report = {
        "n_pages": n_pages,
        "throughput_rows_per_sec": {"local[8]": thr8, "local[32]": thr32},
        "seconds": {"local[8]": results[8]["seconds"], "local[32]": results[32]["seconds"]},
        "scaling_efficiency_8_to_32": eff,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — measured baseline\n\n"
            "Workload: synth pages v1/v2 ("
            f"{n_pages} rows + 10% inserts) → full-outer diff → per-cell "
            "changeset rollup (the BASELINE.json headline shape: spatial-join"
            " + changeset-diff).\n\n"
            "| parallelism | seconds | rows/sec |\n|---|---|---|\n"
            f"| local[8]  | {results[8]['seconds']:.2f} | {thr8:,.0f} |\n"
            f"| local[32] | {results[32]['seconds']:.2f} | {thr32:,.0f} |\n\n"
            f"**Scaling efficiency (8→32 threads, /4): {eff:.3f}** "
            f"(target ≥ 0.8 per BASELINE.json north_rule; sandbox substitution "
            "for N vs 4N executors per the task brief).\n\n"
            "Confs: AQE on (coalesce+skewJoin), Arrow batches 10k, shuffle "
            "partitions = 2×cores, broadcast threshold 64 MB.\n"
        )
    return report


def run_suite() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from geodiff_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(2 * int(cpus), 16))

    import __spark_entry__ as E

    headline = [
        "diff_changeset", "diff_summary", "apply_roundtrip", "invert_roundtrip",
        "concat_apply", "rebase_final", "cell_assign", "cell_rollup", "pip",
        "knn", "raster", "text_features", "dedup_exact", "ngram_jaccard",
        "minhash_lsh", "simhash", "ann_bruteforce", "cosine_dups_lsh",
        "events_hourly", "lineitem_pricing",
    ]
    qs = E.queries()
    times: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    # pages diff throughput (the BASELINE.json headline metric)
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES_N", "200000"))
    t0 = time.perf_counter()
    rows = scaling_workload(spark, n_pages)
    dt = time.perf_counter() - t0
    times["pages_diff_rollup"] = round(dt, 3)

    result = {
        "metric": "spatial-join + changeset-diff suite wall time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": _sf_from_dir(sf_dir),
        "pages_diff_rows": rows,
        "pages_diff_rows_per_sec": round(rows / dt, 1),
    }
    if "--scaling" in sys.argv:
        result["scaling"] = run_scaling(
            int(os.environ.get("SPARK_GRAFT_SCALE_N", "400000"))
        )
    print(json.dumps(result))


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        i = sys.argv.index("--scaling-worker")
        run_scaling_worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    else:
        run_suite()
