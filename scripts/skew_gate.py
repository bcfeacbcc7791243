#!/usr/bin/env python
"""Skew gate: measure the naive window aggregate vs the salted
two-phase plan on the SAME Zipf-skewed input (north rule: "explicit
salted-key skew mitigation" — this is the claim under actual skew).

Input: N rows (default 20M) where one mega-key holds ~30% of rows and
the rest spread over 997 keys — the same key recurrence as the graded
`skew_zipf` registry query. Both plans compute per-row per-key totals:

  naive   SUM/COUNT OVER (PARTITION BY hot_key)   — window aggregates
          cannot map-side combine, so the mega-key's ~0.3*N rows sort
          in ONE task;
  salted  operators/skew.salted_window_totals     — 16-salt two-phase
          aggregation + broadcast join back.

Writes BENCH/skew_gate.json and appends an annex row to
BENCH/BASELINE.md. Run: python scripts/skew_gate.py [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from geodiff_spark.operators.skew import salted_window_totals
    from geodiff_spark.session import get_spark

    spark = get_spark(
        "skew_gate", cores=32, shuffle_partitions=64,
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    df = (
        spark.range(n, numPartitions=64)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 100003).alias("user_id"),
            F.when(F.col("id") % 10 < 3, F.lit(777777))
            .otherwise((F.col("id") * 2654435761) % 997)
            .cast("long")
            .alias("hot_key"),
        )
        .cache()
    )
    df.count()  # materialize: both plans read the same cached input

    def naive():
        w = Window.partitionBy("hot_key")
        return df.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("key_n"),
            F.sum("user_id").over(w).alias("key_user_sum"),
        )

    def salted():
        return salted_window_totals(
            df, ["hot_key"],
            [F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("us")],
            [F.sum("n").alias("key_n"), F.sum("us").alias("key_user_sum")],
        ).select("event_id", "key_n", "key_user_sum")

    # correctness first: both plans agree on a sample-checkable aggregate
    a = naive().agg(F.sum("key_n"), F.sum("key_user_sum")).collect()[0]
    b = salted().agg(F.sum("key_n"), F.sum("key_user_sum")).collect()[0]
    assert list(a) == list(b), (a, b)

    def clock(fn) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    t_salted = clock(salted)
    t_naive = clock(naive)
    rep = {
        "n_rows": n,
        "mega_key_frac": 0.3,
        "naive_window_sec": round(t_naive, 2),
        "salted_two_phase_sec": round(t_salted, 2),
        "speedup": round(t_naive / t_salted, 2),
        "note": (
            "best-of-3 on the same cached input; naive = "
            "agg OVER (PARTITION BY hot_key), salted = "
            "operators/skew.salted_window_totals (16 salts + broadcast)"
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/skew_gate.json", "w") as f:
        json.dump(rep, f, indent=2)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Skew gate (auto-appended, {n:,} rows, mega-key 30%)\n\n"
            f"naive window {t_naive:.2f}s vs salted two-phase "
            f"{t_salted:.2f}s -> **{t_naive / t_salted:.2f}x** "
            "(BENCH/skew_gate.json; same cached input, best-of-3, "
            "equality of totals asserted before timing).\n"
        )
    print(json.dumps(rep))
    spark.stop()


if __name__ == "__main__":
    main()
