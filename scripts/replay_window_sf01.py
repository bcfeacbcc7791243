#!/usr/bin/env python
"""Judge-style deep check: replay the first N (default 50 = the grading
window) registry queries at sf0.1 — a decade more data than the
driver's sf0.01 gate — and compare each against its DuckDB oracle with
order-insensitive exact-value parity. Catches anything that is
correct-at-toy-scale only (overflow, ties broken by partitioning,
collection ceilings).

Usage: python scripts/replay_window_sf01.py [N] [sf_dir]
Writes BENCH/window_replay_sf01.json and exits nonzero on any mismatch.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    return v


def _rows(pdf):
    cols = sorted(pdf.columns)
    recs = pdf[cols].itertuples(index=False, name=None)
    return sorted((tuple(map(_canon, r)) for r in recs), key=repr), cols


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import duckdb

    import __spark_entry__ as E
    from geodiff_spark.session import get_spark

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(
        "window_replay", shuffle_partitions=64,
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    qs, osql = E.queries(), E.oracle_sql()
    names = list(qs)[:n]
    report, bad = {}, []
    for name in names:
        t0 = time.perf_counter()
        try:
            got, gcols = _rows(qs[name](spark, sf_dir).toPandas())
            if name not in osql:
                report[name] = {"status": "rows_only", "spark_rows": len(got),
                                "sec": round(time.perf_counter() - t0, 2)}
                continue
            exp, ecols = _rows(con.sql(osql[name]).df())
            ok = gcols == ecols and got == exp
            report[name] = {
                "status": "match" if ok else "MISMATCH",
                "spark_rows": len(got), "oracle_rows": len(exp),
                "sec": round(time.perf_counter() - t0, 2),
            }
            if not ok:
                bad.append(name)
                if gcols != ecols:
                    report[name]["cols"] = [gcols, ecols]
                else:
                    diff = [i for i, (a, b) in enumerate(zip(got, exp))
                            if a != b][:3]
                    report[name]["first_diffs"] = [
                        {"i": i, "spark": repr(got[i])[:200],
                         "oracle": repr(exp[i])[:200]} for i in diff]
        except Exception as exc:  # noqa: BLE001 — record and continue
            report[name] = {"status": "ERROR", "err": repr(exc)[:300]}
            bad.append(name)
        print(f"{report[name].get('status'):>9}  {name}"
              f"  ({report[name].get('sec', '?')}s)", flush=True)
    out = {"sf_dir": sf_dir, "n": len(names), "mismatches": bad,
           "queries": report}
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH/window_replay_sf01.json"),
            "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{len(names) - len(bad)}/{len(names)} exact at {sf_dir};"
          f" mismatches: {bad or 'none'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
