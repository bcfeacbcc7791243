"""Mergeable sketches (operators/sketch.py): cross-engine kernel parity,
estimate accuracy bounds, merge associativity, and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from geodiff_spark.operators.sketch import (
    HLL_SEED,
    M57,
    _remix57_py,
    cm_estimate,
    cm_sketch,
    cm_sketch_sql,
    hll_estimate,
    hll_merge,
    hll_sketch,
    hll_sketch_sql,
    remix57_col,
    remix57_sql,
)


def test_remix57_cross_engine(spark):
    """Spark Column == DuckDB SQL == Python reference on awkward values."""
    vals = [0, 1, 2, M57 - 1, 123456789, (1 << 56) + 7, 0x5A5A5A5A5A5A]
    seed = 0xDEADBEEF
    got = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select(remix57_col(F.col("v"), seed).alias("r"))
        .collect()
    )
    duck = duckdb.sql(
        "SELECT " + remix57_sql("v", seed) + " AS r FROM (SELECT unnest(?) AS v)",
        params=[vals],
    ).fetchall()
    py = [_remix57_py(v, seed % M57) for v in vals]
    assert [r.r for r in got] == [int(r[0]) for r in duck] == py


def _hll_exact_and_regs(spark, n, groups, p):
    df = spark.range(0, n).select(
        (F.col("id") % groups).alias("g"), (F.col("id") * 2654435761 % 899981).alias("k")
    )
    sk = hll_sketch(df, ["g"], F.col("k") % M57, p=p)
    exact = {
        r.g: r.c
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("c")).collect()
    }
    regs: dict[int, dict[int, int]] = {}
    for r in sk.collect():
        regs.setdefault(r.g, {})[r.reg] = r.max_rho
    return exact, regs


def test_hll_estimate_within_error(spark):
    """p=10 -> m=1024 -> relative error ~1.04/sqrt(m) ~ 3.3%; allow 4x."""
    exact, regs = _hll_exact_and_regs(spark, 60_000, 3, 10)
    for g, true in exact.items():
        est = hll_estimate(regs[g], 10)
        assert abs(est - true) / true < 0.13, (g, est, true)


def test_hll_small_range_linear_counting(spark):
    exact, regs = _hll_exact_and_regs(spark, 60, 2, 10)
    for g, true in exact.items():
        est = hll_estimate(regs[g], 10)
        assert abs(est - true) / true < 0.2


def test_hll_merge_equals_union_sketch(spark):
    """sketch(A) merge sketch(B) == sketch(A union B) — mergeable partial
    state is the property that makes the 1000-executor plan cheap."""
    a = spark.range(0, 4000).select(F.lit(0).alias("g"), F.col("id").alias("k"))
    b = spark.range(2000, 9000).select(F.lit(0).alias("g"), F.col("id").alias("k"))
    ska = hll_sketch(a, ["g"], F.col("k") % M57, p=8)
    skb = hll_sketch(b, ["g"], F.col("k") % M57, p=8)
    merged = {
        (r.g, r.reg): r.max_rho for r in hll_merge(ska, skb, ["g"]).collect()
    }
    direct = {
        (r.g, r.reg): r.max_rho
        for r in hll_sketch(
            a.unionByName(b), ["g"], F.col("k") % M57, p=8
        ).collect()
    }
    assert merged == direct


SF = "/root/testdata/sf0.001"


def test_hll_oracle_parity_on_documents(spark):
    sf_dir = SF
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from geodiff_spark.functions.text import fingerprint_expr, fingerprint_sql

    sk = hll_sketch(docs, ["lang"], fingerprint_expr(F.col("text")), p=6)
    got = sorted((r.lang, r.reg, r.max_rho) for r in sk.collect())
    sql = hll_sketch_sql(
        f"SELECT lang, text FROM read_parquet('{sf_dir}/documents.parquet')",
        ["lang"],
        fingerprint_sql("text"),
        p=6,
    )
    want = sorted((a, int(b), int(c)) for a, b, c in duckdb.sql(sql).fetchall())
    assert got == want


def test_cm_point_estimates_bound(spark):
    """CM estimate >= true count and <= true + eps*N for a zipf-ish feed."""
    rows = []
    for t in range(200):
        rows.extend([(f"term{t}",)] * (1 + 4000 // (t + 1)))
    df = spark.createDataFrame(rows, "tok string")
    from geodiff_spark.functions.text import fingerprint_expr

    depth, width = 4, 512
    counters = {
        (r.depth, r.col): r.cnt
        for r in cm_sketch(
            df, fingerprint_expr(F.col("tok")), depth=depth, width=width
        ).collect()
    }
    n = len(rows)
    fp = lambda s: _poly31(s)
    for t in [0, 1, 5, 50, 199]:
        true = 1 + 4000 // (t + 1)
        est = cm_estimate(counters, fp(f"term{t}"), depth=depth, width=width)
        assert est >= true
        assert est <= true + (2.0 * n / width)


def _poly31(s: str) -> int:
    h = 0
    for b in s.encode():
        h = (h * 31 + b) % M57
    return h


def test_cm_merge_is_add(spark):
    a = spark.range(0, 3000).select((F.col("id") % 97).alias("k"))
    b = spark.range(0, 5000).select((F.col("id") % 89).alias("k"))
    one = cm_sketch(a.unionByName(b), F.col("k") % M57)
    two = (
        cm_sketch(a, F.col("k") % M57)
        .unionByName(cm_sketch(b, F.col("k") % M57))
        .groupBy("depth", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, two.collect()))


def test_hll_plan_single_exchange(spark):
    """The sketch is ONE partial-agg shuffle: exactly one Exchange, and
    the aggregation is two-phase (partial + final HashAggregate)."""
    df = spark.range(0, 1000).select((F.col("id") % 4).alias("g"), F.col("id").alias("k"))
    plan = (
        hll_sketch(df, ["g"], F.col("k") % M57, p=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert plan.count("HashAggregate") >= 2, plan


# --- log-histogram quantile sketch ----------------------------------------

def test_histo_bins_cross_engine(spark):
    import duckdb
    from geodiff_spark.operators.sketch import histo_bin_col, histo_bin_sql

    vals = [0, 1, 2, 3, 7, 8, 9, 15, 16, 100, 1023, 1024, 999_999, 1 << 40]
    got = [
        r.b for r in spark.createDataFrame([(v,) for v in vals], "v long")
        .select(histo_bin_col(F.col("v")).alias("b")).collect()
    ]
    want = [
        int(r[0]) for r in duckdb.sql(
            "SELECT " + histo_bin_sql("v") + " FROM (SELECT unnest(?) AS v)",
            params=[vals],
        ).fetchall()
    ]
    assert got == want


def test_histo_quantile_relative_error(spark):
    from geodiff_spark.operators.sketch import histo_quantile, histo_sketch

    df = spark.range(1, 50_001).select(
        F.lit(0).alias("g"), ((F.col("id") * F.col("id")) % 97_841 + 1).alias("v")
    )
    sk = {r.bin: r.cnt for r in histo_sketch(df, ["g"], F.col("v")).collect()}
    import numpy as np

    vals = np.array([(i * i) % 97_841 + 1 for i in range(1, 50_001)])
    for q in (0.1, 0.5, 0.9, 0.99):
        est = histo_quantile(sk, q)
        true = float(np.quantile(vals, q, method="inverted_cdf"))
        assert abs(est - true) / true <= 0.0625 + 1e-9, (q, est, true)


def test_histo_merge_is_add(spark):
    from geodiff_spark.operators.sketch import histo_sketch

    a = spark.range(0, 3000).select(F.lit(0).alias("g"), (F.col("id") % 977).alias("v"))
    b = spark.range(0, 5000).select(F.lit(0).alias("g"), (F.col("id") % 661).alias("v"))
    one = histo_sketch(a.unionByName(b), ["g"], F.col("v"))
    two = (
        histo_sketch(a, ["g"], F.col("v"))
        .unionByName(histo_sketch(b, ["g"], F.col("v")))
        .groupBy("g", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, two.collect()))


def test_hll_stream_matches_batch(spark, tmp_path):
    """Streaming windowed registers == batch groupBy(window) registers
    on the same rows (the batch twin is the oracle)."""
    import shutil

    from geodiff_spark.operators.sketch import M57
    from geodiff_spark.streaming.sketch import hll_stream

    rows = [
        (i, f"2026-01-01 {10 + (i % 3)}:{i % 60:02d}:00", i * 37 % 211)
        for i in range(300)
    ]
    df = (
        spark.createDataFrame(rows, "eid long, ts string, user long")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("g", (F.col("eid") % 2).cast("long"))
    )
    stage, src = tmp_path / "hs_stage", tmp_path / "hs_src"
    src.mkdir()
    df.coalesce(1).write.parquet(str(stage))
    for i, f in enumerate(sorted(stage.glob("part-*.parquet"))):
        shutil.copy(f, src / f"b{i}.parquet")

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    out = hll_stream(
        stream, ["g"], F.col("user") % M57, ts_col="ts",
        window="1 hour", watermark="0 seconds", p=6,
    )
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("hll_stream_out")
        .option("checkpointLocation", str(tmp_path / "hs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    # append mode only emits CLOSED windows (watermark passed the end);
    # the last window (12:00) stays open with availableNow — compare the
    # closed ones against the batch twin
    import datetime

    cutoff = datetime.datetime(2026, 1, 1, 12, 0)
    got = sorted(
        (r["window"]["start"], r.g, r.reg, r.max_rho)
        for r in spark.sql("select * from hll_stream_out").collect()
        if r["window"]["start"] < cutoff
    )
    batch = (
        hll_sketch(
            df.withColumn("window", F.window("ts", "1 hour")),
            ["window", "g"],
            F.col("user") % M57,
            p=6,
        )
        .collect()
    )
    want = sorted(
        (r["window"]["start"], r.g, r.reg, r.max_rho)
        for r in batch
        if r["window"]["start"] < cutoff
    )
    assert got == want and len(got) > 0
