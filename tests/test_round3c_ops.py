"""Round-3 batch-4 operators: Markov transitions, time-weighted
averages, and friends. Graded oracle parity lives in
test_entry_oracle.py; these isolate the edge cases sf0.01 replay can't."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from geodiff_spark.operators.temporal import markov_transitions, time_weighted_avg


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_markov_single_event_keys_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "a", 1), (2, _ts(0), "b", 2)],
        "k long, ts timestamp, st string, id long",
    )
    assert markov_transitions(df, "k", "ts", "st", "id").count() == 0


def test_markov_counts_and_exact_division(spark):
    # user 1: a->b, b->a, a->b ; user 2: a->b  => a->b:3, b->a:1
    rows = [
        (1, _ts(0), "a", 1),
        (1, _ts(1), "b", 2),
        (1, _ts(2), "a", 3),
        (1, _ts(3), "b", 4),
        (2, _ts(0), "a", 5),
        (2, _ts(1), "b", 6),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, st string, id long")
    out = {
        (r.src_state, r.dst_state): r
        for r in markov_transitions(df, "k", "ts", "st", "id", scale=100).collect()
    }
    ab, ba = out[("a", "b")], out[("b", "a")]
    assert (ab.n_trans, ab.n_from, ab.p_scaled) == (3, 3, 100)
    assert (ba.n_trans, ba.n_from, ba.p_scaled) == (1, 1, 100)


def test_markov_tiebreak_orders_equal_timestamps(spark):
    # same ts: tiebreak id orders a(1) -> b(2), never b -> a
    rows = [(1, _ts(0), "a", 1), (1, _ts(0), "b", 2)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, st string, id long")
    out = markov_transitions(df, "k", "ts", "st", "id").collect()
    assert [(r.src_state, r.dst_state) for r in out] == [("a", "b")]


def test_markov_rows_sum_to_at_most_scale(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = (
        markov_transitions(ev, "user_id", "ts", "event_type", "event_id")
        .groupBy("src_state")
        .agg(F.sum("p_scaled").alias("s"), F.max("n_from").alias("n"))
        .collect()
    )
    for r in out:
        # floor division loses < 1/scale per dst row
        assert 0 < r.s <= 1_000_000


def test_twap_drops_last_event_and_single_event_keys(spark):
    rows = [
        (1, _ts(0), 2.0, 1),
        (1, _ts(10), 4.0, 2),  # last for key 1 -> no duration
        (2, _ts(0), 9.0, 3),  # only event for key 2 -> key absent
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, id long")
    out = time_weighted_avg(df, "k", "ts", "v", "id").collect()
    assert len(out) == 1 and out[0].k == 1
    assert out[0].n_intervals == 1
    assert out[0].den_ms == 10_000
    assert out[0].num_scaled == 2000 * 10_000


def test_twap_floor_scaling_matches_negative_values(spark):
    # floor(-0.0015 * 1000) = -2 (floor, NOT truncation toward zero)
    rows = [(1, _ts(0), -0.0015, 1), (1, _ts(1), 0.0, 2)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, id long")
    out = time_weighted_avg(df, "k", "ts", "v", "id").collect()[0]
    assert out.num_scaled == -2 * 1000


def test_twap_sub_millisecond_gap_floor_division(spark):
    rows = [
        (1, _ts(0), 1.0, 1),
        (1, _ts(0) + dt.timedelta(microseconds=1500), 1.0, 2),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, id long")
    out = time_weighted_avg(df, "k", "ts", "v", "id").collect()[0]
    assert out.den_ms == 1  # 1500us DIV 1000


# --- pareto frontier / grouped OLS ----------------------------------------


def _pareto(spark, rows):
    from geodiff_spark.operators.analytics import pareto_frontier

    df = spark.createDataFrame(rows, "id long, x long, y long")
    return sorted(
        (r.id for r in pareto_frontier(df, "x", "y").collect())
    )


def test_pareto_basic_staircase(spark):
    # (3,1), (2,2), (1,3) all on frontier; (1,1), (2,1) dominated
    rows = [(1, 3, 1), (2, 2, 2), (3, 1, 3), (4, 1, 1), (5, 2, 1)]
    assert _pareto(spark, rows) == [1, 2, 3]


def test_pareto_tie_on_x_loses_to_higher_y(spark):
    # same x: only the max-y point survives (strict dominance in y)
    rows = [(1, 5, 9), (2, 5, 7)]
    assert _pareto(spark, rows) == [1]


def test_pareto_tie_on_y_loses_to_higher_x(spark):
    # equal y at greater x dominates (strict in x): id 2 dominated
    rows = [(1, 9, 4), (2, 5, 4)]
    assert _pareto(spark, rows) == [1]


def test_pareto_duplicate_points_all_kept(spark):
    # identical points do not strictly dominate each other
    rows = [(1, 5, 5), (2, 5, 5), (3, 1, 1)]
    assert _pareto(spark, rows) == [1, 2]


def test_pareto_nulls_excluded(spark):
    rows = [(1, 5, 5), (2, None, 9), (3, 9, None)]
    assert _pareto(spark, rows) == [1]


def test_pareto_matches_bruteforce_random(spark):
    import random

    rnd = random.Random(42)
    rows = [(i, rnd.randrange(30), rnd.randrange(30)) for i in range(300)]
    expect = sorted(
        i
        for i, x, y in rows
        if not any(
            ax >= x and ay >= y and (ax > x or ay > y) for _, ax, ay in rows
        )
    )
    assert _pareto(spark, rows) == expect


def test_grouped_ols_exact_sums(spark):
    from geodiff_spark.operators.analytics import grouped_ols

    rows = [("a", 1.0, 0.5), ("a", 2.0, 1.5), ("b", 3.0, -0.25)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in grouped_ols(df, "g", "x", "y", 10, 100).collect()}
    # a: xs=[10,20] ys=[50,150]
    assert (out["a"].n, out["a"].sum_x, out["a"].sum_y) == (2, 30, 200)
    assert out["a"].sum_xy == 10 * 50 + 20 * 150
    assert out["a"].sum_xx == 100 + 400
    # b: floor(-0.25*100) = -25 (floor, not truncate)
    assert out["b"].sum_y == -25


# --- bloom filter -----------------------------------------------------------


def test_bloom_no_false_negatives_and_merge_is_union(spark):
    from geodiff_spark.operators.sketch import bloom_probe, bloom_sketch

    m, k = 1 << 12, 4
    a = spark.range(0, 200).select(F.col("id").alias("key"))
    b = spark.range(200, 400).select(F.col("id").alias("key"))
    wa = bloom_sketch(a, F.col("key"), m_bits=m, k=k)
    wb = bloom_sketch(b, F.col("key"), m_bits=m, k=k)
    # merge = bit_or of the word relations == filter built on the union
    merged = (
        wa.unionByName(wb)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    direct = bloom_sketch(a.unionByName(b), F.col("key"), m_bits=m, k=k)
    assert (
        merged.exceptAll(direct).count() == 0
        and direct.exceptAll(merged).count() == 0
    )
    # every inserted key MUST probe true (no false negatives)
    probed = bloom_probe(
        a.unionByName(b), merged, F.col("key"), ["key"], m_bits=m, k=k
    )
    assert probed.filter(~F.col("maybe_present")).count() == 0


def test_bloom_misses_mostly_absent(spark):
    from geodiff_spark.operators.sketch import bloom_probe, bloom_sketch

    m, k = 1 << 14, 4
    present = spark.range(0, 500).select(F.col("id").alias("key"))
    absent = spark.range(10_000, 11_000).select(F.col("id").alias("key"))
    words = bloom_sketch(present, F.col("key"), m_bits=m, k=k)
    out = bloom_probe(absent, words, F.col("key"), ["key"], m_bits=m, k=k)
    fp = out.filter(F.col("maybe_present")).count()
    # 500 keys * 4 bits in 16384 => fill ~12%; fp rate ~ 0.12^4 ~ 2e-4
    assert fp <= 5


def test_bloom_probe_empty_filter_all_false(spark):
    from geodiff_spark.operators.sketch import bloom_probe, bloom_sketch

    empty = spark.range(0).select(F.col("id").alias("key"))
    words = bloom_sketch(empty, F.col("key"), m_bits=1 << 10, k=3)
    probes = spark.range(0, 50).select(F.col("id").alias("key"))
    out = bloom_probe(probes, words, F.col("key"), ["key"], m_bits=1 << 10, k=3)
    assert out.filter(F.col("maybe_present")).count() == 0
