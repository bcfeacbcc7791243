"""Salted skew operators: correctness vs unsalted equivalents, and the
partial stage really fans the hot key out across salts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodiff_spark.operators.skew import (
    explode_salts,
    salted_agg,
    salted_cell_counts,
    salted_join,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key 0: 50k rows; 100 cold keys: 10 rows each
    hot = spark.range(50_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(1_000).select(
        (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold).cache()


def test_salted_agg_matches_plain(spark, skewed):
    got = {
        r["k"]: (r["n"], r["s"])
        for r in salted_agg(
            skewed, ["k"],
            [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
            [F.sum("n").alias("n"), F.sum("s").alias("s")],
        ).collect()
    }
    exp = {
        r["k"]: (r["n"], r["s"])
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == exp


def test_partial_stage_spreads_hot_key(spark, skewed):
    partial = (
        with_salt(skewed, 16)
        .groupBy("k", "_salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("k") == 0)
        .collect()
    )
    assert len(partial) > 8  # the hot key landed on many salts
    assert max(r["n"] for r in partial) < 50_000 * 0.25  # no salt holds it all


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(101)], "k long, name string"
    )
    got = salted_join(skewed, dim, ["k"]).groupBy("k", "name").count()
    exp = skewed.join(dim, "k").groupBy("k", "name").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_explode_salts_cardinality(spark):
    df = spark.range(10)
    assert explode_salts(df, 7).count() == 70


def test_salted_cell_counts(spark):
    import pandas as pd
    import numpy as np

    pdf = pd.DataFrame(
        {
            "lat": np.concatenate([np.full(5000, 48.2), np.linspace(-80, 80, 100)]),
            "lon": np.concatenate([np.full(5000, 16.4), np.linspace(-170, 170, 100)]),
        }
    )
    pages = spark.createDataFrame(pdf)
    out = {r["cell"]: r["n"] for r in salted_cell_counts(pages, res=8).collect()}
    assert max(out.values()) == 5000  # the hot city cell
    assert sum(out.values()) == 5100
