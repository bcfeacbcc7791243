"""Integer-exact k-means (operators/kmeans.py): convergence on separable
clusters, deterministic tie-break, empty-cluster carry-forward, and the
DuckDB oracle twin on adversarial inputs (negative components, exact
midpoints)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from geodiff_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_oracle_sql,
)


def _df(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<float>",
    )


def test_separable_clusters(spark):
    rows = [
        (0, [0.0, 0.0]), (1, [0.01, 0.0]), (2, [0.0, 0.01]),
        (3, [1.0, 1.0]), (4, [0.99, 1.0]), (5, [1.0, 0.99]),
    ]
    out = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(_df(spark, rows, 2), k=2, iters=2).collect()
    }
    # seeds are ids 0 and 1 (both in the low cluster); after the update
    # the two centroids separate and the far group lands together
    assert out[3] == out[4] == out[5]
    assert out[0] == out[2]
    assert out[0] != out[3]


def test_tie_breaks_to_smaller_cluster_id(spark):
    # two identical seed points -> identical centroids; every vector is
    # equidistant to both, so with no update pass every row must pick
    # cid 0 (struct array_min ties break on the second field)
    rows = [(0, [0.5, 0.5]), (1, [0.5, 0.5]), (2, [0.25, 0.75])]
    out = kmeans_assign(_df(spark, rows, 2), k=2, iters=0).collect()
    assert {r["cluster"] for r in out} == {0}


def test_oracle_twin_bit_exact(spark):
    # adversarial: negative components, a point exactly between the two
    # seeds (integer distance tie), and a lopsided cluster
    rows = [
        (0, [-0.5, 0.25]), (1, [0.5, -0.25]), (2, [0.0, 0.0]),
        (3, [-0.4, 0.3]), (4, [-0.45, 0.2]), (5, [-0.55, 0.31]),
    ]
    got = sorted(
        (r["vec_id"], r["cluster"], r["dist_scaled"])
        for r in kmeans_assign(_df(spark, rows, 2), k=2, iters=3).collect()
    )
    con = duckdb.connect()
    con.register(
        "emb",
        pd.DataFrame(
            {"vec_id": [i for i, _ in rows],
             "embedding": [v for _, v in rows]}
        ),
    )
    sql = kmeans_oracle_sql(
        "SELECT vec_id, embedding FROM emb", k=2, iters=3, dim=2
    )
    exp = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == exp


def test_empty_cluster_carries_forward(spark):
    # k=3 over two tight groups: one seed centroid captures nothing
    # after iteration 1 and must keep its coordinates (both engines)
    rows = [
        (0, [0.0, 0.0]), (1, [0.001, 0.0]), (2, [0.002, 0.0]),
        (3, [1.0, 1.0]), (4, [1.0, 0.999]),
    ]
    got = sorted(
        (r["vec_id"], r["cluster"], r["dist_scaled"])
        for r in kmeans_assign(_df(spark, rows, 2), k=3, iters=2).collect()
    )
    con = duckdb.connect()
    con.register(
        "emb",
        pd.DataFrame(
            {"vec_id": [i for i, _ in rows],
             "embedding": [v for _, v in rows]}
        ),
    )
    exp = sorted(map(tuple, con.sql(kmeans_oracle_sql(
        "SELECT vec_id, embedding FROM emb", k=3, iters=2, dim=2
    )).fetchall()))
    assert got == exp
    assert len({c for _, c, _ in got}) >= 2


def test_k_bounds():
    with pytest.raises(ValueError):
        kmeans_oracle_sql("SELECT 1", k=0)  # type: ignore[call-arg]


def test_centroids_match_oracle_and_bound(spark):
    from geodiff_spark.operators.kmeans import (
        kmeans_centroids,
        kmeans_centroids_sql,
    )

    rows = [
        (0, [0.0, 0.0]), (1, [0.01, 0.0]), (2, [0.0, 0.01]),
        (3, [1.0, 1.0]), (4, [0.99, 1.0]), (5, [-1.0, 0.99]),
    ]
    cdf = kmeans_centroids(_df(spark, rows, 2), k=3, iters=2)
    got = sorted((r["cid"], tuple(r["centroid"])) for r in cdf.collect())
    assert len(got) == 3  # exactly k rows: the broadcast side is O(k)
    con = duckdb.connect()
    con.register(
        "emb",
        pd.DataFrame(
            {"vec_id": [i for i, _ in rows],
             "embedding": [v for _, v in rows]}
        ),
    )
    exp = sorted(
        (cid, tuple(c))
        for cid, c in con.sql(kmeans_centroids_sql(
            "SELECT vec_id, embedding FROM emb", k=3, iters=2, dim=2
        )).fetchall()
    )
    assert got == exp  # bit-exact doubles, not approx


def test_ivf_search_with_stride_centroids_equals_ann_ivf(spark):
    from pyspark.sql import functions as F

    from geodiff_spark.operators.similarity import ann_ivf, ann_ivf_search

    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(4)])
         for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    qs = vecs.filter("vec_id < 2").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    a = ann_ivf(vecs, qs, k=5, centroid_step=8, nprobe=2)
    b = ann_ivf_search(
        vecs, qs, vecs.filter("vec_id % 8 = 0"), k=5, nprobe=2
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
