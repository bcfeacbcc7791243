"""Fixed-point PageRank (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geodiff_spark.operators.graph import SCALE, D_DEN, D_NUM, pagerank_fp


def _run(spark, n_nodes, edges, iters=8):
    e = spark.createDataFrame(edges, ["src", "dst"])
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    return {r.node: r.rank for r in pagerank_fp(e, nodes, iters=iters).collect()}


def _python_reference(n_nodes, edges, iters):
    """The same integer recurrence, straight-line Python."""
    from collections import defaultdict

    edges = sorted(set(edges))
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    r = {v: SCALE // n_nodes for v in range(n_nodes)}
    base = ((D_DEN - D_NUM) * SCALE // D_DEN) // n_nodes
    for _ in range(iters):
        m = defaultdict(int)
        for s, d in edges:
            m[d] += r[s] // outdeg[s]
        r = {v: base + (D_NUM * m.get(v, 0)) // D_DEN for v in range(n_nodes)}
    return r


def test_pagerank_matches_integer_reference(spark):
    # ring + chords + a dangling node (4 has no out-edges)
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0), (3, 2)]
    got = _run(spark, 5, edges, iters=8)
    assert got == _python_reference(5, edges, iters=8)


def test_pagerank_hub_outranks_leaves(spark):
    # star: all leaves point at the hub
    edges = [(i, 0) for i in range(1, 8)]
    got = _run(spark, 8, edges, iters=6)
    assert got[0] > max(v for k, v in got.items() if k != 0) * 3


def test_pagerank_deterministic_across_partitionings(spark):
    edges = [(i, (i * 3 + 1) % 20) for i in range(20)] + [(i, (i * 7 + 2) % 20) for i in range(20)]
    a = _run(spark, 20, edges, iters=5)
    e = spark.createDataFrame(edges, ["src", "dst"]).repartition(13)
    nodes = spark.range(20).select(F.col("id").alias("node")).repartition(3)
    b = {r.node: r.rank for r in pagerank_fp(e, nodes, iters=5).collect()}
    assert a == b  # integer sums are order/partitioning independent


def test_pagerank_random_graphs_match_reference(spark):
    import random

    rng = random.Random(7)
    for _ in range(2):
        n = 30
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
        got = _run(spark, n, edges, iters=5)
        assert got == _python_reference(n, edges, iters=5)
