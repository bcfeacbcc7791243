"""Connected components (operators/cluster.py) vs a brute-force
union-find, over adversarial graph shapes — chains (diameter = n, the
case plain label propagation can't do in O(log n) rounds), stars,
forests, dense blobs, isolated nodes."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from geodiff_spark.operators.cluster import connected_components, dedup_clusters


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node in component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


def _run(spark, n_nodes, edges):
    e = spark.createDataFrame(edges or [(0, 0)], ["a", "b"])
    if not edges:
        e = e.filter("a != a")  # empty frame with schema
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    got = connected_components(e, "a", "b", nodes=nodes)
    return {r.node: r.component for r in got.collect()}


CASES = [
    ("chain", 12, [(i, i + 1) for i in range(11)]),
    ("two_chains", 10, [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7)]),
    ("star_high_root", 8, [(7, i) for i in range(7)]),
    ("triangle_plus_isolated", 6, [(0, 1), (1, 2), (2, 0)]),
    ("duplicate_and_reversed_edges", 5, [(1, 0), (0, 1), (1, 2), (2, 1)]),
    ("all_isolated", 5, []),
]


@pytest.mark.parametrize("name,n,edges", CASES, ids=[c[0] for c in CASES])
def test_cc_matches_union_find(spark, name, n, edges):
    assert _run(spark, n, edges) == _uf_components(n, edges)


def test_cc_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        edges = [(a, b) for a, b in edges if a != b]
        assert _run(spark, n, edges) == _uf_components(n, edges)


def test_dedup_clusters_sizes_and_survivors(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], ["vid"])
    got = {r.vid: (r.component, r.csize) for r in
           dedup_clusters(pairs, ids, "vid").collect()}
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 2), 11: (10, 2),
        99: (99, 1),
    }
    # survivor = representative filter
    survivors = sorted(v for v, (c, _) in got.items() if v == c)
    assert survivors == [1, 10, 99]
