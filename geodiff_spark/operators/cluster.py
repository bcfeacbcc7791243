"""Connected components over candidate-pair edges — the pair→cluster
stage of fuzzy deduplication (MinHash/SimHash/cosine LSH emit PAIRS;
dedup needs CLUSTERS and one survivor per cluster).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — converges in
O(log n) rounds on ANY graph shape, unlike plain min-label propagation
whose round count is the graph diameter (a pathological near-dup chain
doc1~doc2~...~docK would need K rounds). Each round is two shuffles
(a per-node min aggregation + an edge re-emit join); lineage is
truncated per round with localCheckpoint so the plan doesn't grow
unboundedly across iterations.

Scale notes (100 TB): every step is a groupBy-min or an equi-join —
partial-aggregated map-side, AQE-skew-splittable. A giant dup cluster
(the classic boilerplate page duplicated 10^6 times) becomes a star
early and its root's neighborhood min is a single aggregate, never a
materialized neighborhood list. Convergence is detected by an
(edge-count, xor-of-edge-hashes) fingerprint — two scalar aggregates per
round, no driver-side edge collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(e: DataFrame) -> DataFrame:
    """Undirected canonical form: u < v, deduped, self-loops dropped."""
    return (
        e.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"),
            F.greatest("u", "v").alias("v"),
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node n, connect every strictly-larger neighbor to
    m(n) = min(Γ(n) ∪ {n})."""
    d = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = d.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    out = (
        d.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return _canon(out)


def _small_star(e: DataFrame) -> DataFrame:
    """For each node n, connect every smaller-or-equal neighbor (and n
    itself) to m(n) = min of those neighbors."""
    # direct every edge from the larger endpoint to the smaller
    d = e.select(F.col("v").alias("u"), F.col("u").alias("v"))  # u > v
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    leaves = d.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    roots = mins.select(F.col("u"), F.col("m").alias("v"))
    return _canon(leaves.union(roots))


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node with its component id = MIN node id in the
    component (deterministic, algorithm-independent — what the DuckDB
    recursive-CTE oracle states in closed form).

    ``nodes`` (optional) adds isolated nodes (no edges) with
    component = themselves, so the output covers the whole corpus.
    Returns (node, component).
    """
    # every checkpoint here is LAZY: the per-round fingerprint aggregate
    # is the materializing action, so each round is exactly ONE job (an
    # eager checkpoint would spend a second job per round re-walking the
    # same data; block-manager per-block locking makes the multi-branch
    # consumers safe — the first task computes, the rest read the block)
    e = _canon(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=False)
    prev = _fingerprint(e)
    for _ in range(max_iter):
        # small-star consumes its input in 3 branches (mins join, leaves,
        # roots) — checkpoint the large-star relation so its join runs
        # once per round, not once per branch
        e = _small_star(
            _large_star(e).localCheckpoint(eager=False)
        ).localCheckpoint(eager=False)
        cur = _fingerprint(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # fixpoint = depth-1 stars rooted at each component's min node:
    # canonical edges are (root, leaf)
    labels = e.select(F.col("v").alias(node_col), F.col("u").alias("component")).union(
        e.select(F.col("u").alias(node_col), F.col("u").alias("component"))
    ).distinct()
    if nodes is not None:
        n = nodes.select(F.col(node_col)).distinct()
        labels = (
            n.join(labels, node_col, "left")
            .select(
                node_col,
                F.coalesce(F.col("component"), F.col(node_col)).alias("component"),
            )
        )
    return labels


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Cluster near-duplicate pairs and size each cluster:
    (id, component, csize). Survivor selection is then a filter
    (id == component keeps the min-id representative) or any per-cluster
    window the caller prefers."""
    from pyspark.sql.window import Window

    labels = connected_components(
        pairs, pair_a, pair_b,
        nodes=all_ids.select(F.col(id_col).alias("node")),
    )
    w = Window.partitionBy("component")
    return labels.select(
        F.col("node").alias(id_col),
        "component",
        F.count(F.lit(1)).over(w).cast("long").alias("csize"),
    )
