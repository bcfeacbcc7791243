"""Fixed-point PageRank — link-graph authority scoring (domain/page
rank is the classic web-corpus quality prior used in crawl curation).

Determinism design: PageRank in floating point is NOT reproducible
across engines (the per-node sum of contributions is order-dependent in
fp, and Spark's groupBy sum order is nondeterministic). This
implementation runs entirely in scaled int64 arithmetic:

    share(u)  = r(u) // outdeg(u)                    (int64 floor div)
    r'(v)     = base + (d_num * Σ share(u)) // d_den (int64, Σ exact)

Integer addition is commutative/associative with no rounding, so ANY
summation order gives the same result — the Spark job and the DuckDB
oracle (same recurrence unrolled as chained CTEs) agree bit-for-bit.
Rank mass from dangling nodes (outdeg 0) is dropped, the standard
simplification; ranks are therefore a lower bound on the d-damped walk
probability, scaled by SCALE.

Scale shape: each iteration is two linear shuffles (join ranks->edges
on src, groupBy dst) — the canonical iterative-join pattern; lineage is
truncated with localCheckpoint every iteration (same discipline as
operators/cluster.py connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

SCALE = 10**12
D_NUM, D_DEN = 85, 100  # damping 0.85 as an exact rational


def pagerank_fp(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    iters: int = 8,
) -> DataFrame:
    """(node, rank) after ``iters`` fixed-point iterations; rank is the
    int64 scaled score (Σ exact — see module docstring)."""
    # the node set, deduped edge list and out-degrees are loop
    # invariants consumed every round — checkpoint them (lazily) so
    # their shuffles run once, not once per iteration
    n = nodes.select(F.col(node_col)).distinct().localCheckpoint(eager=False)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # fold the out-degree onto the edge list ONCE (loop invariant): each
    # iteration then pays one join instead of two (guide §2.4 — the
    # degree join repeated per round shares no work across rounds)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_deg = e.join(outdeg, "src").localCheckpoint(eager=False)

    n_nodes = n.count()  # one scalar action; the iteration loop itself
    # runs no driver-side data collection
    init = SCALE // n_nodes
    base = ((D_DEN - D_NUM) * SCALE // D_DEN) // n_nodes

    ranks = n.withColumn("r", F.lit(init).cast("long"))
    for _ in range(iters):
        contrib = (
            e_deg.join(ranks.withColumnRenamed(node_col, "src"), "src")
            # `div` = exact int64 division (NOT `/`, which goes through
            # float and can misround large quotients)
            .select("dst", F.expr("r div deg").alias("share"))
        )
        summed = contrib.groupBy("dst").agg(F.sum("share").alias("m"))
        ranks = (
            n.join(summed.withColumnRenamed("dst", node_col), node_col, "left")
            .select(
                node_col,
                (
                    F.lit(base).cast("long")
                    + F.expr(f"({D_NUM} * coalesce(m, 0L)) div {D_DEN}")
                ).alias("r"),
            )
            # LAZY: truncates the logical plan per round while deferring
            # execution — the caller's single action walks the whole
            # round chain once, persisting each round's blocks as it
            # goes (vs one eager job per round)
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col(node_col), F.col("r").alias("rank"))


def pagerank_fp_sql(
    nodes_sql: str,
    edges_sql: str,
    iters: int = 8,
) -> str:
    """DuckDB twin: the same integer recurrence unrolled as chained
    CTEs (recursive CTEs cannot aggregate in the recursive term).
    ``nodes_sql`` must yield (node), ``edges_sql`` (src, dst)."""
    ctes = [
        f"nodes AS (SELECT DISTINCT node FROM ({nodes_sql}))",
        f"edges AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({SCALE} // n AS BIGINT) AS r FROM nodes CROSS JOIN nn)",
    ]
    base = f"(({D_DEN - D_NUM} * {SCALE} // {D_DEN}) // n)"
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS (
          SELECT nodes.node,
                 CAST({base} + ({D_NUM} * COALESCE(s.m, 0)) // {D_DEN} AS BIGINT) AS r
          FROM nodes CROSS JOIN nn
          LEFT JOIN (
            SELECT e.dst AS node, SUM(p.r // o.deg) AS m
            FROM edges e
            JOIN r{k - 1} p ON p.node = e.src
            JOIN outdeg o ON o.src = e.src
            GROUP BY e.dst
          ) s ON s.node = nodes.node
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank FROM r{iters}"
    )


def anchor_topk(
    links: DataFrame,
    k: int,
    *,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Inbound anchor-text aggregation: for every link target keep the
    top-``k`` anchor strings by inlink count (ties broken by anchor
    text ascending) plus the target's total inlink count.

    The anchor profile of a page (what OTHER pages call it) is the
    classic web-corpus signal for target-page representation and
    query-independent relevance (used by crawl curation and retrieval
    pipelines over Common-Crawl-scale link graphs).

    Scale shape: groupBy(dst, anchor) with map-side partial counts
    collapses the raw edge list (10^13 edges at CC scale) to the
    distinct-anchor relation in one shuffle; the rank and the total
    inlink count are two window ops over the SAME partition key, so
    Catalyst plans a single additional Exchange and no join — the total
    must see every distinct anchor, which is also why the rank filter
    deliberately sits ABOVE the sum (a WindowGroupLimit prune before
    the sum would corrupt totals). Output:
    (dst, anchor, n, rk, total_inlinks).
    """
    w = Window.partitionBy(dst_col)
    grouped = links.groupBy(dst_col, anchor_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    ranked = grouped.select(
        dst_col,
        anchor_col,
        "n",
        F.row_number()
        .over(w.orderBy(F.desc("n"), F.asc(anchor_col)))
        .alias("rk"),
        F.sum("n").over(w).alias("total_inlinks"),
    )
    return ranked.filter(F.col("rk") <= k)


def anchor_topk_sql(edges_sql: str, k: int) -> str:
    """DuckDB twin of :func:`anchor_topk` (``edges_sql`` yields
    (dst, anchor))."""
    return f"""
    SELECT dst, anchor, n, rk, total_inlinks FROM (
      SELECT dst, anchor, n,
             row_number() OVER (PARTITION BY dst ORDER BY n DESC, anchor) AS rk,
             CAST(SUM(n) OVER (PARTITION BY dst) AS BIGINT) AS total_inlinks
      FROM (
        SELECT dst, anchor, count(*) AS n
        FROM ({edges_sql}) GROUP BY dst, anchor
      )
    ) WHERE rk <= {k}
    """


def triangle_counts(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph
    (self-loops and duplicate/reversed edges tolerated — canonicalized
    first). The clustering-coefficient numerator: the standard web-graph
    signal for link-farm/community detection at crawl scale.

    Scale shape — degree orientation (the MapReduce-classic): orient
    every edge from its lower (degree, id) endpoint to the higher, so
    every node's OUT-degree is O(sqrt(m)) regardless of skew (a
    celebrity node's 10^8 in-links become in-edges; it emits almost no
    wedges). Wedges = one self-join of the oriented list on the source;
    each triangle is then closed by ONE semi-join probe of its single
    remaining oriented edge and counted exactly once. Shuffles: degree
    (1), wedge join (1, on the wedge pivot), closure join (1, on the
    closing edge) — no all-pairs anywhere; wedge volume is
    sum(outdeg^2) <= m^1.5.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        # e feeds the degree count (twice), the orientation join and the
        # closure probe — checkpoint it so the dedup shuffle runs once,
        # not once per consumer (Catalyst does not dedupe common
        # subtrees across joins)
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id): a -> b iff (d_a, a) < (d_b, b)
    ed = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    w1 = oriented.select(F.col("a").alias("p"), F.col("b").alias("x"))
    w2 = oriented.select(F.col("a").alias("p"), F.col("b").alias("y"))
    wedges = w1.join(w2, "p").filter(F.col("x") < F.col("y"))
    # close the wedge: the edge between x and y is oriented one fixed
    # way, but which way depends on degrees — probe both as the pair
    # (min, max) against the canonical UNDIRECTED list (one semi-join)
    tri = wedges.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_semi",
    )
    corners = (
        tri.select(F.col("p").alias("node"))
        .unionAll(tri.select(F.col("x").alias("node")))
        .unionAll(tri.select(F.col("y").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def triangle_counts_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`triangle_counts` in the canonical a<b<c
    enumeration (``edges_sql`` yields (src, dst))."""
    return f"""
    WITH e AS (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM ({edges_sql}) WHERE src <> dst
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    corners AS (
      SELECT a AS node FROM tri UNION ALL
      SELECT b FROM tri UNION ALL
      SELECT c FROM tri
    )
    SELECT node, count(*) AS n_triangles FROM corners GROUP BY node
    """


def k_core(
    edges: DataFrame,
    k: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node has degree >= k — the standard web/link-graph density
    primitive (spam-farm and community cores; the peel that remains
    after pruning the long tail). Returns (node, core_deg) with each
    surviving node's degree INSIDE the core.

    Scale shape — iterative peeling, the distributed classic: each
    round is one map-side-combining degree groupBy + one semi-join of
    the edge list against the surviving-node set (broadcast once the
    peel shrinks it; AQE decides). The edge set shrinks monotonically;
    rounds = the peel depth (O(log n) on power-law link graphs, where
    each round strips a degree shell). Per-round localCheckpoint
    truncates lineage exactly like connected_components; convergence
    is detected with one scalar count per round.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        # lazy throughout this loop: the per-round scalar count is the
        # materializing action, so each peel round is exactly one job
        .localCheckpoint(eager=False)
    )
    n_edges = e.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = (
            e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        alive = deg.filter(F.col("d") >= k).select("n")
        e2 = (
            e.join(alive.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("n", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        n2 = e2.count()
        if n2 == n_edges:
            break
        e, n_edges = e2, n2
    else:
        raise RuntimeError(f"k_core: no fixpoint in {max_iter} rounds")
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_deg"))
    )
    # at the fixpoint every remaining node has degree >= k by
    # construction; an isolated-node core is impossible for k >= 1
    return deg


def k_core_sql(edges_sql: str, k: int, unroll: int = 12) -> str:
    """DuckDB twin of :func:`k_core`, peeling unrolled ``unroll``
    rounds (like the k-means/pagerank oracle unrolls iterations —
    correct whenever the peel converges within the unroll budget, which
    the Spark side enforces via its fixpoint loop)."""
    # AS MATERIALIZED: each peel round references the previous round's
    # edge set three times — without materialization DuckDB inlines the
    # CTE chain into 3^unroll scans of the base table
    ctes = [
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u,"
        f" greatest(src, dst) AS v FROM ({edges_sql}) WHERE src <> dst)"
    ]
    for i in range(1, unroll + 1):
        p = i - 1
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT n, count(*) AS d FROM ("
            f"SELECT u AS n FROM e{p} UNION ALL SELECT v FROM e{p}) GROUP BY n)"
        )
        ctes.append(f"a{i} AS MATERIALIZED (SELECT n FROM d{i} WHERE d >= {k})")
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT u, v FROM e{p}"
            f" WHERE u IN (SELECT n FROM a{i}) AND v IN (SELECT n FROM a{i}))"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT n AS node, CAST(count(*) AS BIGINT) AS core_deg FROM ("
        + f"SELECT u AS n FROM e{unroll} UNION ALL SELECT v FROM e{unroll})"
        + " GROUP BY n"
    )


def hop_distances(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    max_hops: int = 30,
) -> DataFrame:
    """Multi-source BFS over an undirected graph: the minimum hop count
    from any source to every reachable node (crawl-frontier depth,
    seed-set distance, link-spam blast radius). Returns (node, dist)
    with dist = 0 for the sources themselves; unreachable nodes emit no
    row.

    Scale shape — frontier-expansion BFS, the distributed classic: each
    round joins the CURRENT frontier (shrinking once the wave passes
    the graph's bulk) against the edge list, anti-joins the visited
    set, and unions one new distance shell. Per-round localCheckpoint
    truncates lineage; termination is an empty frontier (one scalar
    count per round, same discipline as connected_components / k_core).
    Rounds = graph diameter, bounded by ``max_hops``; every round is
    two key shuffles (neighbor join + visited anti-join) on
    frontier-sized relations, never corpus × corpus.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    # lazy checkpoints throughout: the per-round frontier count is the
    # single materializing action (it walks adj / visited / nxt in one
    # job and persists their blocks), vs three eager jobs per hop
    adj = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = (
        sources.select(F.col(node_col).alias("n"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(adj, frontier["n"] == adj["u"])
            .select(F.col("v").alias("n"))
            .distinct()
            .join(visited.select("n"), "n", "left_anti")
            .withColumn("dist", F.lit(hop).cast("long"))
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    else:
        raise RuntimeError(f"hop_distances: frontier alive after {max_hops} hops")
    return visited.select(F.col("n").alias(node_col), "dist")


def hop_distances_sql(
    edges_sql: str,
    sources_sql: str,
    node_col: str = "node",
) -> str:
    """DuckDB twin of :func:`hop_distances`: recursive min-distance
    walk (UNION semantics dedupe (n, d) pairs; the outer MIN collapses
    longer rediscoveries — equal to BFS's first-visit distance)."""
    return f"""
    WITH RECURSIVE adj AS MATERIALIZED (
      SELECT src AS u, dst AS v FROM ({edges_sql}) WHERE src <> dst
      UNION
      SELECT dst, src FROM ({edges_sql}) WHERE src <> dst
    ),
    walk(n, d) AS (
      SELECT DISTINCT {node_col}, CAST(0 AS BIGINT) FROM ({sources_sql})
      UNION
      SELECT a.v, w.d + 1 FROM walk w JOIN adj a ON a.u = w.n
      WHERE w.d < 64
    )
    SELECT n AS {node_col}, CAST(MIN(d) AS BIGINT) AS dist
    FROM walk GROUP BY n
    """


def weighted_distances(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    node_col: str = "node",
    rounds: int = 6,
) -> DataFrame:
    """Bellman-Ford relaxation over an undirected INTEGER-weighted
    graph: the minimum path weight from any source to every node
    reachable within ``rounds`` edges (link-latency radius, weighted
    crawl-frontier cost). Returns (node, dist) — dist 0 for sources;
    nodes not reached within ``rounds`` relaxations emit no row.

    Determinism: a FIXED round count, not convergence-to-quiescence —
    after k rounds the relation is exactly "min weight over paths of
    <= k edges", a well-defined value both engines compute identically
    (integer weights: min/+ are exact, any evaluation order agrees).

    Scale shape: each round is one edge join (dist x adjacency on the
    node key) + one min-groupBy — two linear shuffles over a relation
    bounded by the reached set, the same iterative-join discipline as
    pagerank_fp; lineage truncated per round with localCheckpoint. For
    diameter-bound semantics run rounds = diameter; for a radius query
    (this operator's intended use) rounds IS the query parameter.
    """
    e = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v"),
        F.col(w_col).cast("long").alias("w"),
    ).filter(F.col("u") != F.col("v"))
    # lazy checkpoints: the caller's single action walks all `rounds`
    # relaxations in one job, persisting each round's blocks (plan
    # still truncated per round), vs one eager job per round
    adj = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
        .groupBy("u", "v").agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    dist = (
        sources.select(F.col(node_col).alias("n"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        relaxed = (
            dist.join(adj, dist["n"] == adj["u"])
            .select(F.col("v").alias("n"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("n").agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist.select(F.col("n").alias(node_col), "dist")


def weighted_distances_sql(
    edges_sql: str,
    sources_sql: str,
    node_col: str = "node",
    rounds: int = 6,
) -> str:
    """DuckDB twin of :func:`weighted_distances`: the same fixed-round
    relaxation unrolled as chained CTEs (d0 .. d{rounds})."""
    parts = [
        f"""adj AS MATERIALIZED (
      SELECT u, v, CAST(MIN(w) AS BIGINT) AS w FROM (
        SELECT src AS u, dst AS v, w FROM ({edges_sql}) WHERE src <> dst
        UNION ALL
        SELECT dst, src, w FROM ({edges_sql}) WHERE src <> dst
      ) GROUP BY u, v
    )""",
        f"""d0 AS (
      SELECT DISTINCT {node_col} AS n, CAST(0 AS BIGINT) AS dist
      FROM ({sources_sql})
    )""",
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""d{r} AS (
      SELECT n, MIN(dist) AS dist FROM (
        SELECT n, dist FROM d{r - 1}
        UNION ALL
        SELECT adj.v AS n, d{r - 1}.dist + adj.w AS dist
        FROM d{r - 1} JOIN adj ON adj.u = d{r - 1}.n
      ) GROUP BY n
    )""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT n AS {node_col}, dist FROM d{rounds}"
    )


def label_prop(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    iters: int = 4,
) -> DataFrame:
    """Synchronous label propagation (community detection) for a fixed
    number of rounds: every node starts as its own label; each round a
    node adopts the most frequent label among its neighbors, ties
    broken by the SMALLEST label. Fixed ``iters`` + deterministic
    tie-break make the result exactly reproducible (classic async LPA
    is order-dependent — useless for a graded/retried pipeline).

    Scale shape: per round, ONE edge-sized shuffle (labels joined to
    the symmetrized edge list on src — AQE broadcasts the label side
    only if it is genuinely small) and ONE (node, label) groupBy with
    map-side partials; the argmax-with-min-tie-break is a single
    ``max(struct(cnt, -label))`` aggregate, not a window. Lineage is
    truncated per round (localCheckpoint) like :func:`pagerank_fp`.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        # every round joins the same symmetrized list — checkpoint it so
        # the dedup shuffle runs once, not once per iteration
        .localCheckpoint(eager=False)
    )
    labels = (
        nodes.select(F.col(node_col).alias("n"))
        .distinct()
        .withColumn("label", F.col("n"))
    )
    for _ in range(iters):
        neigh = und.join(
            labels.select(F.col("n").alias("a"), "label"), "a"
        ).select(F.col("b").alias("n"), "label")
        pick = (
            neigh.groupBy("n", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("n")
            # max over (count, -label): most frequent, then smallest
            .agg(F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("m"))
            .select("n", (-F.col("m.nl")).alias("_new"))
        )
        labels = (
            labels.join(pick, "n", "left")
            .select("n", F.coalesce("_new", "label").alias("label"))
            # lazy: one caller action walks all rounds in a single job
            .localCheckpoint(eager=False)
        )
    return labels.select(F.col("n").alias(node_col), "label")


def label_prop_sql(
    nodes_sql: str,
    edges_sql: str,
    iters: int = 4,
) -> str:
    """DuckDB twin of :func:`label_prop`: the same synchronous rounds
    unrolled as chained CTEs, argmax via row_number (count DESC, label
    ASC). ``nodes_sql`` must yield (node), ``edges_sql`` (src, dst)."""
    ctes = [
        f"""und AS (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM ({edges_sql}) WHERE src <> dst
        UNION ALL
        SELECT dst AS a, src AS b FROM ({edges_sql}) WHERE src <> dst
      )
    )""",
        f"l0 AS (SELECT DISTINCT node AS n, node AS label FROM ({nodes_sql}))",
    ]
    for k in range(1, iters + 1):
        ctes.append(f"""p{k} AS (
      SELECT n, label FROM (
        SELECT u.b AS n, p.label, count(*) AS c,
               row_number() OVER (PARTITION BY u.b
                                  ORDER BY count(*) DESC, p.label ASC) AS rn
        FROM und u JOIN l{k - 1} p ON p.n = u.a
        GROUP BY u.b, p.label
      ) WHERE rn = 1
    )""")
        ctes.append(f"""l{k} AS (
      SELECT l.n, CAST(COALESCE(p.label, l.label) AS BIGINT) AS label
      FROM l{k - 1} l LEFT JOIN p{k} p ON p.n = l.n
    )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT n AS node, label FROM l{iters}"
    )
