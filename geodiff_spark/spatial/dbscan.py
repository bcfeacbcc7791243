"""Grid-accelerated DBSCAN over (lat, lon) points.

Density clustering is the spatial-analytics staple the reference's
ecosystem reaches for right after PIP/kNN (hotspot detection, POI
conflation, crawl-geo clustering). Classic DBSCAN is O(n²) without an
index; the distributed shape here is the standard grid variant:

  1. cell-bucket every point at a resolution whose cell side is >= eps
     scale, so all eps-neighbors of a point sit inside its k-ring;
  2. candidate pairs via ONE equi-join: the left side explodes its
     k-ring (the bounded fan-out), the right side keeps its home cell
     — each (a, b) pair arises from exactly one cell, so no pair-dedup
     shuffle is ever needed;
  3. exact squared-degree distance refine (identical f64 ops on both
     engines — the completeness of the ring cover is the radius_join
     argument, spatial/knn.py:160);
  4. core points = |N_eps(p)| >= min_pts (N includes p itself — the
     textbook definition);
  5. clusters = connected components over core–core eps-edges
     (operators/cluster.py large-star/small-star, O(log n) rounds),
     labels = MIN core id per component (deterministic,
     algorithm-independent — what the recursive-CTE oracle states);
  6. border points (non-core within eps of a core) join the MINIMUM
     neighboring core's component — the one deterministic resolution
     of DBSCAN's well-known border-tie arbitrariness, stated
     identically in the oracle. Noise points are dropped.

Scale shape: the pair join shuffles on cell (skew → AQE skew-join, or
salt hot cells via operators/skew.py); degrees and border assignment
are map-side-combinable groupBys; the CC loop is 2 shuffles/round on a
set bounded by core–core edges, with lineage truncation. Nothing is
ever O(n²) — candidate mass per point is bounded by local density in
the (2·ring+1)² covered cells.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..operators.cluster import connected_components
from .cells import cell_expr, kring_explode


def eps_pairs(
    points: DataFrame,
    *,
    eps: float,
    res: int,
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All ordered pairs (ia, ib) with squared-degree distance <= eps²,
    including the self pair (p, p). Exact (ring cover is complete)."""
    cell_h = 180.0 / (1 << res)
    ring = max(1, math.ceil(eps / cell_h))
    base = points.select(
        F.col(id_col), F.col(lat_col).alias("_lat"), F.col(lon_col).alias("_lon")
    )
    # JVM double-explode ring (cells.kring_explode): the pandas-UDF
    # k-ring this replaces was the only Python boundary in the DBSCAN
    # pipeline (ArrowEvalPython removed; guide §4.1). The double
    # explode keeps the ring codegen O(1) in ring size — a literal
    # (2r+1)²-expression array on the join's STREAMED side knocked the
    # whole join stage out of whole-stage codegen (measured 4× slower).
    left = kring_explode(
        base.withColumn("_c0", cell_expr(F.col("_lat"), F.col("_lon"), res)),
        "_c0", ring, res,
    ).select(
        F.col(id_col).alias("ia"),
        F.col("_lat").alias("alat"),
        F.col("_lon").alias("alon"),
        "cell",
    )
    right = base.select(
        F.col(id_col).alias("ib"),
        F.col("_lat").alias("blat"),
        F.col("_lon").alias("blon"),
        cell_expr(F.col("_lat"), F.col("_lon"), res).alias("cell"),
    )
    dlat = F.col("alat") - F.col("blat")
    dlon = F.col("alon") - F.col("blon")
    return (
        left.join(right, "cell")
        .withColumn("dist_sq", dlat * dlat + dlon * dlon)
        .filter(F.col("dist_sq") <= F.lit(eps) * F.lit(eps))
        .select("ia", "ib")
    )


def dbscan(
    points: DataFrame,
    *,
    eps: float,
    min_pts: int,
    res: int,
    id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """-> (id, component, is_core) for every clustered point (core or
    border); noise is dropped. component = MIN core id in the cluster;
    border ties resolve to the minimum neighboring core's component."""
    # the pair relation feeds degrees, both core-edge joins and the
    # border pass — checkpoint it so the k-ring explode join runs once,
    # not once per consumer (Catalyst doesn't dedupe common subtrees)
    pairs = eps_pairs(
        points, eps=eps, res=res, id_col=id_col, lat_col=lat_col, lon_col=lon_col
    ).localCheckpoint(eager=False)
    deg = pairs.groupBy("ia").agg(F.count(F.lit(1)).alias("n"))
    core = (
        deg.filter(F.col("n") >= min_pts)
        .select(F.col("ia").alias("cid"))
        .localCheckpoint(eager=False)
    )
    core_edges = (
        pairs.join(core.withColumnRenamed("cid", "ia"), "ia")
        .join(core.withColumnRenamed("cid", "ib"), "ib")
        .filter(F.col("ia") < F.col("ib"))
    )
    labels = connected_components(
        core_edges, "ia", "ib", nodes=core.select(F.col("cid").alias("node"))
    )
    core_out = labels.select(
        F.col("node").alias(id_col), "component", F.lit(True).alias("is_core")
    )
    border = (
        pairs.join(core.withColumnRenamed("cid", "ib"), "ib")
        .join(core.withColumnRenamed("cid", "ia"), "ia", "left_anti")
        .join(labels.withColumnRenamed("node", "ib"), "ib")
        .groupBy("ia")
        .agg(F.min("component").alias("component"))
        .select(F.col("ia").alias(id_col), "component", F.lit(False).alias("is_core"))
    )
    return core_out.unionByName(border)


def dbscan_sql(
    points_sql: str,
    *,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """DuckDB twin of :func:`dbscan`: the EXACT all-pairs formulation
    (no grid — the grid is a complete cover, so results are identical),
    components as a recursive min-label walk (same closed form as the
    dedup_clusters oracle)."""
    return f"""
    WITH RECURSIVE pts AS (
      SELECT {id_col} AS id, {lat_col} AS lat, {lon_col} AS lon FROM ({points_sql})
    ),
    pairs AS (
      SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
      ON (a.lat - b.lat) * (a.lat - b.lat)
       + (a.lon - b.lon) * (a.lon - b.lon) <= {eps} * {eps}
    ),
    deg AS (SELECT ia, count(*) AS n FROM pairs GROUP BY ia),
    core AS (SELECT ia AS id FROM deg WHERE n >= {min_pts}),
    cedges AS (
      SELECT ia AS u, ib AS v FROM pairs
      WHERE ia IN (SELECT id FROM core) AND ib IN (SELECT id FROM core)
    ),
    walk(n, lbl) AS (
      SELECT id, id FROM core
      UNION
      SELECT e.v, w.lbl FROM walk w JOIN cedges e ON e.u = w.n
    ),
    comp AS (SELECT n, min(lbl) AS component FROM walk GROUP BY n),
    border AS (
      SELECT p.ia AS id, min(c.component) AS component
      FROM pairs p
      JOIN core ON p.ib = core.id
      JOIN comp c ON c.n = p.ib
      WHERE p.ia NOT IN (SELECT id FROM core)
      GROUP BY p.ia
    )
    SELECT n AS {id_col}, component, TRUE AS is_core FROM comp
    UNION ALL
    SELECT id AS {id_col}, component, FALSE AS is_core FROM border
    """
