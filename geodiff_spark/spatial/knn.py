"""kNN via k-ring cell expansion + windowed local top-k.

Plan shape (SURVEY.md §2.3 extension row):

    queries --JVM k-ring--> explode(cells)      (|Q| × (2k+1)^2 rows)
    points  --cell------->                      (encoded once)
          equi-join on cell                     (broadcast Q side when
                                                 small; SMJ at scale)
          -> squared-degree distance            (pure arithmetic: bit-
                                                 reproducible everywhere)
          -> row_number() over (qid, dist, pk) <= k

Distance is squared equirectangular degrees — deterministic tie order
via (dist, point pk). The result is exact *within the searched ring*;
``ring`` must be chosen so the true k neighbors fall inside it (callers
can iterate with growing ring; the per-query found-count makes misses
detectable). Skew note: a hot query cell duplicates only the QUERY side
(small); the big point side never fans out.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cells import cell_expr, kring_explode


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    res: int,
    ring: int = 1,
    query_id_col: str = "qid",
    point_id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    q_lat_col: str = "qlat",
    q_lon_col: str = "qlon",
    broadcast_queries: bool = True,
) -> DataFrame:
    """-> (qid, <point id>, dist_sq, rank) with rank ∈ [1, k]."""
    q = kring_explode(
        queries.withColumn(
            "_qcell", cell_expr(F.col(q_lat_col), F.col(q_lon_col), res)
        ),
        "_qcell", ring, res,
    )
    if broadcast_queries:
        q = F.broadcast(q)

    p = points.withColumn("cell", cell_expr(F.col(lat_col), F.col(lon_col), res))

    cand = p.join(q, "cell", "inner")
    dlat = F.col(lat_col) - F.col(q_lat_col)
    dlon = F.col(lon_col) - F.col(q_lon_col)
    cand = cand.withColumn("dist_sq", dlat * dlat + dlon * dlon)

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist_sq").asc(), F.col(point_id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, point_id_col, "dist_sq", "rank")
    )


def knn_join_exact(
    points: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    res: int,
    max_ring: int = 8,
    query_id_col: str = "qid",
    point_id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    q_lat_col: str = "qlat",
    q_lon_col: str = "qlon",
) -> DataFrame:
    """EXACT kNN by adaptive ring expansion.

    Correctness bound: every point outside the k-ring of radius r is at
    least r·cell_h degrees away (cell_h = 180/2^res, the smaller cell
    side; worst case puts the query on its cell edge). So a query is
    *settled* once it has k candidates whose k-th distance satisfies
    dist_sq <= (r·cell_h)^2. Unsettled queries re-run with r doubled
    (driver loop over a shrinking, broadcast-sized query set — at most
    log2(max_ring)+1 rounds); stragglers past max_ring fall back to the
    brute-force scan, which is exact by construction.
    """
    cell_h = 180.0 / (1 << res)
    remaining = queries.select(query_id_col, q_lat_col, q_lon_col)
    settled: list[DataFrame] = []
    ring = 1
    while ring <= max_ring:
        got = knn_join(
            points,
            remaining,
            k=k,
            res=res,
            ring=ring,
            query_id_col=query_id_col,
            point_id_col=point_id_col,
            lat_col=lat_col,
            lon_col=lon_col,
            q_lat_col=q_lat_col,
            q_lon_col=q_lon_col,
        ).persist()
        bound = (ring * cell_h) ** 2
        stats = got.groupBy(query_id_col).agg(
            F.count(F.lit(1)).alias("_n"), F.max("dist_sq").alias("_maxd")
        )
        ok_ids = stats.filter(
            (F.col("_n") == k) & (F.col("_maxd") <= F.lit(bound))
        ).select(query_id_col)
        settled.append(got.join(F.broadcast(ok_ids), query_id_col, "left_semi"))
        remaining = remaining.join(F.broadcast(ok_ids), query_id_col, "left_anti")
        if remaining.isEmpty():
            remaining = None
            break
        ring *= 2
    if remaining is not None and not remaining.isEmpty():
        # brute force the stragglers (sparse regions): exact top-k over
        # the full point set for a broadcast-sized query remainder
        q = F.broadcast(remaining)
        cand = points.select(point_id_col, lat_col, lon_col).crossJoin(q)
        dlat = F.col(lat_col) - F.col(q_lat_col)
        dlon = F.col(lon_col) - F.col(q_lon_col)
        cand = cand.withColumn("dist_sq", dlat * dlat + dlon * dlon)
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("dist_sq").asc(), F.col(point_id_col).asc()
        )
        settled.append(
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, point_id_col, "dist_sq", "rank")
        )
    return functools.reduce(DataFrame.unionByName, settled)


def radius_join(
    points: DataFrame,
    queries: DataFrame,
    *,
    radius: float,
    res: int,
    query_id_col: str = "qid",
    point_id_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    q_lat_col: str = "qlat",
    q_lon_col: str = "qlon",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Within-distance join: all points with squared-degree distance
    <= radius^2 of each query (closed ball), EXACT.

    Ring cover bound: any point within ``radius`` differs from the
    query's cell by at most ceil(radius / cell_h) cells per axis
    (cell_h = 180/2^res is the smaller cell side; lon cells are 2x
    wider, so the same ring over-covers x). The k-ring handles lon
    wrap; lat clamping at the poles only moves cells inward, never out
    of cover. So cell-equi join + exact distance refine loses nothing.

    Scale shape: the query side fans out (2*ring+1)^2 — broadcast when
    small, shuffle-join on cell otherwise; the big point side is
    encoded once and never duplicated. Hot cells split via AQE skew
    join; candidate mass per query is bounded by local point density
    in the covered ring, never O(|points|).
    """
    import math

    cell_h = 180.0 / (1 << res)
    ring = max(1, math.ceil(radius / cell_h))
    q = kring_explode(
        queries.withColumn(
            "_qcell", cell_expr(F.col(q_lat_col), F.col(q_lon_col), res)
        ),
        "_qcell", ring, res,
    )
    if broadcast_queries:
        q = F.broadcast(q)
    p = points.withColumn("cell", cell_expr(F.col(lat_col), F.col(lon_col), res))
    cand = p.join(q, "cell", "inner")
    dlat = F.col(lat_col) - F.col(q_lat_col)
    dlon = F.col(lon_col) - F.col(q_lon_col)
    cand = cand.withColumn("dist_sq", dlat * dlat + dlon * dlon)
    return cand.filter(F.col("dist_sq") <= F.lit(radius) * F.lit(radius)).select(
        query_id_col, point_id_col, "dist_sq"
    )
