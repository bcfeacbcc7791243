"""Z-order (Morton) space-filling-curve keys — the data-layout side of
the spatial engine.

The cell encoder (spatial/cells.py) answers point->cell queries; Morton
keys answer a different question: HOW TO LAY THE TABLE OUT ON DISK so
that spatially-close rows land in the same files and a lat/lon range
predicate prunes most of the scan. This is exactly what Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's z-ordered sort do for their file
clustering: sort (or range-partition) the table by the interleaved key
and min/max file statistics on the key become 2-D bounding boxes.

Kernel: quantize lat/lon to 16 bits each over their full valid ranges,
then interleave the bits with the classic magic-number spread — five
shift/mask stages per axis, all in int64, all inside whole-stage
codegen (no UDF, no overflow: every intermediate < 2^32, ANSI-safe).
The DuckDB twin is the same five stages in SQL, bit-for-bit.

Scale shape: the key is a narrow per-row projection (zero shuffle);
``repartitionByRange(zkey)`` then gives spatially-local write tasks —
one range shuffle to cluster 100 TB, after which every file's zkey
min/max is a tile. ``zbucket`` (the top bits) is the coarse tile id a
file-skipping index would store.

Reference parity note: geodiff has no layout optimizer (single-node
SQLite does not need one); this module is the scale-path addition the
north rule's Iceberg 10^12-row table requires.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (mask, shift) stages spreading 16 bits to even positions of 32.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)
_Q = 1 << 16  # 16-bit quantization per axis


def _quant_col(v: Column, lo: float, hi: float) -> Column:
    """Quantize a double in [lo, hi] to [0, 2^16): floor of the affine
    map, clamped (hi itself maps to the top bucket). The arithmetic is
    two IEEE double ops in a fixed order — bit-identical cross-engine."""
    q = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(_Q)))
    return F.least(F.greatest(q, F.lit(0)), F.lit(_Q - 1)).cast("long")


def _quant_sql(v: str, lo: float, hi: float) -> str:
    return (
        f"least(greatest(CAST(floor((({v}) - CAST({lo} AS DOUBLE)) / "
        f"CAST({hi - lo} AS DOUBLE) * CAST({_Q} AS DOUBLE)) AS BIGINT), 0), {_Q - 1})"
    )


def _spread_col(x: Column) -> Column:
    for sh, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, sh)).bitwiseAND(F.lit(mask))
    return x


def _spread_sql(x: str) -> str:
    for sh, mask in _SPREAD:
        x = f"((({x}) | (({x}) << {sh})) & {mask})"
    return x


def morton_expr(lat: Column, lon: Column) -> Column:
    """32-bit Z-order key of a (lat, lon) point: lon bits at even
    positions, lat bits at odd — BIGINT, codegen-only."""
    zx = _spread_col(_quant_col(lon, -180.0, 180.0))
    zy = _spread_col(_quant_col(lat, -90.0, 90.0))
    return zx.bitwiseOR(F.shiftleft(zy, 1)).cast("long")


def morton_sql(lat: str, lon: str) -> str:
    """DuckDB twin of :func:`morton_expr` (same stages, same masks)."""
    zx = _spread_sql(_quant_sql(lon, -180.0, 180.0))
    zy = _spread_sql(_quant_sql(lat, -90.0, 90.0))
    return f"CAST((({zx}) | (({zy}) << 1)) AS BIGINT)"


def zbucket_expr(zkey: Column, bits: int = 18) -> Column:
    """Coarse layout bucket: the top ``32 - bits`` bits of the key —
    what a file-skipping index stores per file after a range-cluster."""
    return F.shiftright(zkey, bits).cast("long")


def zbucket_sql(zkey: str, bits: int = 18) -> str:
    return f"CAST((({zkey}) >> {bits}) AS BIGINT)"


def layout_stats(
    points,
    lat_col: str,
    lon_col: str,
    *,
    bbox: tuple[float, float, float, float],
    bits: int = 18,
):
    """Per-zbucket file statistics + the pruning decision a file-
    skipping index makes for a bbox query — the measurable payoff of
    Z-order layout. One row per bucket ("file"): row count, the
    bucket's quantized lon/lat min/max envelope (exactly the column
    min/max stats Iceberg/Delta keep per data file), and ``scan`` = 1
    iff that envelope intersects the query box — the fraction of
    buckets with scan=0 is the I/O the layout saves.

    ``bbox`` is (lon_lo, lat_lo, lon_hi, lat_hi) in degrees; the
    comparison runs on quantized ints (closed-open on the grid), so the
    decision is bit-identical cross-engine.

    Scale shape: one narrow projection + one groupBy(zbucket) with
    map-side min/max partials — the stats job a table OPTIMIZE already
    runs; no second scan of the data at query time."""
    from pyspark.sql import functions as F

    qx = _quant_col(F.col(lon_col), -180.0, 180.0)
    qy = _quant_col(F.col(lat_col), -90.0, 90.0)
    z = morton_expr(F.col(lat_col), F.col(lon_col))
    gx0, gy0 = _pyquant(bbox[0], -180.0, 180.0), _pyquant(bbox[1], -90.0, 90.0)
    gx1, gy1 = _pyquant(bbox[2], -180.0, 180.0), _pyquant(bbox[3], -90.0, 90.0)
    g = (
        points.select(
            zbucket_expr(z, bits).alias("zbucket"),
            qx.alias("qx"), qy.alias("qy"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("qx").alias("qx_min"), F.max("qx").alias("qx_max"),
            F.min("qy").alias("qy_min"), F.max("qy").alias("qy_max"),
        )
    )
    scan = (
        (F.col("qx_max") >= F.lit(gx0)) & (F.col("qx_min") < F.lit(gx1))
        & (F.col("qy_max") >= F.lit(gy0)) & (F.col("qy_min") < F.lit(gy1))
    )
    return g.select(
        "zbucket", "n_rows", "qx_min", "qx_max", "qy_min", "qy_max",
        scan.cast("long").alias("scan"),
    )


def _pyquant(v: float, lo: float, hi: float) -> int:
    """Python twin of _quant_col for query-constant bounds."""
    import math

    return max(0, min(_Q - 1, math.floor((v - lo) / (hi - lo) * _Q)))


def layout_stats_sql(
    src_sql: str,
    lat: str,
    lon: str,
    *,
    bbox: tuple[float, float, float, float],
    bits: int = 18,
) -> str:
    """DuckDB twin of :func:`layout_stats`."""
    qx = _quant_sql(lon, -180.0, 180.0)
    qy = _quant_sql(lat, -90.0, 90.0)
    z = morton_sql(lat, lon)
    gx0, gy0 = _pyquant(bbox[0], -180.0, 180.0), _pyquant(bbox[1], -90.0, 90.0)
    gx1, gy1 = _pyquant(bbox[2], -180.0, 180.0), _pyquant(bbox[3], -90.0, 90.0)
    return f"""
    WITH pt AS (
      SELECT {zbucket_sql(z, bits)} AS zbucket, {qx} AS qx, {qy} AS qy
      FROM ({src_sql})
    ),
    g AS (
      SELECT zbucket, CAST(count(*) AS BIGINT) AS n_rows,
             MIN(qx) AS qx_min, MAX(qx) AS qx_max,
             MIN(qy) AS qy_min, MAX(qy) AS qy_max
      FROM pt GROUP BY zbucket
    )
    SELECT zbucket, n_rows, qx_min, qx_max, qy_min, qy_max,
           CAST(qx_max >= {gx0} AND qx_min < {gx1}
            AND qy_max >= {gy0} AND qy_min < {gy1} AS BIGINT) AS scan
    FROM g
    """


def range_cluster_assign(
    points,
    lat_col: str,
    lon_col: str,
    *,
    n_parts: int = 8,
    sample_k: int = 256,
):
    """Balanced range clustering on the Z-order key — what
    ``repartitionByRange`` does internally, made explicit and graded:
    (1) draw a mergeable bottom-k-by-hash sample of zkeys, (2) cut it
    at the p/n_parts order statistics to get n_parts-1 boundaries,
    (3) assign every row pid = #boundaries <= zkey. Returns one row per
    populated partition: (pid, n_rows, zmin, zmax) — the balance proof
    and the per-file key ranges a writer would produce.

    Scale shape: the sample is a TakeOrdered (never a global sort); the
    boundary array is a 1-row broadcast crossJoin; assignment is a
    narrow codegen filter-count per row; the final stats are ONE
    groupBy. Exactly the plan a 100 TB OPTIMIZE ZORDER write runs —
    sample, cut, route, write — with the route step graded bit-exact.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from geodiff_spark.operators.sketch import HLL_SEED, M57, remix57_col

    z = morton_expr(F.col(lat_col), F.col(lon_col))
    pts = points.select(z.alias("zkey"))
    hk = remix57_col(F.pmod(F.col("zkey"), F.lit(M57)), HLL_SEED)
    samp = pts.select("zkey", hk.alias("hk")).orderBy("hk").limit(sample_k)
    ranked = samp.select(
        "zkey",
        F.row_number().over(Window.orderBy("zkey", "hk")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    bounds = (
        ranked.filter(
            F.expr(
                f"r IN ({', '.join(f'(({p} * m + {n_parts - 1}) div {n_parts})' for p in range(1, n_parts))})"
            )
        )
        .groupBy()
        .agg(F.sort_array(F.collect_list("zkey")).alias("bs"))
    )
    assigned = pts.crossJoin(F.broadcast(bounds)).select(
        "zkey",
        F.size(F.filter(F.col("bs"), lambda b: b <= F.col("zkey")))
        .cast("long")
        .alias("pid"),
    )
    return assigned.groupBy("pid").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("zkey").alias("zmin"),
        F.max("zkey").alias("zmax"),
    )


def range_cluster_assign_sql(
    src_sql: str,
    lat: str,
    lon: str,
    *,
    n_parts: int = 8,
    sample_k: int = 256,
) -> str:
    """DuckDB twin of :func:`range_cluster_assign` (same sample, same
    cut ranks, same boundary comparison)."""
    from geodiff_spark.operators.sketch import HLL_SEED, M57, remix57_sql

    z = morton_sql(lat, lon)
    hk = remix57_sql(f"((zkey % {M57}) + {M57}) % {M57}", HLL_SEED)
    ranks = ", ".join(
        f"(({p} * m + {n_parts - 1}) // {n_parts})" for p in range(1, n_parts)
    )
    return f"""
    WITH pts AS (SELECT {z} AS zkey FROM ({src_sql})),
    samp AS (
      SELECT zkey, {hk} AS hk FROM pts ORDER BY hk LIMIT {sample_k}
    ),
    ranked AS (
      SELECT zkey, row_number() OVER (ORDER BY zkey, hk) AS r,
             count(*) OVER () AS m
      FROM samp
    ),
    bounds AS (
      SELECT list_sort(list(zkey)) AS bs FROM ranked
      WHERE r IN ({ranks})
    ),
    assigned AS (
      SELECT zkey,
             CAST(len(list_filter(bs, b -> b <= zkey)) AS BIGINT) AS pid
      FROM pts, bounds
    )
    SELECT pid, CAST(count(*) AS BIGINT) AS n_rows,
           MIN(zkey) AS zmin, MAX(zkey) AS zmax
    FROM assigned GROUP BY pid
    """


def compaction_plan(
    file_stats,
    key_col: str = "zbucket",
    size_col: str = "n_rows",
    *,
    target: int,
):
    """Bin-packing plan for compacting small sorted-layout files into
    target-sized groups — the OPTIMIZE/rewrite-data-files step that
    follows layout_stats: files (here: zbuckets with row counts) are
    taken in key order (preserving the z-clustering) and cut into
    groups where the running size crosses ``target``. Returns one row
    per group: (group_id, n_files, total_rows, key_min, key_max).

    Group id is the closed form floor(exclusive_prefix_sum / target) —
    a deterministic, order-based assignment both engines compute
    identically (a greedy first-fit-decreasing pack is sequential and
    engine-hostile; the prefix-sum cut is what table formats actually
    ship for sorted layouts). The window runs over the FILE MANIFEST
    (bounded by bucket count, <= 2^(32-bits)), never over data rows; at
    10^12 rows the manifest is ~10^4 entries — driver-scale metadata,
    planned in one window pass.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    g = (
        file_stats.select(
            F.col(key_col).alias("k"), F.col(size_col).cast("long").alias("sz")
        )
        .withColumn("csum", F.coalesce(F.sum("sz").over(w), F.lit(0).cast("long")))
        # exact int64 floor division — `/` would round through a double
        .withColumn("gid", F.expr(f"csum div {int(target)}"))
    )
    return g.groupBy("gid").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("sz").cast("long").alias("total_rows"),
        F.min("k").alias("key_min"),
        F.max("k").alias("key_max"),
    ).select(F.col("gid").alias("group_id"), "n_files", "total_rows",
             "key_min", "key_max")


def compaction_plan_sql(
    stats_sql: str,
    key_col: str = "zbucket",
    size_col: str = "n_rows",
    *,
    target: int,
) -> str:
    """DuckDB twin of :func:`compaction_plan`."""
    return f"""
    WITH g AS (
      SELECT {key_col} AS k, CAST({size_col} AS BIGINT) AS sz,
             CAST(COALESCE(SUM({size_col}) OVER (
               ORDER BY {key_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) // {target} AS BIGINT) AS gid
      FROM ({stats_sql})
    )
    SELECT gid AS group_id, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(sz) AS BIGINT) AS total_rows,
           MIN(k) AS key_min, MAX(k) AS key_max
    FROM g GROUP BY gid
    """


def recluster_plan(
    stats_v1,
    stats_v2,
    key_col: str = "zbucket",
):
    """Diff-driven incremental re-cluster planning — the layout layer's
    changeset semantics: full-outer-join two snapshots' per-zbucket
    manifests (layout_stats output) and emit every bucket whose stats
    changed, classified insert/update/delete exactly like a row
    changeset. An OPTIMIZE that consumes this plan rewrites ONLY the
    touched buckets — |changeset|-cost maintenance of a 100 TB
    z-clustered table instead of a full re-sort (the same IVM shape as
    the tile pyramid's delta path).

    One manifest-sized full-outer join; unchanged buckets (the vast
    majority between neighboring snapshots) drop out.
    """
    from pyspark.sql import functions as F

    cols = [c for c in stats_v1.columns if c != key_col]
    a = stats_v1.select(
        F.col(key_col).alias("k"),
        F.struct(*[F.col(c) for c in cols]).alias("a"),
    )
    b = stats_v2.select(
        F.col(key_col).alias("k"),
        F.struct(*[F.col(c) for c in cols]).alias("b"),
    )
    j = a.join(b, "k", "full_outer")
    op = (
        F.when(F.col("a").isNull(), F.lit("insert"))
        .when(F.col("b").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    changed = j.filter(
        F.col("a").isNull() | F.col("b").isNull() | (F.col("a") != F.col("b"))
    )
    return changed.select(
        F.col("k").alias(key_col),
        op.alias("op"),
        F.coalesce(F.col("a.n_rows"), F.lit(0)).cast("long").alias("rows_v1"),
        F.coalesce(F.col("b.n_rows"), F.lit(0)).cast("long").alias("rows_v2"),
    )


def recluster_plan_sql(
    stats_v1_sql: str,
    stats_v2_sql: str,
    key_col: str = "zbucket",
    stat_cols: tuple = ("n_rows", "qx_min", "qx_max", "qy_min", "qy_max"),
) -> str:
    """DuckDB twin of :func:`recluster_plan` (explicit column-wise
    change predicate — stat columns are NOT NULL by construction)."""
    diff = " OR ".join(f"a.{c} <> b.{c}" for c in stat_cols)
    return f"""
    WITH a AS ({stats_v1_sql}), b AS ({stats_v2_sql})
    SELECT COALESCE(a.{key_col}, b.{key_col}) AS {key_col},
           CASE WHEN a.{key_col} IS NULL THEN 'insert'
                WHEN b.{key_col} IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           CAST(COALESCE(a.n_rows, 0) AS BIGINT) AS rows_v1,
           CAST(COALESCE(b.n_rows, 0) AS BIGINT) AS rows_v2
    FROM a FULL OUTER JOIN b ON a.{key_col} = b.{key_col}
    WHERE a.{key_col} IS NULL OR b.{key_col} IS NULL OR {diff}
    """
