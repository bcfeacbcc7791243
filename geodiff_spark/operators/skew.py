"""Explicit salted-key skew mitigation (BASELINE.json north_rule).

AQE's skew-join splitting handles storage-level skew; these operators
handle *algorithmic* skew — hot keys that would melt a single reducer no
matter how AQE splits files. Two shapes:

salted_agg
    Two-phase aggregation: groupBy(key, salt) partial -> groupBy(key)
    final. Turns one hot-key reducer into ``n_salts`` parallel partials.
    Only algebraic aggregates (sum/count/min/max) compose; the helpers
    take (partial, final) expression pairs.

salted_join
    Big-skewed × small join: the big side gets a random salt in
    [0, n_salts); the small side is EXPLODED n_salts times so every
    (key, salt) bucket finds its match. Memory cost: |small| × n_salts —
    exactly the trade a cluster makes to kill a hot key. Used for hot
    spatial cells (dense geographies) joining tile metadata.

Spatial note: hot cells are the expected skew in this engine (cities vs
ocean). ``salted_cell_counts`` is the canonical use — per-cell page
counts at web scale where a few cells hold 10^8 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(
    df: DataFrame,
    n_salts: int = DEFAULT_SALTS,
    col: str = "_salt",
    from_cols: list[str] | None = None,
) -> DataFrame:
    """Salt column in [0, n_salts), DETERMINISTIC per row content.

    An unseeded rand() salt is a SPARK-23207-style hazard when used as a
    shuffle key: a map task recomputed after a shuffle-fetch failure
    re-rolls the salts, so downstream salted aggregations/joins can
    double-count or drop rows — exactly on the large-cluster retries
    these operators target. xxhash64 over row content keeps retries
    idempotent and stays codegen'd. ``from_cols`` narrows the hash input
    (e.g. a unique id); default hashes all columns, which spreads a hot
    key unless rows are exact duplicates — pass a unique column then."""
    cols = [F.col(c) for c in (from_cols or df.columns)]
    return df.withColumn(col, F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int"))


def explode_salts(df: DataFrame, n_salts: int = DEFAULT_SALTS, col: str = "_salt") -> DataFrame:
    """Replicate every row once per salt value (the small-side move)."""
    return df.withColumn(
        col, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    *,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial_aggs`` run per (keys..., salt); ``final_aggs`` re-combine
    per keys over the partial columns. Example (count + sum):

        salted_agg(df, ["cell"],
                   [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
                   [F.sum("n").alias("n"), F.sum("s").alias("s")])
    """
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_window_totals(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    *,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-proof replacement for ``agg(...).over(Window.partitionBy(keys))``.

    A window aggregate over a hot key is the canonical REAL skew pain in
    Spark: unlike groupBy (whose map-side partial aggregation already
    collapses a hot key to one row per task), ``Window.partitionBy``
    must materialize and sort the WHOLE partition in one task — a key
    holding 30% of 10^12 rows lands 3*10^11 rows on a single core.
    The skew-proof plan: compute per-key totals with the salted
    two-phase aggregation (bounded: |keys| result rows), then broadcast
    the tiny totals frame back onto every row — same output as the
    window, no single-task sort, no hot reducer.

    Output: all columns of ``df`` + the final_agg columns.
    """
    totals = salted_agg(df, keys, partial_aggs, final_aggs, n_salts=n_salts)
    return df.join(F.broadcast(totals), keys, "left")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, explode the small side.
    Output columns = big ∪ small minus the internal salt."""
    b = with_salt(big, n_salts)
    s = explode_salts(small, n_salts)
    return b.join(s, on + ["_salt"], how).drop("_salt")


def salted_cell_counts(
    pages: DataFrame, *, res: int, n_salts: int = DEFAULT_SALTS,
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """Canonical hot-cell rollup: per-cell page counts that survive a
    city-sized hot cell. -> (cell, n)."""
    from ..spatial.cells import cell_expr

    cells = pages.withColumn("cell", cell_expr(F.col(lat_col), F.col(lon_col), res))
    return salted_agg(
        cells,
        ["cell"],
        [F.count(F.lit(1)).alias("n")],
        [F.sum("n").alias("n")],
        n_salts=n_salts,
    )


# --- rendezvous (HRW) routing ---------------------------------------------

def hrw_shard_expr(key57: Column, n_shards: int) -> Column:
    """Highest-random-weight (rendezvous) shard for a 57-bit key: the
    argmax over shards of a seeded remix of the key. The property that
    matters at scale: when the shard count changes n -> n+1, ONLY the
    keys whose new shard wins move (an expected 1/(n+1) fraction) —
    consistent routing for resumable checkpoint layouts and stateful-
    stream repartitions, where a mod-N route would remap almost every
    key. Ties break to the lowest shard id (first position of the max).

    Pure codegen: n_shards parallel remix57 lanes + array argmax, no
    UDF, no shuffle. Keep n_shards modest (it is a per-row expression
    width); route to coarse shards here and hash within a shard."""
    from geodiff_spark.operators.sketch import cm_seed, remix57_col

    lanes = F.array(
        *[remix57_col(key57, cm_seed(1000 + s)) for s in range(n_shards)]
    )
    return (F.array_position(lanes, F.array_max(lanes)) - 1).cast("long")


def hrw_shard_sql(key57: str, n_shards: int) -> str:
    """DuckDB twin of :func:`hrw_shard_expr` (list_position finds the
    FIRST occurrence — same lowest-shard tie-break)."""
    from geodiff_spark.operators.sketch import cm_seed, remix57_sql

    lanes = ", ".join(
        remix57_sql(key57, cm_seed(1000 + s)) for s in range(n_shards)
    )
    return (
        f"CAST(list_position([{lanes}], list_max([{lanes}])) - 1 AS BIGINT)"
    )
