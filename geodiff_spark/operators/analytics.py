"""Corpus-analytics operators: Pareto (skyline) frontier, grouped
regression sufficient statistics.

Reference parity note: geodiff itself has no skyline operator — this is
part of the training-data-pipeline surface (select documents that are
simultaneously long AND high-quality without a hand-tuned weighting).
The oracle contract matches the repo convention: every graded column is
integer-exact, the DuckDB twin restates the SEMANTICS (a quadratic
NOT-EXISTS dominance scan) rather than the algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Rows not dominated by any other row, maximizing BOTH ``x_col``
    and ``y_col`` (a dominates b iff a.x>=b.x, a.y>=b.y, and at least
    one is strict). Duplicate (x, y) points are all kept — an identical
    point does not strictly dominate.

    Scale shape (no quadratic pass, no single-partition window):

    1. collapse to one row per distinct x with max(y) — one shuffle,
       map-side partials;
    2. prefix-max of max_y over strictly-greater x via the two-phase
       range-partition trick (local window per physical partition +
       broadcast #partitions-row offsets) — the same shape as
       corpus.global_cumsum / the rebase allocator;
    3. an x-group survives iff its max_y exceeds every max_y at greater
       x (strictly — ties lose to the strictly-greater x);
    4. one equi-join back to the input keeps the rows at (surviving x,
       y == group max). Frontier size is data-dependent but the join is
       a plain key join; AQE broadcasts it when small.
    """
    pts = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    g = pts.groupBy(x_col).agg(F.max(y_col).alias("_gy"))

    p = df.sparkSession.sparkContext.defaultParallelism
    d = g.repartitionByRange(p, F.col(x_col).desc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    prev = (
        Window.partitionBy("_pid")
        .orderBy(F.col(x_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("_lprev", F.max("_gy").over(prev))
    offs = (
        d.groupBy("_pid")
        .agg(F.max("_gy").alias("_ptot"))
        .withColumn(
            "_poff",
            F.max("_ptot").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("_pid", "_poff")
    )
    surviving = (
        d.join(F.broadcast(offs), "_pid")
        .withColumn("_prevmax", F.greatest(F.col("_lprev"), F.col("_poff")))
        .filter(F.col("_prevmax").isNull() | (F.col("_gy") > F.col("_prevmax")))
        # rename: surviving derives from pts, so joining back on the
        # original names would build a trivially-true self-comparison
        .select(F.col(x_col).alias("_fx"), F.col("_gy").alias("_fy"))
    )
    return pts.join(
        surviving,
        (F.col(x_col) == F.col("_fx")) & (F.col(y_col) == F.col("_fy")),
    ).select(*pts.columns)


def pareto_frontier_sql(points_sql: str, x_col: str, y_col: str) -> str:
    """DuckDB twin of :func:`pareto_frontier`: the literal dominance
    definition as a NOT-EXISTS scan (quadratic — oracle-only)."""
    return f"""
    SELECT b.* FROM ({points_sql}) b
    WHERE b.{x_col} IS NOT NULL AND b.{y_col} IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM ({points_sql}) a
        WHERE a.{x_col} >= b.{x_col} AND a.{y_col} >= b.{y_col}
          AND (a.{x_col} > b.{x_col} OR a.{y_col} > b.{y_col})
      )
    """


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    x_scale: int = 1,
    y_scale: int = 1_000_000,
) -> DataFrame:
    """Per-group simple-linear-regression sufficient statistics as exact
    integers: n, Σx, Σy, Σxy, Σx² with x and y integer-scaled FIRST
    (floor — Spark's double→bigint cast truncates toward zero while
    DuckDB's rounds, so floor is the only cast both engines agree on).
    Slope/intercept are the standard closed forms over these five
    integers, computed driver-side in float — floats never cross the
    graded boundary (repo convention, see operators/sketch.py).

    Scale shape: ONE groupBy shuffle with map-side partials; per-row
    products stay < 2^63 for |x·x_scale|, |y·y_scale| < ~3·10^9 at
    group sizes < 10^12 — callers with wilder domains lower the scales.
    """
    xs = F.floor(F.col(x_col) * F.lit(int(x_scale))).cast("long")
    ys = F.floor(F.col(y_col) * F.lit(int(y_scale))).cast("long")
    return (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(group_col, xs.alias("_xs"), ys.alias("_ys"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_xs").alias("sum_x"),
            F.sum("_ys").alias("sum_y"),
            F.sum(F.col("_xs") * F.col("_ys")).alias("sum_xy"),
            F.sum(F.col("_xs") * F.col("_xs")).alias("sum_xx"),
        )
    )


def grouped_ols_sql(
    points_sql: str,
    group_col: str,
    x_col: str,
    y_col: str,
    x_scale: int = 1,
    y_scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`grouped_ols`."""
    return f"""
    SELECT {group_col},
           count(*) AS n,
           CAST(SUM(xs) AS BIGINT) AS sum_x,
           CAST(SUM(ys) AS BIGINT) AS sum_y,
           CAST(SUM(xs * ys) AS BIGINT) AS sum_xy,
           CAST(SUM(xs * xs) AS BIGINT) AS sum_xx
    FROM (
      SELECT {group_col},
             CAST(FLOOR({x_col} * {int(x_scale)}) AS BIGINT) AS xs,
             CAST(FLOOR({y_col} * {int(y_scale)}) AS BIGINT) AS ys
      FROM ({points_sql})
      WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
    ) GROUP BY {group_col}
    """


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier summary via median absolute deviation:
    (group, n, med, mad, n_out) with n_out = |{v : |v - med| > k*mad}|.
    The robust twin of z-score gating — one mega-value cannot drag the
    threshold the way a mean/stddev gate lets it.

    Determinism: "median" is pinned to the LOWER median — the value at
    row_number (n+1)/2 under the total order (value, id) — not an
    interpolated percentile, so both engines select the same stored
    double; |v - med| and k*mad are single IEEE ops (bit-identical
    cross-engine), never accumulated sums.

    Scale shape: two ranked passes over the same (group) partitioning —
    Spark plans ONE Exchange and reuses it for both windows and the
    final groupBy; the med/mad relations are |groups| rows joined back
    via broadcast. For cardinalities where even per-group sort is too
    hot, swap the exact median for bottomk_quantiles and keep the same
    gate."""
    med_rank = F.expr("(n + 1) div 2")
    w = Window.partitionBy("g").orderBy("v", "i")
    wn = Window.partitionBy("g")
    t = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.col(id_col).alias("i"),
    ).withColumn("r", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    med = t.filter(F.col("r") == med_rank).select("g", F.col("v").alias("med"))
    dev = t.join(F.broadcast(med), "g").withColumn(
        "d", F.abs(F.col("v") - F.col("med"))
    )
    wd = Window.partitionBy("g").orderBy("d", "i")
    dev = dev.withColumn("rd", F.row_number().over(wd))
    mad = dev.filter(F.col("rd") == med_rank).select("g", F.col("d").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                (F.col("d") > F.lit(float(k)) * F.col("mad")).cast("long")
            ).alias("n_out"),
        )
        .select(F.col("g").alias(group_col), "n", "med", "mad", "n_out")
    )


def mad_outliers_sql(
    src_sql: str,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    k: float = 3.0,
) -> str:
    """DuckDB twin of :func:`mad_outliers` (same lower-median rank, same
    (value, id) total order, same single-op float gate)."""
    return f"""
    WITH t AS (
      SELECT {group_col} AS g, {value_col} AS v, {id_col} AS i,
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY {value_col}, {id_col}) AS r,
             count(*) OVER (PARTITION BY {group_col}) AS n
      FROM ({src_sql})
    ),
    med AS (SELECT g, v AS med FROM t WHERE r = (n + 1) // 2),
    dev AS (
      SELECT t.g, t.v, t.i, t.n, med.med, abs(t.v - med.med) AS d
      FROM t JOIN med USING (g)
    ),
    devr AS (
      SELECT *, row_number() OVER (PARTITION BY g ORDER BY d, i) AS rd
      FROM dev
    ),
    mad AS (SELECT g, d AS mad FROM devr WHERE rd = (n + 1) // 2)
    SELECT devr.g AS {group_col},
           CAST(count(*) AS BIGINT) AS n,
           any_value(devr.med) AS med,
           any_value(mad.mad) AS mad,
           CAST(sum(CASE WHEN devr.d > CAST({k} AS DOUBLE) * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out
    FROM devr JOIN mad USING (g)
    GROUP BY devr.g
    """


ASSOC_SCALE = 1_000_000


def assoc_rules(
    df: DataFrame,
    user_col: str,
    item_col: str,
    *,
    max_items_per_user: int = 20,
    min_support: int = 3,
) -> DataFrame:
    """Association-rule mining at the pair level (the market-basket
    support/confidence classic; co-occurrence signal for recommenders
    and query-expansion): for every ordered item pair (a < b) appearing
    in >= min_support user baskets, emit support and both conditional
    confidences as integer-scaled exact ratios.

    Scale shape (the FP-growth-free subset that distributes cleanly):
    baskets collapse to distinct (user, item) with a DETERMINISTIC
    per-user cap (rank by item — the same bounded fan-out discipline as
    pmi_collocations: pair explode is O(cap^2) per user, never
    unbounded); ONE user-key shuffle builds sorted baskets, pairs
    explode in-task via a nested array lambda, and two groupBys
    (pair counts, item counts) with map-side partials finish it. The
    confidence division is integer two-step DIV — exact cross-engine.
    """
    t = (
        df.select(F.col(user_col).alias("u"), F.col(item_col).alias("it"))
        .distinct()
    )
    w = Window.partitionBy("u").orderBy("it")
    capped = t.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= max_items_per_user
    )
    baskets = capped.groupBy("u").agg(
        F.sort_array(F.collect_list("it")).alias("items")
    )
    # guard: Spark's sequence(1, 0) DESCENDS — single-item baskets must
    # produce an empty pair list
    idx = F.when(
        F.size("items") >= 2, F.sequence(F.lit(1), F.size("items") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        F.slice(F.col("items"), i + 1, F.size("items")),
                        lambda y: F.struct(
                            F.element_at(F.col("items"), i).alias("a"),
                            y.alias("b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    pair_counts = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    ).filter(F.col("n_pair") >= min_support)
    item_counts = capped.groupBy("it").agg(
        F.count(F.lit(1)).cast("long").alias("n_it")
    )
    out = (
        pair_counts.join(item_counts.withColumnRenamed("it", "a"), "a")
        .withColumnRenamed("n_it", "n_a")
        .join(item_counts.withColumnRenamed("it", "b"), "b")
        .withColumnRenamed("n_it", "n_b")
    )
    return out.select(
        F.col("a").alias("item_a"),
        F.col("b").alias("item_b"),
        "n_pair", "n_a", "n_b",
        F.expr(f"(n_pair * {ASSOC_SCALE}) div n_a").alias("conf_ab"),
        F.expr(f"(n_pair * {ASSOC_SCALE}) div n_b").alias("conf_ba"),
    )


def assoc_rules_sql(
    src_sql: str,
    user_col: str,
    item_col: str,
    *,
    max_items_per_user: int = 20,
    min_support: int = 3,
) -> str:
    """DuckDB twin of :func:`assoc_rules` (same cap, same sorted-pair
    enumeration, same integer confidence)."""
    return f"""
    WITH t AS (
      SELECT DISTINCT {user_col} AS u, {item_col} AS it FROM ({src_sql})
    ),
    capped AS (
      SELECT u, it FROM (
        SELECT u, it, row_number() OVER (PARTITION BY u ORDER BY it) AS _r
        FROM t
      ) WHERE _r <= {max_items_per_user}
    ),
    baskets AS (
      SELECT u, list_sort(list(it)) AS items FROM capped GROUP BY u
    ),
    pairs AS (
      SELECT p.a AS a, p.b AS b FROM (
        SELECT unnest(flatten(list_transform(
          range(1, len(items)),
          i -> list_transform(items[i + 1:],
                              y -> {{'a': items[i], 'b': y}})
        ))) AS p
        FROM baskets
      )
    ),
    pc AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n_pair FROM pairs
      GROUP BY a, b HAVING count(*) >= {min_support}
    ),
    ic AS (
      SELECT it, CAST(count(*) AS BIGINT) AS n_it FROM capped GROUP BY it
    )
    SELECT pc.a AS item_a, pc.b AS item_b, pc.n_pair,
           ia.n_it AS n_a, ib.n_it AS n_b,
           CAST((pc.n_pair * {ASSOC_SCALE}) // ia.n_it AS BIGINT) AS conf_ab,
           CAST((pc.n_pair * {ASSOC_SCALE}) // ib.n_it AS BIGINT) AS conf_ba
    FROM pc JOIN ic ia ON pc.a = ia.it JOIN ic ib ON pc.b = ib.it
    """


# --------------------------------------------------------------------------
# time-bucketed bar / first-seen / anomaly operators (round 4)
# --------------------------------------------------------------------------

def ohlc_bars(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
    *,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Open/high/low/close bars per (keys, time bucket) — the metric
    rollup every monitoring/market pipeline runs. ONE map-side-combining
    groupBy: open/close are ``min_by``/``max_by`` over the total order
    (ts, tiebreak) — no window, no sort, no second shuffle (a
    row_number() formulation would add a full partition sort). Values
    pass through untouched (no float arithmetic), so cross-engine
    equality is exact. -> (keys..., bkt, open, high, low, close, n)."""
    from .temporal import _micros

    g_us = int(bucket_seconds) * 1_000_000
    b = df.withColumn(
        "bkt", F.floor(_micros(F.col(ts_col)) / F.lit(g_us)).cast("long")
    )
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return b.groupBy(*key_cols, "bkt").agg(
        F.min_by(F.col(val_col), order).alias("open"),
        F.max(val_col).alias("high"),
        F.min(val_col).alias("low"),
        F.max_by(F.col(val_col), order).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


def ohlc_bars_sql(
    src_sql: str,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
    *,
    bucket_seconds: int = 3600,
) -> str:
    """DuckDB twin of :func:`ohlc_bars` (row_number restatement of the
    min_by/max_by total order — semantics, not algorithm)."""
    g_us = int(bucket_seconds) * 1_000_000
    keys = ", ".join(key_cols)
    return f"""
    WITH x AS (
      SELECT {keys}, epoch_us({ts_col}) // {g_us} AS bkt,
             {val_col} AS v, {ts_col} AS ts, {tiebreak_col} AS tb
      FROM ({src_sql})
    ),
    o AS (
      SELECT {keys}, bkt, v,
             row_number() OVER (PARTITION BY {keys}, bkt
                                ORDER BY ts, tb) AS rn_a,
             row_number() OVER (PARTITION BY {keys}, bkt
                                ORDER BY ts DESC, tb DESC) AS rn_d
      FROM x
    )
    SELECT {keys}, bkt,
           MAX(CASE WHEN rn_a = 1 THEN v END) AS open,
           MAX(v) AS high, MIN(v) AS low,
           MAX(CASE WHEN rn_d = 1 THEN v END) AS close,
           COUNT(*) AS n
    FROM o GROUP BY {keys}, bkt
    """


def cumulative_distinct(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    *,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Running distinct-entity count per time bucket ("cumulative users
    by day") WITHOUT a running distinct state: first-seen bucket per
    entity (one groupBy), new-entity count per bucket (one groupBy over
    #entities rows), then the two-phase range-partitioned cumsum from
    corpus.global_cumsum — no single-partition global window, no
    per-row distinct set. -> (bkt, new_ids, cum_ids)."""
    from .corpus import global_cumsum
    from .temporal import _micros

    g_us = int(bucket_seconds) * 1_000_000
    first = (
        df.select(
            F.col(id_col).alias("_id"),
            F.floor(_micros(F.col(ts_col)) / F.lit(g_us))
            .cast("long")
            .alias("bkt"),
        )
        .groupBy("_id")
        .agg(F.min("bkt").alias("bkt"))
    )
    per_bkt = first.groupBy("bkt").agg(F.count(F.lit(1)).alias("new_ids"))
    return global_cumsum(per_bkt, ["bkt"], "new_ids", out="cum_ids").select(
        "bkt", "new_ids", F.col("cum_ids").cast("long").alias("cum_ids")
    )


def cumulative_distinct_sql(
    src_sql: str,
    id_col: str,
    ts_col: str,
    *,
    bucket_seconds: int = 86400,
) -> str:
    """DuckDB twin of :func:`cumulative_distinct`."""
    g_us = int(bucket_seconds) * 1_000_000
    return f"""
    WITH first AS (
      SELECT {id_col} AS id,
             MIN(epoch_us({ts_col}) // {g_us}) AS bkt
      FROM ({src_sql}) GROUP BY {id_col}
    ),
    per AS (SELECT bkt, COUNT(*) AS new_ids FROM first GROUP BY bkt)
    SELECT bkt, new_ids,
           CAST(SUM(new_ids) OVER (ORDER BY bkt) AS BIGINT) AS cum_ids
    FROM per
    """


def rate_anomaly(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    bucket_seconds: int = 3600,
    trail: int = 24,
    k: int = 3,
    min_hist: int = 6,
) -> DataFrame:
    """Integer-exact trailing-window rate-anomaly flags: per (keys,
    bucket) event counts, compared against the mean/variance of the
    previous ``trail`` buckets. The z-score test |x - mean| > k*sigma is
    evaluated WITHOUT floats via the cleared-denominator form

        (c*x - s)^2 > k^2 * (c*q - s^2) * c

    (c = trailing bucket count, s = sum, q = sum of squares; both sides
    exact int64 — counts are bounded by rows/bucket so no overflow at
    sane bucketings). The trailing stats are one RANGE window per key —
    banded by bucket index, never a global sort. Buckets with fewer
    than ``min_hist`` history points never flag.
    -> (keys..., bkt, n, flagged)."""
    from pyspark.sql import Window

    from .temporal import _micros

    g_us = int(bucket_seconds) * 1_000_000
    counts = (
        df.withColumn(
            "bkt", F.floor(_micros(F.col(ts_col)) / F.lit(g_us)).cast("long")
        )
        .groupBy(*key_cols, "bkt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bkt")
        .rangeBetween(-int(trail), -1)
    )
    stats = counts.select(
        *key_cols, "bkt", "n",
        F.coalesce(F.count("n").over(w), F.lit(0)).alias("_c"),
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("_s"),
        F.coalesce(F.sum(F.col("n") * F.col("n")).over(w), F.lit(0)).alias("_q"),
    )
    c, s, q, n = (F.col(x) for x in ("_c", "_s", "_q", "n"))
    dev = c * n - s
    flag = (c >= int(min_hist)) & (
        dev * dev > F.lit(int(k) * int(k)) * (c * q - s * s) * c
    )
    return stats.select(*key_cols, "bkt", "n", flag.alias("flagged"))


def rate_anomaly_sql(
    src_sql: str,
    key_cols: list[str],
    ts_col: str,
    *,
    bucket_seconds: int = 3600,
    trail: int = 24,
    k: int = 3,
    min_hist: int = 6,
) -> str:
    """DuckDB twin of :func:`rate_anomaly` (same cleared-denominator
    integer test, same RANGE frame)."""
    g_us = int(bucket_seconds) * 1_000_000
    keys = ", ".join(key_cols)
    return f"""
    WITH counts AS (
      SELECT {keys}, epoch_us({ts_col}) // {g_us} AS bkt,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ({src_sql}) GROUP BY {keys}, bkt
    ),
    stats AS (
      SELECT {keys}, bkt, n,
        CAST(COALESCE(COUNT(n) OVER wt, 0) AS BIGINT) AS c,
        CAST(COALESCE(SUM(n) OVER wt, 0) AS BIGINT) AS s,
        CAST(COALESCE(SUM(n * n) OVER wt, 0) AS BIGINT) AS q
      FROM counts
      WINDOW wt AS (PARTITION BY {keys} ORDER BY bkt
                    RANGE BETWEEN {int(trail)} PRECEDING AND 1 PRECEDING)
    )
    SELECT {keys}, bkt, n,
           (c >= {int(min_hist)} AND
            (c*n - s)*(c*n - s) > {int(k) * int(k)} * (c*q - s*s) * c)
             AS flagged
    FROM stats
    """


def cusum_alerts(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    bucket_seconds: int = 3600,
    drift: int = 1,
    threshold: int = 10,
) -> DataFrame:
    """CUSUM change-point alerts over per-(key, bucket) event counts.

    The textbook recursion S_t = max(0, S_{t-1} + x_t) (x = n - drift)
    looks sequential, but distributes exactly via the prefix identity

        S_t = P_t - min(0, min_{j<=t} P_j),      P_t = sum_{j<=t} x_j

    so the whole detector is two cumulative window frames per key —
    integer-exact (counts and drift are ints), no UDF, no iteration,
    no driver loop. Alert fires while S_t > threshold. The window
    partition is one key's bucket series (bounded by the time range,
    not data volume — a year of hourly buckets is 8.8k rows), so the
    per-key sort never concentrates raw events.
    -> (keys..., bkt, n, cusum, alert)."""
    from pyspark.sql import Window

    from .temporal import _micros

    g_us = int(bucket_seconds) * 1_000_000
    counts = (
        df.withColumn(
            "bkt", F.floor(_micros(F.col(ts_col)) / F.lit(g_us)).cast("long")
        )
        .groupBy(*key_cols, "bkt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(F.col("n") - F.lit(int(drift))).over(w)
    stats = counts.withColumn("_p", p).withColumn(
        "cusum", F.col("_p") - F.least(F.lit(0), F.min("_p").over(w))
    )
    return stats.select(
        *key_cols, "bkt", "n", "cusum",
        (F.col("cusum") > F.lit(int(threshold))).alias("alert"),
    )


def cusum_alerts_sql(
    src_sql: str,
    key_cols: list[str],
    ts_col: str,
    *,
    bucket_seconds: int = 3600,
    drift: int = 1,
    threshold: int = 10,
) -> str:
    """DuckDB twin of :func:`cusum_alerts` (same prefix identity)."""
    g_us = int(bucket_seconds) * 1_000_000
    keys = ", ".join(key_cols)
    return f"""
    WITH counts AS (
      SELECT {keys}, epoch_us({ts_col}) // {g_us} AS bkt,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ({src_sql}) GROUP BY {keys}, bkt
    ),
    pref AS (
      SELECT {keys}, bkt, n,
             SUM(n - {int(drift)}) OVER (PARTITION BY {keys} ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM counts
    ),
    pre AS (
      SELECT {keys}, bkt, n, p,
             MIN(p) OVER (PARTITION BY {keys} ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minp
      FROM pref
    )
    SELECT {keys}, bkt, n,
           CAST(p - LEAST(0, minp) AS BIGINT) AS cusum,
           (p - LEAST(0, minp)) > {int(threshold)} AS alert
    FROM pre
    """
