"""Temporal operators over the event stream: batch sessionization and a
generic as-of (point-in-time) join.

Both are classic operators Spark's built-in surface lacks as primitives;
both are expressed as the scale-correct window composition (ONE shuffle
on the entity key, no range-join explosion):

  * sessionize — the batch twin of streaming/sessionize.py: gap-based
    session assignment as lag + running sum of session-break flags per
    key. Gaps compare in integer MICROSECONDS (unix_micros vs DuckDB
    epoch_us) — no float thresholds, no seconds truncation.
  * asof_join — each left row picks the latest right row with
    right_ts <= left_ts for the same key, via the union+last_value
    pattern: tag sides, union, sort per key by (ts, side), running
    `last(right_struct, ignorenulls)` carries the most recent right row
    forward; left rows then unpack it. This is O(n log n) per key with
    ONE shuffle — the naive `JOIN ON key AND r.ts <= l.ts` + argmax is
    quadratic per key at web scale. The right payload rides ONE struct
    column so the match is always a consistent single row. The right
    side is deduplicated to one row per (key, ts) first (deterministic
    max-tiebreaker), which is also what makes DuckDB's native ASOF JOIN
    (the oracle) unambiguous.

Reference analogue: geodiff has no temporal surface; this extends the
events-table coverage the same way streaming/cdc.py extends changesets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _micros(ts: Column) -> Column:
    """Integer microseconds since epoch; NTZ timestamps go through the
    session TZ (UTC in get_spark) so this equals DuckDB's epoch_us."""
    return F.unix_micros(ts.cast("timestamp"))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Assign gap-based sessions per key and aggregate one row per
    session: (key, session_id, n_events, start_ts, end_ts).

    session break = first event of the key, or gap from the previous
    event strictly greater than ``gap_seconds`` (compared in integer
    microseconds). session_id numbers sessions 1.. per key in time
    order. One shuffle on the key; per-key windows are the standard
    sessionization shape (the streaming twin handles unbounded keys
    with watermarked state)."""
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = _micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    brk = F.when(prev.isNull() | ((us - prev) > gap_us), F.lit(1)).otherwise(
        F.lit(0)
    )
    with_sid = df.withColumn("session_id", F.sum(brk).over(run).cast("long"))
    return with_sid.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )


def sessionize_sql(
    table: str, key_col: str, ts_col: str, gap_seconds: int, tiebreak_col: str
) -> str:
    """DuckDB twin of :func:`sessionize`."""
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
    WITH g AS (
      SELECT {key_col}, {ts_col},
             epoch_us({ts_col})
               - lag(epoch_us({ts_col})) OVER (PARTITION BY {key_col}
                                               ORDER BY {ts_col}, {tiebreak_col})
               AS gap
      FROM {table}
    ), s AS (
      SELECT {key_col}, {ts_col},
             CAST(SUM(CASE WHEN gap IS NULL OR gap > {gap_us}
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY {key_col} ORDER BY {ts_col}
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM g
    )
    SELECT {key_col}, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN({ts_col}) AS start_ts, MAX({ts_col}) AS end_ts
    FROM s GROUP BY {key_col}, session_id
    """


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak_col: str | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains the payload of the latest
    right row with ``right_ts <= left_ts`` on the same key (NULLs when
    none). Matches DuckDB `ASOF LEFT JOIN` semantics with the right
    side deduplicated to one row per (key, ts).

    ``tolerance_seconds`` nulls out matches older than the tolerance
    (pandas.merge_asof semantics) without dropping the left row.
    """
    ts = "_asof_ts"
    if tiebreak_col is not None:
        wded = Window.partitionBy(*key_cols, right_ts).orderBy(
            F.col(tiebreak_col).desc()
        )
        right = (
            right.withColumn("_rn", F.row_number().over(wded))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    l_cols = [c for c in left.columns]
    l = left.select(
        *[F.col(c) for c in l_cols],
        F.col(left_ts).alias(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{dict(right.dtypes)[c]}" for c in [right_ts, *right_payload]
            ) + ">"
        ).alias("_r"),
    )
    ltypes = dict(left.dtypes)
    r = right.select(
        # key columns come from the right row (they drive the window
        # partitioning); every other left column is a typed NULL
        *[
            F.col(c) if c in key_cols else F.lit(None).cast(ltypes[c]).alias(c)
            for c in l_cols
        ],
        F.col(right_ts).alias(ts),
        F.lit(0).alias("_side"),
        F.struct(F.col(right_ts), *[F.col(c) for c in right_payload]).alias("_r"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds) * 1_000_000
        in_tol = (
            _micros(F.col(ts)) - _micros(F.col("_m")[right_ts])
        ) <= tol_us
        out = out.withColumn("_m", F.when(in_tol, F.col("_m")))
    sel = [F.col(c) for c in l_cols]
    sel.append(F.col("_m")[right_ts].alias(f"match_{right_ts}"))
    sel.extend(F.col("_m")[c].alias(f"match_{c}") for c in right_payload)
    return out.select(*sel)


def interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    *,
    probe_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    probe_cols: list[str],
    interval_cols: list[str],
    keys: list[str] | None = None,
    max_buckets: int | None = None,
) -> DataFrame:
    """Range-containment join: probe rows paired with every interval
    where ``start <= ts <= end`` (closed; and equal ``keys`` if given)
    — the operator Spark's equi-join planner lacks (a raw range theta-
    join degenerates to a broadcast-nested-loop / cartesian product).

    Bucketed-equi strategy: quantize time into ``bucket_seconds``-wide
    buckets; each interval explodes to the buckets it overlaps (at most
    duration/bucket + 1 rows — pick the bucket near the typical
    interval length), each probe row lands in exactly ONE bucket, so
    the equi-join on (keys..., bucket) + exact microsecond refine needs
    no post-dedup. Shuffle is one hash exchange per side on the bucket
    key; hot buckets split by AQE skew join.

    ``max_buckets`` adds a row-level guard (job fails loudly) against
    degenerate inputs whose intervals would explode the fan-out —
    the same fail-don't-corrupt stance as diff's NULL-PK guard.

    Timestamp columns may be TIMESTAMP or already-long microseconds.
    """
    keys = keys or []
    g_us = int(bucket_seconds) * 1_000_000

    def as_us(df, col):
        if dict(df.dtypes)[col] in ("timestamp", "timestamp_ntz"):
            return _micros(F.col(col))
        return F.col(col).cast("long")

    s_us = as_us(intervals, start_col)
    e_us = as_us(intervals, end_col)
    sb = F.floor(s_us / F.lit(g_us)).cast("long")
    eb = F.floor(e_us / F.lit(g_us)).cast("long")
    iv = intervals.withColumn("_s_us", s_us).withColumn("_e_us", e_us)
    if max_buckets is not None:
        # fold the guard into the sequence bound itself so column pruning
        # can't eliminate it (same discipline as diff._guard_null_pk)
        eb = F.when(
            F.assert_true(
                eb - sb < F.lit(int(max_buckets)),
                F.lit(f"interval spans >= {max_buckets} buckets"),
            ).isNull(),
            eb,
        )
    iv = iv.withColumn("_bkt", F.explode(F.sequence(sb, eb)))

    t_us = as_us(probe, probe_ts)
    pr = probe.withColumn("_t_us", t_us).withColumn(
        "_bkt", F.floor(F.col("_t_us") / F.lit(g_us)).cast("long")
    )
    cond = [pr["_bkt"] == iv["_bkt"]] + [pr[k] == iv[k] for k in keys]
    out = pr.join(iv, cond, "inner").filter(
        (F.col("_t_us") >= F.col("_s_us")) & (F.col("_t_us") <= F.col("_e_us"))
    )
    return out.select(*[pr[c] for c in probe_cols], *[iv[c] for c in interval_cols])


def interval_join_sql(
    probe_src: str,
    interval_src: str,
    *,
    probe_ts: str,
    start_col: str,
    end_col: str,
    probe_cols: list[str],
    interval_cols: list[str],
    keys: list[str] | None = None,
) -> str:
    """Independent semantic oracle: a plain BETWEEN theta-join (DuckDB
    plans it as an IEJoin) — no bucket replay, so it cross-checks the
    bucketing logic rather than restating it."""
    keys = keys or []
    on = " AND ".join(
        [f"p.{probe_ts} BETWEEN i.{start_col} AND i.{end_col}"]
        + [f"p.{k} = i.{k}" for k in keys]
    )
    sel = ", ".join(
        [f"p.{c} AS {c}" for c in probe_cols] + [f"i.{c} AS {c}" for c in interval_cols]
    )
    return f"SELECT {sel} FROM ({probe_src}) p JOIN ({interval_src}) i ON {on}"


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix: users are cohorted by the ISO
    week of their first event; for every (cohort_week, week_offset)
    cell, count how many of that cohort's users were active
    ``week_offset`` weeks after their first week. The staple
    longitudinal rollup over activity/crawl event logs.

    Scale shape: ONE shuffle on the user key does all the per-user
    work — groupBy(user).agg(collect_set(week)) folds a user's whole
    history into its distinct active-week set with map-side partial
    sets (bounded: #distinct weeks per user is tiny vs #events), the
    cohort week is array_min of that set (no window, no join back to a
    first-seen dimension), and exploding the set emits at most one row
    per user per matrix cell — so the final count(*) per
    (cohort, offset) IS the exact distinct-user count without a
    countDistinct expand. Offsets are exact integer day arithmetic
    (datediff/7), never float.
    """
    week = F.date_trunc("week", F.col(ts_col))
    sets = (
        events.select(F.col(user_col).alias("u"), week.alias("wk"))
        .groupBy("u")
        .agg(F.collect_set("wk").alias("wks"))
    )
    cells = sets.select(
        F.array_min("wks").alias("cohort_week"),
        F.explode("wks").alias("wk"),
    ).select(
        "cohort_week",
        (F.datediff(F.col("wk").cast("date"), F.col("cohort_week").cast("date")) / 7)
        .cast("long")
        .alias("week_offset"),
    )
    return cells.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def cohort_retention_sql(events_sql: str) -> str:
    """DuckDB twin of :func:`cohort_retention` (``events_sql`` yields
    (user_id, ts))."""
    return f"""
    SELECT cohort_week, week_offset, count(*) AS n_users FROM (
      SELECT u,
             MIN(wk) OVER (PARTITION BY u) AS cohort_week,
             CAST(date_diff('day', MIN(wk) OVER (PARTITION BY u), wk) // 7 AS BIGINT)
               AS week_offset
      FROM (
        SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS wk
        FROM ({events_sql})
      )
    ) GROUP BY 1, 2
    """


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: how far through the step sequence
    ``steps`` (e.g. signup → click → purchase) each user progressed,
    where each stage must occur STRICTLY after the previous stage's
    completion time. Stage i's completion time is the MINIMUM
    qualifying timestamp (the standard funnel semantics, equal to the
    chained ``min(ts) WHERE ts > prev`` closed form the oracle states).

    Returns (uid, stages_reached, reached_us): stages_reached ∈
    [0, len(steps)], reached_us = integer-microsecond time the last
    reached stage completed (NULL at stage 0).

    Scale shape: ONE shuffle on the user key — per-user step events
    fold into a sorted array and a single `aggregate()` pass advances
    a (stage, ts) accumulator; no per-stage join chain (len(steps)
    shuffles) and no window cascade. The array is bounded by the
    user's STEP-event count (irrelevant event types are filtered
    before the shuffle), the usual per-entity bound sessionize already
    relies on. Pure JVM exprs — no UDF.
    """
    idx = F.when(F.col(step_col) == steps[0], F.lit(0))
    for i, s in enumerate(steps[1:], start=1):
        idx = idx.when(F.col(step_col) == s, F.lit(i))
    ev = events.filter(F.col(step_col).isin(steps)).select(
        F.col(user_col).alias("uid"),
        _micros(F.col(ts_col)).alias("us"),
        idx.cast("int").alias("idx"),
    )
    arr = ev.groupBy("uid").agg(
        F.sort_array(F.collect_list(F.struct("us", "idx"))).alias("evs")
    )
    zero = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.lit(None).cast("long").alias("us"),
    )
    folded = F.aggregate(
        "evs",
        zero,
        lambda a, e: F.when(
            (e.idx == a.stage) & ((a.stage == F.lit(0)) | (e.us > a.us)),
            F.struct((a.stage + F.lit(1)).alias("stage"), e.us.alias("us")),
        ).otherwise(a),
    )
    return arr.select(
        "uid",
        folded.stage.alias("stages_reached"),
        folded.us.alias("reached_us"),
    )


def funnel_sql(
    events_sql: str,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`funnel` in the chained closed form:
    t_0 = min ts of step 0; t_i = min ts of step i with ts > t_{i-1}."""
    in_list = ", ".join(f"'{s}'" for s in steps)
    idx = "CASE " + " ".join(
        f"WHEN {step_col} = '{s}' THEN {i}" for i, s in enumerate(steps)
    ) + " END"
    ctes = [
        f"s AS (SELECT {user_col} AS u, epoch_us({ts_col}) AS us, {idx} AS idx"
        f" FROM ({events_sql}) WHERE {step_col} IN ({in_list}))",
        "t0 AS (SELECT u, min(us) AS r FROM s WHERE idx = 0 GROUP BY u)",
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"t{i} AS (SELECT s.u, min(s.us) AS r FROM s"
            f" JOIN t{i - 1} p ON s.u = p.u AND s.us > p.r"
            f" WHERE s.idx = {i} GROUP BY s.u)"
        )
    n = len(steps)
    stage = "CASE " + " ".join(
        f"WHEN t{i}.r IS NOT NULL THEN {i + 1}" for i in range(n - 1, -1, -1)
    ) + " ELSE 0 END"
    reached = "coalesce(" + ", ".join(f"t{i}.r" for i in range(n - 1, -1, -1)) + ")"
    joins = " ".join(f"LEFT JOIN t{i} ON users.u = t{i}.u" for i in range(n))
    return (
        "WITH " + ",\n".join(ctes)
        + f",\nusers AS (SELECT DISTINCT u FROM s)\n"
        + f"SELECT users.u AS uid, CAST({stage} AS INT) AS stages_reached, "
        + f"CAST({reached} AS BIGINT) AS reached_us FROM users {joins}"
    )


def rolling_active_users(
    events: DataFrame,
    *,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing-window distinct-user counts per day (the DAU/WAU/MAU
    family): for every calendar day D with at least one active user in
    (D-window_days, D], the EXACT number of distinct users active in
    that trailing window.

    Scale shape: the per-(user, day) distinct relation is one shuffle
    and is tiny vs the event stream (bounded by users × active days);
    each active day then SCATTERS to the ``window_days`` target days it
    contributes to (bounded literal fan-out — a date-range join would
    be the quadratic trap), a second distinct collapses multi-active
    users per target window, and the final count per day is exact with
    map-side partials — no countDistinct expansion over raw events,
    never O(events × window).
    """
    day = F.to_date(F.col(ts_col))
    daily = events.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    contrib = daily.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
        ).alias("day"),
    ).distinct()
    return contrib.groupBy("day").agg(F.count(F.lit(1)).alias("active_users"))


def rolling_active_users_sql(
    events_sql: str,
    *,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`rolling_active_users`."""
    return f"""
    SELECT day, count(*) AS active_users FROM (
      SELECT DISTINCT u, CAST(d + INTERVAL (i) DAY AS DATE) AS day FROM (
        SELECT DISTINCT {user_col} AS u, CAST({ts_col} AS DATE) AS d
        FROM ({events_sql})
      ), unnest(range(0, {window_days})) AS t(i)
    ) GROUP BY day
    """


def activity_streaks(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active calendar
    days per user (the retention/engagement streak metric). Returns one
    row per streak: (user, streak_start, streak_days).

    The island key is the classic integer idiom — for each distinct
    active day, ``day - row_number`` (both integers) is constant
    exactly within a consecutive run — so no self-join, no recursion,
    and nothing float. Distinct from sessionize: calendar-day islands,
    not gap-threshold sessions.

    Scale shape: ONE shuffle on the user key; the distinct, the window
    rank, and the island groupBy all fold on that same partitioning
    (day count per user is bounded, the usual per-entity bound).
    """
    from pyspark.sql.window import Window

    daily = events.select(
        F.col(user_col).alias("uid"),
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).alias("d"),
    ).distinct()
    w = Window.partitionBy("uid").orderBy("d")
    isl = daily.withColumn("island", F.col("d") - F.row_number().over(w))
    return isl.groupBy("uid", "island").agg(
        F.date_add(F.lit("1970-01-01"), F.min("d").cast("int")).alias(
            "streak_start"
        ),
        F.count(F.lit(1)).alias("streak_days"),
    ).drop("island")


def activity_streaks_sql(
    events_sql: str,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`activity_streaks`."""
    return f"""
    SELECT uid,
           CAST(DATE '1970-01-01' + to_days(CAST(MIN(d) AS INT)) AS TIMESTAMP)
             AS streak_start,
           count(*) AS streak_days
    FROM (
      SELECT uid, d, d - row_number() OVER (PARTITION BY uid ORDER BY d)
             AS island
      FROM (
        SELECT DISTINCT {user_col} AS uid,
               date_diff('day', DATE '1970-01-01', CAST({ts_col} AS DATE)) AS d
        FROM ({events_sql})
      )
    ) GROUP BY uid, island
    """


def markov_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """First-order Markov transition counts + integer-scaled MLE
    probabilities over per-key event sequences (the "next-page
    prediction" aggregate of clickstream analytics).

    Per key (ordered by ts, tiebreak) every adjacent event pair emits a
    (src_state, dst_state) transition; the output is one row per
    transition with its count, the source-state outgoing total, and
    p_scaled = (n_trans * scale) DIV n_from — exact integer division, so
    the graded value is bit-identical cross-engine (the float MLE is
    p_scaled / scale driver-side).

    Scale shape: ONE shuffle on the key for the lag window (the same
    Exchange sessionize uses), then a transition-key groupBy whose
    cardinality is |states|^2 — tiny — so the second Exchange is over
    partial counts (map-side combine), never over events. No collects,
    no cross join; state vocabularies at web scale (page templates,
    event taxonomies) are bounded, and the n_from totals come from a
    window over the already-collapsed transition rows, not a third pass
    over events.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        df.withColumn("_src", F.lag(state_col).over(w))
        .filter(F.col("_src").isNotNull())
        .select(
            F.col("_src").alias("src_state"),
            F.col(state_col).alias("dst_state"),
        )
    )
    counts = pairs.groupBy("src_state", "dst_state").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    tot = Window.partitionBy("src_state")
    return counts.withColumn(
        "n_from", F.sum("n_trans").over(tot).cast("long")
    ).withColumn(
        "p_scaled",
        F.expr(f"CAST(n_trans * {int(scale)} AS BIGINT) DIV n_from"),
    )


def markov_transitions_sql(
    table: str,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`markov_transitions`."""
    return f"""
    WITH pairs AS (
      SELECT lag({state_col}) OVER (PARTITION BY {key_col}
                                    ORDER BY {ts_col}, {tiebreak_col})
               AS src_state,
             {state_col} AS dst_state
      FROM {table}
    ), counts AS (
      SELECT src_state, dst_state, count(*) AS n_trans
      FROM pairs WHERE src_state IS NOT NULL
      GROUP BY src_state, dst_state
    )
    SELECT src_state, dst_state, n_trans,
           CAST(SUM(n_trans) OVER (PARTITION BY src_state) AS BIGINT)
             AS n_from,
           CAST(n_trans * {int(scale)} AS BIGINT)
             // CAST(SUM(n_trans) OVER (PARTITION BY src_state) AS BIGINT)
             AS p_scaled
    FROM counts
    """


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
    val_scale: int = 1000,
) -> DataFrame:
    """Time-weighted-average sufficient statistics per key (TWAP): each
    event's value is held until the key's next event; the last event of
    a key carries no duration and is excluded (standard TWAP-over-
    observed-interval semantics).

    Floats never cross the graded boundary: the value is integer-scaled
    FIRST (floor(value * val_scale) — floor, not cast, because Spark's
    double→bigint cast truncates while DuckDB's rounds), durations are
    exact integer milliseconds, and the output is the exact integer pair
    (num_scaled = Σ val_scaled·dur_ms, den_ms = Σ dur_ms) plus
    n_intervals; the float TWAP is num/den driver-side. Per-row products
    stay < 2^63 for |value| < 10^6 and spans < ~300 years at the default
    scale — callers with wilder domains lower val_scale.

    Scale shape: ONE shuffle on the key (lead window), then a key
    groupBy that reuses the same partitioning (Catalyst collapses the
    Exchange), integer sums with map-side partials. No joins.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    us = _micros(F.col(ts_col))
    out = (
        df.withColumn("_dur_us", F.lead(us).over(w) - us)
        .filter(F.col("_dur_us").isNotNull())
        .withColumn("_dur_ms", F.expr("_dur_us DIV 1000"))
        .withColumn(
            "_vs", F.floor(F.col(val_col) * F.lit(int(val_scale))).cast("long")
        )
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("_dur_ms").alias("den_ms"),
            F.sum(F.col("_vs") * F.col("_dur_ms")).alias("num_scaled"),
        )
    )
    return out


def time_weighted_avg_sql(
    table: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
    val_scale: int = 1000,
) -> str:
    """DuckDB twin of :func:`time_weighted_avg`."""
    return f"""
    WITH d AS (
      SELECT {key_col},
             (lead(epoch_us({ts_col})) OVER (PARTITION BY {key_col}
                                             ORDER BY {ts_col}, {tiebreak_col})
              - epoch_us({ts_col})) // 1000 AS dur_ms,
             CAST(FLOOR({val_col} * {int(val_scale)}) AS BIGINT) AS vs
      FROM {table}
    )
    SELECT {key_col},
           count(*) AS n_intervals,
           CAST(SUM(dur_ms) AS BIGINT) AS den_ms,
           CAST(SUM(vs * dur_ms) AS BIGINT) AS num_scaled
    FROM d WHERE dur_ms IS NOT NULL
    GROUP BY {key_col}
    """


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
    step_s: int = 3600,
    val_scale: int = 1000,
) -> DataFrame:
    """Resample an irregular event series onto a fixed ``step_s``-second
    grid per key with LOCF (last observation carried forward) — the
    densification step a telemetry/metrics pipeline needs before
    windowed math (a raster-like regularization of the time axis, the
    temporal sibling of the spatial cell grid).

    Semantics: each key's grid spans floor(first_event/step) ..
    floor(last_event/step) inclusive. A slot's value is the latest
    event within the slot if one exists (latest by (ts, tiebreak));
    otherwise the value carried from the nearest earlier slot with an
    event (``was_filled = 1``). The first grid slot always has an
    observation by construction, so no leading NULLs exist. Floats
    never cross the graded boundary: values are integer-scaled with
    floor() first (floor, not cast — Spark's double→bigint cast
    truncates, DuckDB's rounds).

    Scale shape: per-(key, slot) dedupe is ONE shuffle (row_number
    window); grid slots come from a per-key min/max aggregate +
    ``sequence`` explode (never a driver loop, never a cross join);
    LOCF is the union-then-window trick (obs rows sort before grid rows
    inside a slot, one ``last_value IGNORE NULLS`` window) — the same
    no-range-explosion shape as :func:`asof_join`, so the whole thing
    is 3 linear key shuffles. Grid size is span/step per key: callers
    pick ``step_s`` so span/step stays O(events) (the usual telemetry
    regime); a 100 TB run gap-filling years at 1 s resolution should
    coarsen or shard the grid, not this operator.
    """
    ev = df.select(
        F.col(key_col).alias("k"),
        # integer-exact slot index; DIV == DuckDB // for the positive
        # epochs this grid is defined over
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp))"
            f" div {1_000_000 * int(step_s)}"
        ).alias("slot"),
        F.floor(F.col(val_col) * F.lit(int(val_scale))).cast("long").alias("vs"),
        _micros(F.col(ts_col)).alias("_us"),
        F.col(tiebreak_col).alias("_tb"),
    )
    w = Window.partitionBy("k", "slot").orderBy(
        F.col("_us").desc(), F.col("_tb").desc()
    )
    obs = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("k", "slot", "vs", F.lit(1).alias("_is_obs"))
    )
    grid = (
        obs.groupBy("k")
        .agg(F.min("slot").alias("_mn"), F.max("slot").alias("_mx"))
        .select(
            "k",
            F.explode(F.sequence(F.col("_mn"), F.col("_mx"))).alias("slot"),
            F.lit(None).cast("long").alias("vs"),
            F.lit(0).alias("_is_obs"),
        )
    )
    lw = (
        Window.partitionBy("k")
        .orderBy("slot", F.col("_is_obs").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        obs.unionByName(grid)
        .withColumn("_fv", F.last("vs", ignorenulls=True).over(lw))
        .withColumn(
            "_fslot",
            F.last(
                F.when(F.col("_is_obs") == 1, F.col("slot")), ignorenulls=True
            ).over(lw),
        )
        .filter(F.col("_is_obs") == 0)
        .select(
            F.col("k").alias(key_col),
            (F.col("slot") * F.lit(int(step_s))).alias("slot_ts"),
            F.col("_fv").alias("val_scaled"),
            (F.col("_fslot") != F.col("slot")).cast("int").alias("was_filled"),
        )
    )
    return out


def gap_fill_sql(
    table: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
    step_s: int = 3600,
    val_scale: int = 1000,
) -> str:
    """DuckDB twin of :func:`gap_fill` (generate_series grid +
    ``last_value IGNORE NULLS`` LOCF)."""
    return f"""
    WITH ev AS (
      SELECT {key_col} AS k,
             epoch_us({ts_col}) // {1_000_000 * int(step_s)} AS slot,
             CAST(FLOOR({val_col} * {int(val_scale)}) AS BIGINT) AS vs,
             epoch_us({ts_col}) AS us, {tiebreak_col} AS tb
      FROM {table}
    ),
    obs AS (
      SELECT k, slot, vs FROM (
        SELECT k, slot, vs,
               row_number() OVER (PARTITION BY k, slot
                                  ORDER BY us DESC, tb DESC) AS rn
        FROM ev
      ) WHERE rn = 1
    ),
    grid AS (
      SELECT k, unnest(generate_series(mn, mx)) AS slot
      FROM (SELECT k, min(slot) AS mn, max(slot) AS mx FROM obs GROUP BY k)
    ),
    u AS (
      SELECT k, slot, vs, 1 AS is_obs, slot AS obs_slot FROM obs
      UNION ALL
      SELECT k, slot, NULL, 0, NULL FROM grid
    ),
    f AS (
      SELECT k, slot, is_obs,
             last_value(vs IGNORE NULLS) OVER w AS fv,
             last_value(obs_slot IGNORE NULLS) OVER w AS fslot
      FROM u
      WINDOW w AS (PARTITION BY k ORDER BY slot, is_obs DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT k AS {key_col},
           CAST(slot * {int(step_s)} AS BIGINT) AS slot_ts,
           fv AS val_scaled,
           CAST(fslot <> slot AS INT) AS was_filled
    FROM f WHERE is_obs = 0
    """
