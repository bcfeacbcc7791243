"""Property tests for the as-of / interval-join family (VERDICT r03
item 7 — the rebase-property pattern applied to temporal.py).

asof_join (temporal.py) replaces a per-key sequential scan with ONE
union + last_value window carry. The subtle pieces are the tie rules:
right row at exactly left_ts matches (right sorts before left at equal
ts), right duplicates at one (key, ts) dedup by max tiebreak BEFORE the
carry, and tolerance nulls the payload without dropping the left row.
The hypothesis sweep pins a straight Python transcription of the
union+carry algorithm to the naive O(n^2) definition ("latest right
with rt <= lt on the same key") across hundreds of tie-heavy cases;
a seeded randomized batch then runs the real DataFrame implementation
against the naive model, so the math and the Spark plumbing are each
pinned where they're cheap to pin.

interval_join's bucketed-equi strategy (explode intervals to touched
buckets, probe joins its single bucket, exact refine) is pinned the
same way: replica == naive BETWEEN join, including start==end
intervals, probes exactly on bucket boundaries, and bucket widths that
don't divide the data range.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# naive definitions (the semantics, straight from the docstrings)
# --------------------------------------------------------------------------


def naive_asof(left, right, tol=None):
    """left: [(key, lt, lid)]; right: [(key, rt, payload, tb)].
    Match = payload of the latest right with rt <= lt on the key,
    dupes at one (key, rt) resolved to max tiebreak; None if no match
    (or match older than tol)."""
    out = []
    for key, lt, lid in left:
        cands = [r for r in right if r[0] == key and r[1] <= lt]
        if tol is not None:
            cands = [r for r in cands if lt - r[1] <= tol]
        if not cands:
            out.append((lid, None, None))
            continue
        mrt = max(r[1] for r in cands)
        best = max((r for r in cands if r[1] == mrt), key=lambda r: r[3])
        out.append((lid, mrt, best[2]))
    return sorted(out)


def carry_asof(left, right, tol=None):
    """Python transcription of the union + last_value window carry
    (temporal.py:118-168): dedup right per (key, rt) by max tiebreak,
    union both sides, sort by (ts, side) with right(0) before left(1),
    carry the last right struct, apply tolerance after the carry."""
    best = {}
    for key, rt, payload, tb in right:
        k = (key, rt)
        if k not in best or tb > best[k][1]:
            best[k] = (payload, tb)
    rows = [(key, rt, 0, payload) for (key, rt), (payload, _) in best.items()]
    rows += [(key, lt, 1, lid) for key, lt, lid in left]
    out = []
    for key in {r[0] for r in rows}:
        seq = sorted((r for r in rows if r[0] == key), key=lambda r: (r[1], r[2]))
        last = None
        for _, ts, side, val in seq:
            if side == 0:
                last = (ts, val)
            else:
                m = last
                if m is not None and tol is not None and ts - m[0] > tol:
                    m = None
                out.append((val, None, None) if m is None else (val, m[0], m[1]))
    return sorted(out)


def naive_interval(probe, intervals):
    """probe: [(pid, ts)]; intervals: [(iid, s, e)]; closed BETWEEN."""
    return sorted(
        (pid, iid)
        for pid, ts in probe
        for iid, s, e in intervals
        if s <= ts <= e
    )


def bucket_interval_replica(probe, intervals, g):
    """Python transcription of the bucketed-equi plan
    (temporal.py:171-237): interval -> every touched bucket, probe ->
    exactly one bucket, equi-match then exact refine."""
    by_bucket: dict[int, list] = {}
    for iid, s, e in intervals:
        for b in range(s // g, e // g + 1):
            by_bucket.setdefault(b, []).append((iid, s, e))
    out = []
    for pid, ts in probe:
        for iid, s, e in by_bucket.get(ts // g, ()):
            if s <= ts <= e:
                out.append((pid, iid))
    return sorted(out)


# --------------------------------------------------------------------------
# hypothesis sweep: replica == naive on tie-heavy tiny domains
# --------------------------------------------------------------------------

_key = st.integers(0, 1)
_ts = st.integers(0, 6)  # tiny domain -> constant equal-timestamp ties


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    left=st.lists(st.tuples(_key, _ts), max_size=8),
    right=st.lists(st.tuples(_key, _ts, st.integers(0, 99), st.integers(0, 9)),
                   max_size=8),
    tol=st.one_of(st.none(), st.integers(0, 4)),
)
def test_asof_carry_equals_naive(left, right, tol):
    left = [(k, t, i) for i, (k, t) in enumerate(left)]
    assert carry_asof(left, right, tol) == naive_asof(left, right, tol)


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    probe=st.lists(st.tuples(st.integers(0, 30), st.integers(0, 40)),
                   max_size=10),
    intervals=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 40), st.integers(0, 12)),
        max_size=10,
    ),
    g=st.integers(1, 9),
)
def test_interval_bucket_replica_equals_naive(probe, intervals, g):
    iv = [(iid, s, s + d) for iid, s, d in intervals]
    assert bucket_interval_replica(probe, iv, g) == naive_interval(probe, iv)


# --------------------------------------------------------------------------
# seeded randomized batches through the real DataFrame operators
# --------------------------------------------------------------------------


def test_asof_join_spark_matches_naive(spark):
    from geodiff_spark.operators.temporal import asof_join

    rng = random.Random(404)
    left = [
        (rng.randrange(4), rng.randrange(50), i) for i in range(150)
    ]
    right = [
        (rng.randrange(4), rng.randrange(50), rng.randrange(1000),
         rng.randrange(10))
        for _ in range(150)
    ]
    for tol in (None, 5):
        ldf = spark.createDataFrame(
            [(k, float(t), i) for k, t, i in left], "k int, lt double, lid int"
        ).select("k", F.timestamp_seconds("lt").alias("lt"), "lid")
        rdf = spark.createDataFrame(
            [(k, float(t), p, tb) for k, t, p, tb in right],
            "k int, rt double, payload int, tb int",
        ).select("k", F.timestamp_seconds("rt").alias("rt"), "payload", "tb")
        got = sorted(
            (
                r["lid"],
                None if r["match_rt"] is None else int(r["match_rt"].timestamp()),
                r["match_payload"],
            )
            for r in asof_join(
                ldf, rdf, ["k"], "lt", "rt", ["payload"],
                tiebreak_col="tb", tolerance_seconds=tol,
            ).collect()
        )
        assert got == naive_asof(left, right, tol), f"tol={tol}"


def test_interval_join_spark_matches_naive(spark):
    from geodiff_spark.operators.temporal import interval_join

    rng = random.Random(405)
    # long inputs are microseconds (as_us casts them verbatim, so the
    # bucket width is bucket_seconds * 1e6 raw units); spread values
    # over ~60 buckets with sub-second offsets so boundaries are hit
    g = 7
    us = 1_000_000
    probe = [
        (i, rng.randrange(0, 400) * us + rng.choice([0, 1, 999_999]))
        for i in range(120)
    ]
    intervals = [
        (i, s, s + rng.choice([0, 1, 3 * us, 20 * us + 5]))
        for i, s in (
            (i, rng.randrange(0, 400) * us + rng.choice([0, 17]))
            for i in range(60)
        )
    ]
    pdf = spark.createDataFrame(probe, "pid int, ts long")
    idf = spark.createDataFrame(intervals, "iid int, s long, e long")
    rows = interval_join(
        pdf, idf, probe_ts="ts", start_col="s", end_col="e",
        bucket_seconds=g, probe_cols=["pid"], interval_cols=["iid"],
    ).collect()
    got = [(r["pid"], r["iid"]) for r in rows]
    assert len(got) == len(set(got)), "bucketed join emitted duplicates"
    # bucket_seconds is seconds for timestamp inputs but raw units for
    # long inputs (as_us casts longs verbatim) -> bucket width == g
    assert sorted(got) == naive_interval(probe, intervals)
