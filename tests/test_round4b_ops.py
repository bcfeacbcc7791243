"""Round-4 batch-3 operators: CUSUM prefix identity, IDW fill, and
curvature keypoints — each pinned to a straight sequential/naive Python
model (house style: the oracle gate proves cross-engine exactness, these
prove the *semantics* match the textbook definition)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# CUSUM: prefix identity == sequential recursion
# --------------------------------------------------------------------------

def seq_cusum(xs, drift):
    s, out = 0, []
    for x in xs:
        s = max(0, s + x - drift)
        out.append(s)
    return out


def prefix_cusum(xs, drift):
    out, p, minp = [], 0, 0
    for x in xs:
        p += x - drift
        minp = min(minp, p)
        out.append(p - min(0, minp))
    return out


@settings(max_examples=300, deadline=None)
@given(xs=st.lists(st.integers(0, 8), max_size=30), drift=st.integers(0, 4))
def test_cusum_prefix_identity(xs, drift):
    assert prefix_cusum(xs, drift) == seq_cusum(xs, drift)


def test_cusum_alerts_spark_matches_sequential(spark):
    from geodiff_spark.operators.analytics import cusum_alerts

    rng = random.Random(7)
    rows = []
    for k in ("a", "b"):
        for h in range(60):
            for _ in range(rng.randrange(0, 5) + (4 if 30 <= h < 35 else 0)):
                rows.append((k, float(h * 3600 + rng.randrange(3600))))
    df = spark.createDataFrame(rows, "k string, sec double").select(
        "k", F.timestamp_seconds("sec").alias("ts")
    )
    got = {
        (r["k"], r["bkt"]): (r["n"], r["cusum"], r["alert"])
        for r in cusum_alerts(
            df, ["k"], "ts", bucket_seconds=3600, drift=2, threshold=5
        ).collect()
    }
    for k in ("a", "b"):
        hours = sorted({int(sec) // 3600 for kk, sec in rows if kk == k})
        counts = [sum(1 for kk, sec in rows if kk == k and int(sec) // 3600 == h)
                  for h in hours]
        ss = seq_cusum(counts, 2)
        for h, n, s in zip(hours, counts, ss):
            assert got[(k, h)] == (n, s, s > 5), (k, h)


# --------------------------------------------------------------------------
# IDW fill: known-value neighborhoods
# --------------------------------------------------------------------------

def test_idw_fill_exact_values(spark):
    from geodiff_spark.spatial.interp import idw_fill

    # samples at (0,0)=10 and (2,0)=30: cell (1,0) sees both as edge
    # neighbors (w=2 each) -> est = (10*2+30*2)*1000 // 4 = 20000;
    # cell (1,1) sees both as corner neighbors (w=1) -> 20000 too;
    # cell (-1,-1) sees only (0,0) as corner -> 10000.
    df = spark.createDataFrame([(0, 0, 10), (2, 0, 30)], "x long, y long, v long")
    got = {(r["x"], r["y"]): (r["n_neighbors"], r["est_milli"])
           for r in idw_fill(df, "x", "y", "v").collect()}
    assert got[(1, 0)] == (2, 20000)
    assert got[(1, 1)] == (2, 20000)
    assert got[(-1, -1)] == (1, 10000)
    # occupied cells are never emitted
    assert (0, 0) not in got and (2, 0) not in got
    # asymmetric mix: (1,-1) neighbors (0,0) corner w=1, (2,0) corner w=1
    assert got[(1, -1)] == (2, 20000)


def test_idw_fill_weights_edges_over_corners(spark):
    from geodiff_spark.spatial.interp import idw_fill

    # (1,0) edge-adjacent to (0,0)=0 and corner-adjacent to (2,1)=30:
    # est = (0*2 + 30*1)*1000 // 3 = 10000 (edge weight dominates)
    df = spark.createDataFrame([(0, 0, 0), (2, 1, 30)], "x long, y long, v long")
    got = {(r["x"], r["y"]): r["est_milli"]
           for r in idw_fill(df, "x", "y", "v").collect()}
    assert got[(1, 0)] == 10000


# --------------------------------------------------------------------------
# polyline keypoints: naive perpendicular-distance model
# --------------------------------------------------------------------------

def naive_keypoints(pts, tol):
    out = []
    for i, (x1, y1) in enumerate(pts):
        if i == 0 or i == len(pts) - 1:
            out.append(True)
            continue
        x0, y0 = pts[i - 1]
        x2, y2 = pts[i + 1]
        cross = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        chord2 = (x2 - x0) ** 2 + (y2 - y0) ** 2
        if chord2 == 0:
            out.append((x1 - x0) ** 2 + (y1 - y0) ** 2 > tol * tol)
        else:
            out.append(cross * cross > tol * tol * chord2)
    return out


def test_polyline_keypoints_matches_naive(spark):
    from geodiff_spark.spatial.trajectory import polyline_keypoints

    rng = random.Random(11)
    pts = [(0, 0)]
    for _ in range(60):
        x, y = pts[-1]
        pts.append((x + rng.randrange(0, 3), y + rng.randrange(-2, 3)))
    rows = [(1, i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "k long, ts long, x long, y long")
    for tol in (0, 1, 2):
        got = [
            r["is_keypoint"]
            for r in polyline_keypoints(
                df, "k", "ts", "x", "y", "ts", tol=tol
            ).orderBy("ts").collect()
        ]
        assert got == naive_keypoints(pts, tol), f"tol={tol}"


def test_polyline_keypoints_collinear_run_drops_middles(spark):
    from geodiff_spark.spatial.trajectory import polyline_keypoints

    # straight line: only endpoints are keypoints at tol=0
    rows = [(1, i, i, 2 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, ts long, x long, y long")
    got = [r["is_keypoint"] for r in polyline_keypoints(
        df, "k", "ts", "x", "y", "ts", tol=0).orderBy("ts").collect()]
    assert got == [True] + [False] * 8 + [True]


# --------------------------------------------------------------------------
# hex cube rounding: invariants + transcription parity
# --------------------------------------------------------------------------

def ref_hex_round(qm, rm):
    """Straight integer transcription of spatial/hex.py's kernel."""
    OFF = 2_000_000_000

    def rnd(x):
        return (x + 500 + OFF) // 1000 - OFF // 1000

    sm = -qm - rm
    rq, rr, rs = rnd(qm), rnd(rm), rnd(sm)
    dq, dr, ds = abs(rq * 1000 - qm), abs(rr * 1000 - rm), abs(rs * 1000 - sm)
    if rq + rr + rs != 0:
        if dq >= dr and dq >= ds:
            rq = -rr - rs
        elif dr >= ds:
            rr = -rq - rs
    return rq, rr


@settings(max_examples=500, deadline=None)
@given(qm=st.integers(-2_000_000, 2_000_000),
       rm=st.integers(-2_000_000, 2_000_000))
def test_hex_round_invariants(qm, rm):
    hq, hr = ref_hex_round(qm, rm)
    # cube constraint holds by construction; exact lattice points fix
    if qm % 1000 == 0 and rm % 1000 == 0:
        assert (hq, hr) == (qm // 1000, rm // 1000)
    # never farther than one cell on any cube axis from naive rounding
    assert abs(hq * 1000 - qm) <= 1500 and abs(hr * 1000 - rm) <= 1500


def test_hex_round_cols_matches_reference(spark):
    import random

    from geodiff_spark.spatial.hex import hex_round_cols

    rng = random.Random(3)
    rows = [(rng.randrange(-2_000_000, 2_000_000),
             rng.randrange(-2_000_000, 2_000_000)) for _ in range(500)]
    rows += [(q * 1000, r * 1000) for q in (-2, 0, 3) for r in (-1, 0, 2)]
    rows += [(500, 500), (-500, -500), (1500, -500)]  # exact .5 ties
    df = spark.createDataFrame(rows, "qm long, rm long")
    hq, hr = hex_round_cols(F.col("qm"), F.col("rm"))
    got = [(r["q"], r["r"]) for r in
           df.select(hq.alias("q"), hr.alias("r")).collect()]
    assert got == [ref_hex_round(q, r) for q, r in rows]


# --------------------------------------------------------------------------
# point-to-segment snapping: naive exact-rational model
# --------------------------------------------------------------------------

def naive_snap(points, segments, cell):
    """Exact-rational reference: same blocking, same scaled-floor
    distance, same (d2q, sid) tie-break."""
    from fractions import Fraction

    out = {}
    for pid, x, y in points:
        cx, cy = x // cell, y // cell
        best = None
        for sid, ax, ay, bx, by in segments:
            if (ax // cell, ay // cell) != (cx, cy):
                continue
            ox, oy = cx * cell, cy * cell
            px, py = x - ox, y - oy
            a = (ax - ox, ay - oy)
            b = (bx - ox, by - oy)
            abx, aby = b[0] - a[0], b[1] - a[1]
            l2 = abx * abx + aby * aby
            dot = (px - a[0]) * abx + (py - a[1]) * aby
            pa2 = (px - a[0]) ** 2 + (py - a[1]) ** 2
            pb2 = (px - b[0]) ** 2 + (py - b[1]) ** 2
            if l2 == 0 or dot <= 0:
                d2q = pa2 * 1024
            elif dot >= l2:
                d2q = pb2 * 1024
            else:
                d2q = int(Fraction((pa2 * l2 - dot * dot) * 1024, l2))
            cand = (d2q, sid)
            if best is None or cand < best:
                best = cand
        if best is not None:
            out[pid] = best[1]
    return out


def test_segment_snap_matches_naive(spark):
    import random

    from geodiff_spark.spatial.snap import snap_points

    rng = random.Random(21)
    cell = 1000
    points = [(i, rng.randrange(0, 5000), rng.randrange(0, 5000))
              for i in range(300)]
    segments = []
    for i in range(80):
        ax, ay = rng.randrange(0, 5000), rng.randrange(0, 5000)
        segments.append((i, ax, ay, ax + rng.randrange(0, 120),
                         ay + rng.randrange(0, 120)))
    # degenerate (zero-length) segment + a point exactly on a segment
    segments.append((900, 1500, 1500, 1500, 1500))
    points.append((901, 1500, 1500))
    pdf = spark.createDataFrame(points, "pid long, x long, y long")
    sdf = spark.createDataFrame(
        segments, "sid long, ax long, ay long, bx long, by long"
    )
    got = {r["pid"]: r["sid"]
           for r in snap_points(pdf, sdf, cell=cell).collect()}
    assert got == naive_snap(points, segments, cell)
