"""Property tests for the batch-3/4 operators: cell-set compaction,
funnel, triangle counting.

Same split as test_rebase_property.py: hypothesis sweeps pin the math
against straight-Python reference models (cheap, hundreds of cases);
one seeded randomized BATCH then runs the real DataFrame
implementation — cases are packed into a single DataFrame (compact:
one group per case; funnel: one user per case; triangles: disjoint
node-id ranges per case) so the whole sweep costs one Spark job per
operator, not one per example.
"""

from __future__ import annotations

import random
from itertools import combinations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from geodiff_spark.operators.graph import triangle_counts
from geodiff_spark.operators.temporal import funnel
from geodiff_spark.spatial.cells import MODE_BIT, RES_SHIFT
from geodiff_spark.spatial.compact import compact_cells, uncompact_cells


# --------------------------------------------------------------------------
# pure-Python reference models
# --------------------------------------------------------------------------

def _spread(v: int) -> int:
    m = 0
    for i in range(26):
        m |= ((v >> i) & 1) << (2 * i)
    return m


def mk_cell(x: int, y: int, res: int) -> int:
    return MODE_BIT | (res << RES_SHIFT) | _spread(x) | (_spread(y) << 1)


MORTON_MASK = (1 << RES_SHIFT) - 1


def py_compact(cells: set[int], res: int, min_res: int) -> set[int]:
    cur = set(cells)
    out: set[int] = set()
    for r in range(res, min_res, -1):
        parents: dict[int, int] = {}
        for c in cur:
            p = (MODE_BIT | ((r - 1) << RES_SHIFT)) | ((c & MORTON_MASK) >> 2)
            parents[p] = parents.get(p, 0) + 1
        nxt = {p for p, n in parents.items() if n == 4}
        out |= {
            c
            for c in cur
            if ((MODE_BIT | ((r - 1) << RES_SHIFT)) | ((c & MORTON_MASK) >> 2))
            not in nxt
        }
        cur = nxt
    return out | cur


def py_uncompact(cells: set[int], res: int) -> set[int]:
    out: set[int] = set()
    for c in cells:
        r = (c >> RES_SHIFT) & 31
        dr = res - r
        base = (MODE_BIT | (res << RES_SHIFT)) | ((c & MORTON_MASK) << (2 * dr))
        out |= {base + j for j in range(1 << (2 * dr))}
    return out


def py_triangles(edges: list[tuple[int, int]]) -> dict[int, int]:
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {n for ab in e for n in ab}
    adj = {n: set() for n in nodes}
    for a, b in e:
        adj[a].add(b)
        adj[b].add(a)
    counts: dict[int, int] = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def py_funnel(events: list[tuple[int, str]], n_steps: int) -> tuple[int, int | None]:
    """events: (ts_us, step_name 'sN'); returns (stage, reached_us)."""
    stage, reached = 0, None
    for us, step in sorted(events):
        if step == f"s{stage}" and (stage == 0 or us > reached):
            stage += 1
            reached = us
            if stage == n_steps:
                break
    return stage, reached


# --------------------------------------------------------------------------
# hypothesis sweeps: reference-model invariants (no Spark)
# --------------------------------------------------------------------------

cell_sets = st.sets(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=40
)


@given(cell_sets)
@settings(max_examples=200, deadline=None)
def test_py_compact_roundtrip_and_minimality(xy):
    s = {mk_cell(x, y, 3) for x, y in xy}
    comp = py_compact(s, 3, 0)
    assert py_uncompact(comp, 3) == s
    # minimality: no complete sibling group survives at any level
    by_parent: dict[int, int] = {}
    for c in comp:
        r = (c >> RES_SHIFT) & 31
        if r == 0:
            continue
        p = (MODE_BIT | ((r - 1) << RES_SHIFT)) | ((c & MORTON_MASK) >> 2)
        by_parent[p] = by_parent.get(p, 0) + 1
    assert all(n < 4 for n in by_parent.values())


@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 3)), max_size=30))
@settings(max_examples=200, deadline=None)
def test_py_funnel_monotone_stage_times(evs):
    events = [(us * 1_000_000, f"s{i}") for us, i in evs]
    stage, reached = py_funnel(events, 3)
    assert 0 <= stage <= 3
    if stage == 0:
        assert reached is None
    else:
        # reached is a ts of the stage-(stage-1) step
        assert any(
            us == reached and step == f"s{stage - 1}" for us, step in events
        )


# --------------------------------------------------------------------------
# seeded randomized batches against the real DataFrame implementations
# --------------------------------------------------------------------------

def test_compact_cells_matches_reference_batch(spark):
    rng = random.Random(401)
    cases = {}
    rows = []
    for case in range(60):
        res = rng.choice([2, 3, 4])
        hi = (1 << res) - 1
        n = rng.randint(1, min(40, (hi + 1) ** 2))
        s = {
            mk_cell(rng.randint(0, hi), rng.randint(0, hi), res)
            for _ in range(n)
        }
        cases[case] = (s, res)
        rows += [(case, c) for c in s]
    # batch by resolution (compact_cells takes one res per call)
    got: dict[int, set[int]] = {}
    for res in (2, 3, 4):
        sub = [(k, c) for k, cs in cases.items() if cs[1] == res for c in cs[0]]
        if not sub:
            continue
        df = spark.createDataFrame(sub, "case int, cell long")
        out = compact_cells(df, res=res, min_res=0, group_cols=("case",))
        for r in out.collect():
            got.setdefault(r.case, set()).add(r.cell)
    for case, (s, res) in cases.items():
        assert got.get(case, set()) == py_compact(s, res, 0), f"case {case}"


def test_uncompact_cells_matches_reference_batch(spark):
    rng = random.Random(402)
    rows, want = [], {}
    for case in range(40):
        r = rng.randint(0, 3)
        hi = (1 << r) - 1
        c = mk_cell(rng.randint(0, hi), rng.randint(0, hi), r)
        rows.append((case, c))
        want[case] = py_uncompact({c}, 4)
    df = spark.createDataFrame(rows, "case int, cell long")
    out = uncompact_cells(df, res=4, keep_cols=("case",))
    got: dict[int, set[int]] = {}
    for row in out.collect():
        got.setdefault(row.case, set()).add(row.cell)
    assert got == want


def test_triangle_counts_matches_bruteforce_batch(spark):
    rng = random.Random(403)
    all_edges, want = [], {}
    for case in range(30):
        n = rng.randint(3, 9)
        base = case * 1000
        edges = [
            (a, b)
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < 0.45
        ]
        rng.shuffle(edges)
        for a, b in edges:
            all_edges.append((base + a, base + b))
        for node, cnt in py_triangles(edges).items():
            want[base + node] = cnt
    df = spark.createDataFrame(all_edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == want


def test_funnel_matches_reference_batch(spark):
    rng = random.Random(404)
    rows, want = [], {}
    for user in range(150):
        n = rng.randint(0, 12)
        evs = [
            (rng.randint(0, 50), f"s{rng.randint(0, 2)}") for _ in range(n)
        ]
        # second-resolution timestamps; reference works in micros
        want[user] = py_funnel(
            [((1704067200 + s) * 1_000_000, step) for s, step in evs], 3
        )
        rows += [
            (user, f"2024-01-01 00:00:{s:02d}" if s < 60 else None, step)
            for s, step in evs
        ]
    rows = [(u, t, s) for u, t, s in rows if t is not None]
    if not rows:
        return
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.uid: (r.stages_reached, r.reached_us)
        for r in funnel(ev, ["s0", "s1", "s2"]).collect()
    }
    for user, (stage, reached) in want.items():
        if user not in got:
            # users with zero step events emit no row
            assert stage == 0 and all(u != user for u, _, _ in rows)
        else:
            assert got[user] == (stage, reached), f"user {user}"
