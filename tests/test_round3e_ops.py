"""Round-3e operators: gap-fill LOCF, synchronous label propagation,
blocked record linkage — Python-reference property checks (the
exact-value DuckDB oracles live in test_entry_oracle.py)."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F


# --- gap_fill ---------------------------------------------------------------

def _py_gap_fill(rows, step_s, scale):
    """rows: (key, epoch_us, value, tiebreak)."""
    by_key = defaultdict(dict)  # key -> slot -> (us, tb, vs)
    import math

    for k, us, v, tb in rows:
        slot = us // (1_000_000 * step_s)
        vs = math.floor(v * scale)
        cur = by_key[k].get(slot)
        if cur is None or (us, tb) > (cur[0], cur[1]):
            by_key[k][slot] = (us, tb, vs)
    out = []
    for k, slots in by_key.items():
        lo, hi = min(slots), max(slots)
        last_vs, last_slot = None, None
        for s in range(lo, hi + 1):
            if s in slots:
                last_vs, last_slot = slots[s][2], s
            out.append((k, s * step_s, last_vs, int(last_slot != s)))
    return sorted(out)


def test_gap_fill_matches_python_reference(spark):
    from geodiff_spark.operators.temporal import gap_fill

    base = 1_700_000_000_000_000  # positive epoch_us
    step = 60
    rows = [
        # key 1: events in slots 0, 0 (two, later wins), 3
        (1, base + 5_000_000, 1.5, 10),
        (1, base + 50_000_000, 2.5, 11),
        (1, base + 3 * 60_000_000 + 1, -0.75, 12),
        # key 2: single event — one grid slot, never filled
        (2, base + 7_000_000, 9.99, 13),
        # key 1: same-us tie broken by larger tiebreak
        (1, base + 50_000_000, 4.5, 14),
    ]
    df = spark.createDataFrame(
        [(k, us, v, tb) for k, us, v, tb in rows],
        "k long, us long, v double, tb long",
    ).select(
        "k", F.timestamp_micros(F.col("us")).alias("ts"), "v", "tb"
    )
    got = sorted(
        tuple(r)
        for r in gap_fill(df, "k", "ts", "v", "tb", step_s=step).collect()
    )
    # the grid is anchored at absolute epoch slots, so the python
    # reference uses the same absolute microseconds
    want = _py_gap_fill(rows, step, 1000)
    assert got == want
    # the base epoch is 20 s into an absolute slot, so key 1's events
    # land in slots S, S+1, S+3 — exactly one carried slot (S+2), and
    # it carries slot S+1's same-us tie-winner (tb 14 -> 4.5)
    carried = [r for r in got if r[0] == 1 and r[3] == 1]
    assert len(carried) == 1 and carried[0][2] == 4500


# --- label_prop -------------------------------------------------------------

def _py_label_prop(edges, nodes, iters):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    nbrs = defaultdict(list)
    for a, b in und:
        nbrs[b].append(a)  # a's label flows to b
    lab = {n: n for n in nodes}
    for _ in range(iters):
        new = dict(lab)
        for v in nodes:
            if nbrs[v]:
                c = Counter(lab[u] for u in nbrs[v])
                top = max(c.values())
                new[v] = min(l for l, k in c.items() if k == top)
        lab = new
    return lab


def test_label_prop_matches_python_reference(spark):
    from geodiff_spark.operators.graph import label_prop

    # two triangles + a bridge + an isolated self-loop node
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10),
             (2, 10), (99, 99)]
    nodes = sorted({x for e in edges for x in e})
    e_df = spark.createDataFrame(edges, "src long, dst long")
    n_df = spark.createDataFrame([(n,) for n in nodes], "node long")
    got = {r["node"]: r["label"] for r in label_prop(e_df, n_df, iters=4).collect()}
    want = _py_label_prop(edges, nodes, 4)
    assert got == want
    # the two triangles end in the same small labels; the self-loop
    # node (no real neighbors) keeps its own label
    assert got[99] == 99


def test_label_prop_tie_breaks_to_smallest_label(spark):
    from geodiff_spark.operators.graph import label_prop

    # node 5 sees labels {1, 2} once each -> adopts 1
    edges = [(1, 5), (2, 5)]
    e_df = spark.createDataFrame(edges, "src long, dst long")
    n_df = spark.createDataFrame([(1,), (2,), (5,)], "node long")
    got = {r["node"]: r["label"] for r in label_prop(e_df, n_df, iters=1).collect()}
    assert got[5] == 1


# --- record_linkage ---------------------------------------------------------

def test_record_linkage_blocks_and_jaccard(spark):
    from geodiff_spark.operators.dedup import record_linkage

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en", "a", 100),
            (2, "the quick brown fox jumps", "en", "a", 110),
            (3, "the quick brown fox", "de", "a", 100),      # other block
            (4, "completely different words here", "en", "a", 105),
            (5, "the quick brown fox", "en", "a", 600),      # other len bucket
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.n_union)
        for r in record_linkage(
            docs, block_cols=("lang",), len_bucket=64, tau_pct=50
        ).collect()
    }
    # only (1,2) links: same block (en, bucket 1), jaccard 4/5 >= 0.5
    assert got == {(1, 2): (4, 5)}


def test_record_linkage_max_block_size_drops_block(spark):
    from geodiff_spark.operators.dedup import record_linkage

    docs = spark.createDataFrame(
        [(i, "same text tokens", "en", "a", 10) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert (
        record_linkage(docs, block_cols=("lang",), max_block_size=4).count()
        == 0
    )
    assert (
        record_linkage(docs, block_cols=("lang",), max_block_size=5).count()
        == 10
    )


# --- group_topk_refresh -----------------------------------------------------

def _diff_cs(spark, base_rows, mod_rows):
    """Build a changeset via the real diff operator."""
    from geodiff_spark.changeset import TableInfo
    from geodiff_spark.operators.diff import diff_table

    schema = "pk long, g long, v double, extra string"
    b = spark.createDataFrame(base_rows, schema)
    m = spark.createDataFrame(mod_rows, schema)
    info = TableInfo(name="t", columns=("pk", "g", "v", "extra"), pk=("pk",))
    return b, diff_table(b, m, info).df


def test_group_topk_refresh_patches_sparse_updates(spark):
    """An update that changes only v must keep the row's group (the
    changeset carries NULL for the unchanged group column)."""
    from geodiff_spark.operators.retrieval import group_topk_refresh

    base_rows = [(1, 10, 5.0, "a"), (2, 10, 4.0, "a"), (3, 20, 9.0, "a")]
    mod_rows = [(1, 10, 1.0, "a"), (2, 10, 4.0, "a"), (3, 20, 9.0, "a")]
    b, cs = _diff_cs(spark, base_rows, mod_rows)
    got = sorted(
        tuple(r) for r in group_topk_refresh(b, cs, "g", "v", "pk", k=2).collect()
    )
    # only group 10 is touched; pk 1 drops to rank 2 with v=1.0
    assert got == [(10, 1, 2, 4.0), (10, 2, 1, 1.0)]


def test_group_topk_refresh_group_move_touches_both(spark):
    from geodiff_spark.operators.retrieval import group_topk_refresh

    base_rows = [(1, 10, 5.0, "a"), (2, 10, 4.0, "a"), (3, 20, 9.0, "a")]
    # pk 1 moves from group 10 to group 20
    mod_rows = [(1, 20, 5.0, "a"), (2, 10, 4.0, "a"), (3, 20, 9.0, "a")]
    b, cs = _diff_cs(spark, base_rows, mod_rows)
    got = sorted(
        tuple(r) for r in group_topk_refresh(b, cs, "g", "v", "pk", k=2).collect()
    )
    assert got == [(10, 1, 2, 4.0), (20, 1, 3, 9.0), (20, 2, 1, 5.0)]


def test_group_topk_refresh_insert_delete(spark):
    from geodiff_spark.operators.retrieval import group_topk_refresh

    base_rows = [(1, 10, 5.0, "a"), (3, 20, 9.0, "a"), (4, 30, 1.0, "a")]
    # delete pk 3 (group 20 empties), insert pk 9 into group 10;
    # group 30 untouched -> absent from the refresh set
    mod_rows = [(1, 10, 5.0, "a"), (9, 10, 7.0, "a"), (4, 30, 1.0, "a")]
    b, cs = _diff_cs(spark, base_rows, mod_rows)
    got = sorted(
        tuple(r) for r in group_topk_refresh(b, cs, "g", "v", "pk", k=2).collect()
    )
    assert got == [(10, 1, 9, 7.0), (10, 2, 1, 5.0)]


# --- stay_points ------------------------------------------------------------

def _py_stay_points(rows, cell_milli, max_gap_s, min_dur_s):
    """rows: (key, us, lat, lon, tb)."""
    import math

    out = []
    by_k = defaultdict(list)
    for k, us, la, lo, tb in rows:
        cla = math.floor(la * 1000) // cell_milli
        clo = math.floor(lo * 1000) // cell_milli
        by_k[k].append((us, tb, cla, clo))
    for k, pts in by_k.items():
        pts.sort()
        runs = []
        for p in pts:
            if (
                runs
                and runs[-1][-1][2:] == p[2:]
                and p[0] - runs[-1][-1][0] <= max_gap_s * 1_000_000
            ):
                runs[-1].append(p)
            else:
                runs.append([p])
        for r in runs:
            dur_ms = (r[-1][0] - r[0][0]) // 1000
            if dur_ms >= min_dur_s * 1000:
                out.append(
                    (k, r[0][2], r[0][3], r[0][0], r[-1][0], len(r), dur_ms)
                )
    return sorted(out)


def test_stay_points_matches_python_reference(spark):
    from geodiff_spark.spatial.trajectory import stay_points

    M = 1_000_000
    rows = [
        # key 1: 3 pings in one cell within gaps -> one stay of 20 min
        (1, 100 * M, 10.0001, 20.0001, 1),
        (1, 700 * M, 10.0002, 20.0002, 2),
        (1, 1300 * M, 10.0003, 20.0003, 3),
        # then a cell change -> new (too short) episode
        (1, 1400 * M, 11.9, 20.0, 4),
        # key 2: same cell but a gap > max_gap splits the run
        (2, 0 * M, -5.0, -5.0, 5),
        (2, 600 * M, -5.0, -5.0, 6),
        (2, 5000 * M, -5.0, -5.0, 7),
    ]
    df = spark.createDataFrame(
        rows, "k long, us long, lat double, lon double, tb long"
    ).select("k", F.timestamp_micros(F.col("us")).alias("ts"), "lat", "lon", "tb")
    got = sorted(
        tuple(r)
        for r in stay_points(
            df, "k", "ts", "lat", "lon", "tb",
            cell_milli=500, max_gap_s=1000, min_duration_s=600,
        ).collect()
    )
    want = _py_stay_points(rows, 500, 1000, 600)
    assert got == want
    # two surviving stays: key 1's 20-minute run of 3 pings, and key
    # 2's first 10-minute pair (its third ping is split off by the gap
    # and alone has zero duration)
    assert [r[:1] + r[5:] for r in got] == [
        (1, 3, 1_200_000),
        (2, 2, 600_000),
    ]
