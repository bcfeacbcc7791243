"""Round-3 batch-3 operators: cell-set compaction, funnel analysis,
grid-DBSCAN. Graded oracle parity lives in test_entry_oracle.py; these
cover the edge cases the sf0.01 replay can't isolate."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from geodiff_spark.spatial.cells import MODE_BIT, RES_SHIFT
from geodiff_spark.spatial.compact import compact_cells, uncompact_cells
from geodiff_spark.spatial.dbscan import dbscan
from geodiff_spark.operators.temporal import funnel


def _cell(x: int, y: int, res: int) -> int:
    def spread(v):
        m = 0
        for i in range(26):
            m |= ((v >> i) & 1) << (2 * i)
        return m

    return MODE_BIT | (res << RES_SHIFT) | spread(x) | (spread(y) << 1)


def test_compact_incomplete_group_never_promoted(spark):
    # 3 of 4 siblings -> stays at res 3
    cells = [(_cell(x, 0, 3),) for x in (0, 1)] + [(_cell(0, 1, 3),)]
    df = spark.createDataFrame(cells, "cell long")
    out = compact_cells(df, res=3, min_res=0).collect()
    assert sorted(r.cell for r in out) == sorted(c for (c,) in cells)


def test_compact_duplicates_dont_fake_full_groups(spark):
    # the SAME sibling twice + one other must not count as 4
    cells = [(_cell(0, 0, 3),)] * 3 + [(_cell(1, 0, 3),)]
    df = spark.createDataFrame(cells, "cell long")
    out = sorted(r.cell for r in compact_cells(df, res=3, min_res=0).collect())
    assert out == sorted({_cell(0, 0, 3), _cell(1, 0, 3)})


def test_compact_cascades_to_min_res_floor(spark):
    # a full 4x4 block at res 2 = the whole res-0 world, but min_res=1
    # must stop the cascade at res 1 (4 cells), not res 0
    df = spark.createDataFrame(
        [(_cell(x, y, 2),) for x in range(4) for y in range(4)], "cell long"
    )
    out = [r.cell for r in compact_cells(df, res=2, min_res=1).collect()]
    assert sorted(out) == sorted(_cell(x, y, 1) for x in range(2) for y in range(2))


def test_compact_groups_isolated(spark):
    # tile A has the full sibling group, tile B only half of it
    full = [(0, _cell(x, y, 3)) for x in (0, 1) for y in (0, 1)]
    half = [(1, _cell(0, 0, 3)), (1, _cell(1, 0, 3))]
    df = spark.createDataFrame(full + half, "tile_id int, cell long")
    out = compact_cells(df, res=3, min_res=0, group_cols=("tile_id",)).collect()
    a = sorted(r.cell for r in out if r.tile_id == 0)
    b = sorted(r.cell for r in out if r.tile_id == 1)
    assert a == [_cell(0, 0, 2)]
    assert b == sorted(c for _, c in half)


def test_uncompact_mixed_resolutions(spark):
    df = spark.createDataFrame(
        [(_cell(0, 0, 1),), (_cell(2, 3, 3),)], "cell long"
    )
    out = sorted(r.cell for r in uncompact_cells(df, res=3).collect())
    want = [_cell(x, y, 3) for x in range(4) for y in range(4)] + [_cell(2, 3, 3)]
    assert out == sorted(want)


def _funnel_map(spark, rows):
    ev = spark.createDataFrame(rows, "user_id long, ts string, event_type string")
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return {
        r.uid: (r.stages_reached, r.reached_us)
        for r in funnel(ev, ["a", "b", "c"]).collect()
    }


def test_funnel_strict_order_and_ties(spark):
    got = _funnel_map(
        spark,
        [
            # u1: b BEFORE a never counts; b at ts == t1 never counts
            (1, "2024-01-01 00:00:00", "b"),
            (1, "2024-01-01 00:00:05", "a"),
            (1, "2024-01-01 00:00:05", "b"),
            (1, "2024-01-01 00:00:09", "b"),
            (1, "2024-01-01 00:00:09", "c"),  # same ts as stage-2: rejected
            # u2: full funnel
            (2, "2024-01-01 00:00:01", "a"),
            (2, "2024-01-01 00:00:02", "b"),
            (2, "2024-01-01 00:00:03", "c"),
            # u3: only mid-funnel events -> stage 0, NULL ts
            (3, "2024-01-01 00:00:01", "b"),
            (3, "2024-01-01 00:00:02", "c"),
        ],
    )
    t = lambda s: int(s * 1_000_000)
    base = 1704067200  # 2024-01-01 UTC
    assert got[1] == (2, t(base + 9))
    assert got[2] == (3, t(base + 3))
    assert got[3] == (0, None)


def test_funnel_takes_min_qualifying_ts_not_last(spark):
    got = _funnel_map(
        spark,
        [
            (7, "2024-01-01 00:00:01", "a"),
            (7, "2024-01-01 00:00:02", "b"),
            (7, "2024-01-01 00:00:50", "b"),  # later b must not displace
            (7, "2024-01-01 00:00:10", "c"),  # qualifies vs the FIRST b
        ],
    )
    assert got[7][0] == 3
    assert got[7][1] == (1704067200 + 10) * 1_000_000


def _db(spark, pts, eps, min_pts):
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    return {
        r.pid: (r.component, r.is_core)
        for r in dbscan(
            df, eps=eps, min_pts=min_pts, res=7, id_col="pid"
        ).collect()
    }


def test_dbscan_two_clusters_border_noise(spark):
    pts = [
        # cluster A: 3 mutual neighbors (min_pts=3 incl. self -> core)
        (1, 0.0, 0.0),
        (2, 0.0, 0.3),
        (3, 0.3, 0.0),
        # border: within eps of core 2 only (d²=.90), own degree 2 < 3
        (4, 0.3, 1.2),
        # noise: isolated
        (9, 50.0, 50.0),
        # cluster B across the grid
        (10, 20.0, 20.0),
        (11, 20.0, 20.4),
        (12, 20.4, 20.0),
    ]
    got = _db(spark, pts, eps=1.0, min_pts=3)
    assert got[1] == (1, True) and got[2] == (1, True) and got[3] == (1, True)
    assert got[4] == (1, False)  # border inherits A
    assert 9 not in got  # noise dropped
    assert got[10] == (10, True) and got[11] == (10, True) and got[12] == (10, True)


def test_dbscan_border_tie_resolves_to_min_component(spark):
    # two 4-cliques; the tie point reaches exactly ONE core of each
    # (degree 3 < min_pts=4, so it stays border) and takes the min
    pts = [
        (1, 0.0, 0.0), (2, 0.0, 0.2), (3, 0.2, 0.0), (4, -0.2, 0.0),
        (21, 0.0, 2.3), (22, 0.0, 2.1), (23, 0.2, 2.3), (24, -0.2, 2.3),
        (50, 0.0, 1.15),  # eps-reaches only cores 2 (d²=.9025) and 22
    ]
    got = _db(spark, pts, eps=1.0, min_pts=4)
    assert {got[i] for i in (1, 2, 3, 4)} == {(1, True)}
    assert {got[i] for i in (21, 22, 23, 24)} == {(21, True)}
    assert got[50] == (1, False)


def test_dbscan_lon_wraparound_cells_dont_crash(spark):
    # points straddling the antimeridian: ring wraps, distance refine
    # is planar-degree so the pair is NOT merged (documented metric)
    pts = [(1, 0.0, 179.9), (2, 0.0, -179.9), (3, 0.1, 179.9), (4, 0.1, -179.9)]
    got = _db(spark, pts, eps=1.0, min_pts=2)
    comps = {got[1][0], got[2][0]}
    assert len(comps) == 2  # two separate pairs, no wrap merge


from geodiff_spark.operators.graph import triangle_counts
from geodiff_spark.operators.retrieval import phrase_occurrences
from geodiff_spark.spatial.tiles import focal_stats


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.n_triangles for r in triangle_counts(df).collect()}


def test_triangle_counts_k4_with_noise_edges(spark):
    # K4: every node sits in 3 triangles; self-loops, duplicates and
    # reversed edges must not change the count
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(2, 2), (0, 1), (1, 0)]
    assert _tri(spark, noisy) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_star_has_none(spark):
    # hub with 5 leaves: wedges exist at the hub but never close
    assert _tri(spark, [(0, i) for i in range(1, 6)]) == {}


def test_triangle_counts_two_sharing_an_edge(spark):
    # triangles (0,1,2) and (1,2,3) share edge (1,2)
    got = _tri(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    assert got == {0: 1, 1: 2, 2: 2, 3: 1}


def test_focal_stats_wrap_and_clamp(spark):
    # res-2 grid (4x4): (0,0) and (3,0) are lon-wrap neighbors; y
    # clamps at the bottom row (ring shrinks, no phantom cells)
    raster = [
        (_cell(0, 0, 2), 10),
        (_cell(3, 0, 2), 5),
        (_cell(1, 2, 2), 7),  # isolated: no cell within chebyshev-1
    ]
    df = spark.createDataFrame(raster, "cell long, value long")
    got = {r.cell: (r.focal_sum, r.focal_n) for r in focal_stats(df, k=1).collect()}
    assert got[_cell(0, 0, 2)] == (15, 2)  # self + wrap neighbor
    assert got[_cell(3, 0, 2)] == (15, 2)
    assert got[_cell(1, 2, 2)] == (7, 1)  # just itself


def test_focal_stats_k2_reach(spark):
    raster = [(_cell(0, 0, 3), 1), (_cell(2, 0, 3), 100)]
    df = spark.createDataFrame(raster, "cell long, value long")
    k1 = {r.cell: r.focal_sum for r in focal_stats(df, k=1).collect()}
    k2 = {r.cell: r.focal_sum for r in focal_stats(df, k=2).collect()}
    assert k1[_cell(0, 0, 3)] == 1 and k2[_cell(0, 0, 3)] == 101


def _phrases(spark, rows, phrase):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r.n_matches
        for r in phrase_occurrences(df, phrase, "doc_id", "text").collect()
    }


def test_phrase_overlapping_and_case(spark):
    got = _phrases(
        spark,
        [
            (1, "a a a a"),        # overlapping: 3 matches of "a a"
            (2, "A  a"),           # lowercased + multi-space: 1
            (3, "a"),              # shorter than the phrase: dropped
            (4, "b a b a"),        # no consecutive "a a"
        ],
        ["a", "a"],
    )
    assert got == {1: 3, 2: 1}


def test_phrase_trigram_exact_positions(spark):
    got = _phrases(
        spark,
        [(1, "x slow hash batch y slow hash batch"), (2, "slow hash x batch")],
        ["slow", "hash", "batch"],
    )
    assert got == {1: 2}


from geodiff_spark.operators.lm import dsir_weights


def test_dsir_weights_prefer_target_like_docs(spark):
    # target corpus speaks "x y"; doc 1 mimics it, doc 2 doesn't
    src = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b a b a b"), (3, "x y a b")],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(100, "x y x y x y x y")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.weight_sum_scaled)
        for r in dsir_weights(src, tgt, "doc_id", "text").collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1][0] == 5 and got[2][0] == 5
    # per-bigram avg ratio strictly ordered: pure-target > mixed > off-target
    avg = {k: v[1] / v[0] for k, v in got.items()}
    assert avg[1] > avg[3] > avg[2]


def test_dsir_weights_docs_without_bigrams_emit_no_row(spark):
    src = spark.createDataFrame(
        [(1, "only"), (2, ""), (3, "two tokens")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame([(9, "two tokens")], "doc_id long, text string")
    got = dsir_weights(src, tgt, "doc_id", "text").collect()
    assert {r.doc_id for r in got} == {3}


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    import shutil

    from geodiff_spark.operators.sketch import M57, hll_sketch
    from geodiff_spark.streaming.sketch import hll_stream

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf}/events.parquet", src / "part-0.parquet")
    q = (
        hll_stream(
            spark.readStream.schema(ev.schema).parquet(str(src)),
            ["event_type"],
            F.col("user_id") % M57,
            window="1 hour",
            p=6,
        )
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_stream_hll")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (str(r.start), r.event_type, r.reg): r.max_rho
        for r in spark.table("t_stream_hll")
        .select(F.col("window.start").alias("start"), "event_type", "reg", "max_rho")
        .collect()
    }
    batch = ev.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    want = {
        (str(r.hour), r.event_type, r.reg): r.max_rho
        for r in hll_sketch(
            batch, ["hour", "event_type"], F.col("user_id") % M57, p=6
        ).collect()
    }
    assert got == want and len(got) > 0


def test_rolling_active_users_window_edges(spark):
    from geodiff_spark.operators.temporal import rolling_active_users

    ev = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00"),
            ("u1", "2024-01-01 11:00:00"),  # same user+day: once
            ("u2", "2024-01-08 10:00:00"),  # 7 days later: u1 aged out
        ],
        "user_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        str(r.day): r.active_users
        for r in rolling_active_users(ev, window_days=7).collect()
    }
    assert got["2024-01-01"] == 1
    assert got["2024-01-07"] == 1  # u1 still inside (D-6..D]
    assert got["2024-01-08"] == 1  # only u2: u1's last activity aged out
    assert got["2024-01-14"] == 1  # u2's last covered day
    assert "2024-01-15" not in got


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_funnel_plan_single_exchange(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a")], "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plan = _plan(funnel(ev, ["a", "b"]))
    assert plan.count("Exchange") == 1  # ONE user-key shuffle, no joins
    assert "Join" not in plan


def test_anchor_topk_plan_two_exchanges_no_join(spark):
    from geodiff_spark.operators.graph import anchor_topk

    edges = spark.createDataFrame([(1, "x")], "dst long, anchor string")
    plan = _plan(anchor_topk(edges, 2))
    # collapse shuffle + ONE window partitioning (rank and total share it)
    assert plan.count("Exchange") == 2
    assert "Join" not in plan


def test_rolling_active_plan_no_join(spark):
    from geodiff_spark.operators.temporal import rolling_active_users

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plan = _plan(rolling_active_users(ev))
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_phrase_search_plan_zero_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = _plan(phrase_occurrences(docs, ["a", "b"], "doc_id", "text"))
    assert "Exchange" not in plan and "Join" not in plan


def test_focal_stats_plan_one_aggregate_exchange(spark):
    raster = spark.createDataFrame([(_cell(0, 0, 2), 1)], "cell long, value long")
    plan = _plan(focal_stats(raster, k=1))
    # scatter explode is shuffle-free; fold is one Exchange; the join
    # back to the present-cell set rides the same partitioning (AQE may
    # broadcast the tiny side here — accept either, but never cartesian)
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 3


from geodiff_spark.operators.graph import k_core


def _kc(spark, edges, k):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.core_deg for r in k_core(df, k).collect()}


def test_k_core_lollipop_cascade(spark):
    # cycle 0-1-2-3-0 with a pendant path 3-4-5-6: the path peels one
    # node per round (degree-1 tip each time) — a true multi-round
    # cascade; the cycle survives k=2 with in-core degree 2
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    path = [(3, 4), (4, 5), (5, 6)]
    got = _kc(spark, cyc + path, 2)
    assert got == {0: 2, 1: 2, 2: 2, 3: 2}


def test_k_core_above_max_degree_is_empty(spark):
    assert _kc(spark, [(0, 1), (1, 2), (2, 0)], 3) == {}


def test_k_core_noise_edges_canonicalized(spark):
    tri = [(0, 1), (1, 2), (2, 0)]
    noisy = tri + [(1, 0), (2, 2), (0, 1)]
    assert _kc(spark, noisy, 2) == {0: 2, 1: 2, 2: 2}


def test_k_core_matches_python_peeling_batch(spark):
    import random

    def py_k_core(edges, k):
        e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        while True:
            deg = {}
            for a, b in e:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            alive = {n for n, d in deg.items() if d >= k}
            e2 = {(a, b) for a, b in e if a in alive and b in alive}
            if e2 == e:
                break
            e = e2
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        return deg

    rng = random.Random(405)
    all_edges, want = [], {}
    for case in range(25):
        n = rng.randint(4, 10)
        base = case * 1000
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.4
        ]
        for a, b in edges:
            all_edges.append((base + a, base + b))
        for node, d in py_k_core(edges, 2).items():
            want[base + node] = d
    if not all_edges:
        return
    df = spark.createDataFrame(all_edges, "src long, dst long")
    got = {r.node: r.core_deg for r in k_core(df, 2).collect()}
    assert got == want


def test_trimmed_agg_cuts_and_ties(spark):
    from geodiff_spark.operators.corpus import trimmed_agg

    # group g: values 1..10 -> trim 10% = 1 off each end -> keep 2..9
    rows = [("g", v, v) for v in range(1, 11)]
    # group t: 3 rows, trim floor(3/10)=0 -> keep all; ties broken by id
    rows += [("t", 5, 1), ("t", 5, 2), ("t", 9, 3)]
    df = spark.createDataFrame(rows, "lang string, v long, doc_id long")
    got = {
        r.lang: (r.n_total, r.n_kept, r.kept_sum)
        for r in trimmed_agg(df, "lang", "v", "doc_id", 1, 10).collect()
    }
    assert got["g"] == (10, 8, sum(range(2, 10)))
    assert got["t"] == (3, 3, 19)


def test_trimmed_agg_heavy_trim_can_empty_group(spark):
    from geodiff_spark.operators.corpus import trimmed_agg

    # trim 1/2 from each end of a 2-row group -> nothing kept, no row
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 100, 2), ("b", 1, 1), ("b", 2, 2), ("b", 300, 3)],
        "lang string, v long, doc_id long",
    )
    got = {
        r.lang: (r.n_kept, r.kept_sum)
        for r in trimmed_agg(df, "lang", "v", "doc_id", 1, 2).collect()
    }
    assert "a" not in got  # 2 - 2*1 = 0 kept
    assert got["b"] == (1, 2)  # keeps only the median


def test_activity_streaks_islands_and_gaps(spark):
    from geodiff_spark.operators.temporal import activity_streaks

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00"),
            (1, "2024-01-02 23:00:00"),
            (1, "2024-01-02 01:00:00"),  # same day twice: one island day
            (1, "2024-01-03 00:00:01"),
            (1, "2024-01-05 12:00:00"),  # gap -> new streak
            (2, "2024-02-10 00:00:00"),
        ],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.uid, str(r.streak_start)): r.streak_days
        for r in activity_streaks(ev).collect()
    }
    assert got == {
        (1, "2024-01-01"): 3,
        (1, "2024-01-05"): 1,
        (2, "2024-02-10"): 1,
    }


def test_pmi_collocations_favors_cooccurring_pair(spark):
    from geodiff_spark.operators.lm import pmi_collocations

    # "x y" always together (4 docs); "a" everywhere (8 docs) so (a, b)
    # pairs are expected-at-chance; min_count=2
    rows = [(i, "x y filler%d" % i) for i in range(4)]
    rows += [(10 + i, "a b other%d" % i) for i in range(4)]
    rows += [(20 + i, "a c more%d" % i) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.w1, r.w2): (r.c12, r.c1, r.c2, r.pmi_scaled)
        for r in pmi_collocations(
            df, "doc_id", "text", max_tokens_per_doc=20, min_count=2
        ).collect()
    }
    # (x, y): c12=4, c1=c2=4, N=12 -> ratio = 4*12/16 = 3.0
    assert got[("x", "y")] == (4, 4, 4, 3_000_000)
    # (a, b): c12=4, c1=8, c2=4 -> ratio = 4*12/32 = 1.5
    assert got[("a", "b")] == (4, 8, 4, 1_500_000)
    assert got[("x", "y")][3] > got[("a", "b")][3]


def test_pmi_token_cap_is_deterministic_lexicographic(spark):
    from geodiff_spark.operators.lm import pmi_collocations

    # cap=2 keeps the two lexicographically smallest distinct tokens
    df = spark.createDataFrame(
        [(1, "z m a q"), (2, "z m a q")], "doc_id long, text string"
    )
    got = {
        (r.w1, r.w2)
        for r in pmi_collocations(
            df, "doc_id", "text", max_tokens_per_doc=2, min_count=2
        ).collect()
    }
    assert got == {("a", "m")}


def test_hop_distances_bfs_semantics(spark):
    from geodiff_spark.operators.graph import hop_distances

    # path 0-1-2-3 plus shortcut 0-3: BFS dist(3) must be 1, not 3;
    # node 9 unreachable -> absent
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3), (8, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in hop_distances(edges, seeds).collect()}
    assert got == {0: 0, 1: 1, 3: 1, 2: 2}


def test_hop_distances_multi_source_takes_min(spark):
    from geodiff_spark.operators.graph import hop_distances

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (4,)], "node long")
    got = {r.node: r.dist for r in hop_distances(edges, seeds).collect()}
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_top_p_mass_boundary_row_included(spark):
    from geodiff_spark.operators.corpus import top_p_mass

    # weights 50, 30, 15, 5 — 80% of 100 = 80: prefix 50+30=80 reaches
    # it ONLY with the second row (before it: 50 < 80 keep; before the
    # third: 80 !< 80 -> cut)
    df = spark.createDataFrame(
        [("g", 1, 50), ("g", 2, 30), ("g", 3, 15), ("g", 4, 5)],
        "lang string, doc_id long, wgt long",
    )
    got = {
        r.doc_id: r.cum_weight
        for r in top_p_mass(df, "lang", "wgt", "doc_id", 8, 10).collect()
    }
    assert got == {1: 50, 2: 80}


def test_top_p_mass_ties_deterministic(spark):
    from geodiff_spark.operators.corpus import top_p_mass

    # equal weights: id ascending breaks ties; p=1/2 of 40 = 20
    df = spark.createDataFrame(
        [("g", i, 10) for i in (4, 2, 3, 1)], "lang string, doc_id long, wgt long"
    )
    got = sorted(
        r.doc_id for r in top_p_mass(df, "lang", "wgt", "doc_id", 1, 2).collect()
    )
    assert got == [1, 2]


def test_autocorr_stats_hand_raster(spark):
    from geodiff_spark.spatial.tiles import autocorr_stats

    # two adjacent cells (values 2, 3) + one isolated (value 5):
    # ordered pairs = 2, products sum = 2*3 + 3*2 = 12
    raster = [(_cell(0, 0, 3), 2), (_cell(1, 0, 3), 3), (_cell(5, 5, 3), 5)]
    df = spark.createDataFrame(raster, "cell long, value long")
    r = autocorr_stats(df, k=1).collect()[0]
    assert (r.n_cells, r.sum_v, r.sum_v2, r.n_pairs, r.sum_products) == (
        3, 10, 38, 2, 12,
    )
