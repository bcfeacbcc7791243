"""Round-4 additions: integer-exact multimodal kernels (the graded
pHash / audio-fingerprint twins), the fused PQ trainer, and the
skew-proof window-totals operator."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from geodiff_spark.functions.multimodal import (
    AFP_SAMPLES,
    PHASH_BASIS_Q,
    afingerprint_pcm_q,
    phash_plane,
    phash_plane_q,
)
from geodiff_spark.functions.png import decode_png, encode_png, luma
from geodiff_spark.functions.wav import decode_wav, encode_wav


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _scene(h, w, bumps):
    y = np.linspace(0, 1, h)[:, None]
    x = np.linspace(0, 1, w)[None, :]
    img = np.zeros((h, w))
    for cy, cx, s, a in bumps:
        img += a * np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * s * s))
    return (img / img.max() * 255).astype(np.uint8)


def test_phash_q_basis_is_fixed_point_dct():
    # |basis| bounded by scale * max|C| = 2^15 * sqrt(2/32)
    assert PHASH_BASIS_Q.shape == (8, 32)
    assert np.abs(PHASH_BASIS_Q).max() <= 8192
    # DC row is constant (orthonormal DCT row 0)
    assert len(set(PHASH_BASIS_Q[0].tolist())) == 1


def test_phash_q_tracks_float_phash_on_smooth_scenes():
    """The fixed-point kernel is the same perceptual hash: on smooth
    scenes it stays within a few bits of the float implementation and
    keeps the noise-robust / discriminative contract."""
    a = _scene(64, 64, [(0.3, 0.25, 0.15, 1.0), (0.7, 0.7, 0.2, 0.8)])
    b = _scene(64, 64, [(0.15, 0.8, 0.1, 1.0), (0.8, 0.2, 0.12, 1.0)])
    assert _ham(phash_plane_q(a), phash_plane(a)) <= 4
    noisy = a.copy()
    noisy[::7, ::7] = np.minimum(noisy[::7, ::7] + 3, 255)
    assert _ham(phash_plane_q(a), phash_plane_q(noisy)) <= 3
    assert _ham(phash_plane_q(a), phash_plane_q(b)) > 10


def test_phash_q_survives_png_roundtrip_all_filters():
    plane = _scene(32, 32, [(0.4, 0.4, 0.2, 1.0)])
    h0 = phash_plane_q(plane)
    for ftype in range(5):
        dec = luma(decode_png(encode_png(plane, filter_type=ftype)))
        assert phash_plane_q(dec) == h0  # lossless codec, exact kernel


def test_afingerprint_q_exact_and_robust():
    rng = np.random.RandomState(7)
    i = np.arange(AFP_SAMPLES)
    amp = 100 + 900 * ((i // 136) % 3) // 2
    s = (rng.randint(-1000, 1001, AFP_SAMPLES) % (2 * amp + 1)) - amp
    s = s.astype(np.int16)
    h0 = afingerprint_pcm_q(s)
    # WAV roundtrip is lossless -> identical fingerprint
    pcm, _ = decode_wav(encode_wav(s))
    assert afingerprint_pcm_q(pcm[:, 0]) == h0
    # small perturbation -> small hamming
    pert = s.copy()
    pert[::211] = pert[::211] + 30
    assert _ham(h0, afingerprint_pcm_q(pert)) <= 3
    assert 0 <= h0 < (1 << 60)


def test_salted_window_totals_equals_window(spark):
    from pyspark.sql import Window

    from geodiff_spark.operators.skew import salted_window_totals

    df = spark.range(5000).select(
        F.col("id"),
        (F.when(F.col("id") % 10 < 3, F.lit(7)).otherwise(F.col("id") % 13))
        .alias("k"),
        (F.col("id") * 3 % 101).alias("v"),
    )
    got = salted_window_totals(
        df, ["k"],
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
        [F.sum("n").alias("key_n"), F.sum("s").alias("key_s")],
    ).select("id", "key_n", "key_s")
    w = Window.partitionBy("k")
    exp = df.select(
        "id",
        F.count(F.lit(1)).over(w).alias("key_n"),
        F.sum("v").over(w).alias("key_s"),
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_salted_window_totals_plan_has_no_window_and_broadcasts(spark):
    from geodiff_spark.operators.skew import salted_window_totals

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    out = salted_window_totals(
        df, ["k"],
        [F.sum("v").alias("s")], [F.sum("s").alias("key_s")],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # no single-task hot-key sort
    assert "BroadcastHashJoin" in plan  # totals come back as a broadcast


def test_bench_compact_line_always_fits_and_parses():
    """The driver parses only the last 2000 stdout chars; the emitted
    line must fit with margin for ANY suite size, keep headline order,
    and disclose how many per-query entries were trimmed."""
    import json

    import bench

    names = [f"query_with_a_long_name_{i:03d}" for i in range(200)]
    result = {
        "value": 123.456,
        "queries": {n: 1.234 for n in names},
        "sf": 0.1,
        "pages_diff_rows_per_sec": 313393.9,
    }
    line = bench.compact_line(result, names)
    assert len(line) <= 1940
    d = json.loads(line)
    kept = list(d["queries"])
    assert kept == names[: len(kept)]  # headline order, tail-trimmed
    assert d["queries_omitted"] == len(names) - len(kept)
    assert d["unit"] == "sec" and d["sf"] == 0.1
    # small suites are not trimmed at all
    small = {**result, "queries": {n: 1.2 for n in names[:40]}}
    d2 = json.loads(bench.compact_line(small, names))
    assert d2["queries_omitted"] == 0 and len(d2["queries"]) == 40
