"""Perceptual-hash image dedup: real PNG payloads through decode ->
DCT pHash -> chunk-banded hamming join.

Test scenes are smooth (Gaussian bumps): pHash thresholds the 8x8
low-frequency DCT block against its median, so it is only meaningful for
images WITH low-frequency structure — a modular-wrap sawtooth has none
and flips bits arbitrarily (verified while writing these tests)."""

from __future__ import annotations

import numpy as np

from geodiff_spark.functions.multimodal import (
    image_dup_pairs,
    phash_images,
    phash_plane,
)
from geodiff_spark.functions.png import encode_png


def _scene(h, w, bumps):
    """Smooth test image: sum of Gaussian bumps at relative coords."""
    y = np.linspace(0, 1, h)[:, None]
    x = np.linspace(0, 1, w)[None, :]
    img = np.zeros((h, w))
    for cy, cx, s, a in bumps:
        img += a * np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * s * s))
    img = img / img.max() * 255
    return img.astype(np.uint8)


BUMPS_A = [(0.3, 0.25, 0.15, 1.0), (0.7, 0.7, 0.2, 0.8)]
BUMPS_B = [(0.15, 0.8, 0.1, 1.0), (0.8, 0.2, 0.12, 1.0), (0.5, 0.5, 0.3, 0.5)]


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_invariant_to_small_noise_distant_for_different():
    base = _scene(64, 64, BUMPS_A)
    noisy = base.copy()
    noisy[::7, ::7] = np.minimum(noisy[::7, ::7].astype(int) + 3, 255).astype(np.uint8)
    other = _scene(64, 64, BUMPS_B)
    assert _ham(phash_plane(base), phash_plane(noisy)) <= 3
    assert _ham(phash_plane(base), phash_plane(other)) > 10


def test_phash_scale_invariance():
    # the same smooth scene at two resolutions -> near-identical hash
    # (resample-to-32 then DCT is the point of the recipe)
    a = phash_plane(_scene(64, 64, BUMPS_A))
    b = phash_plane(_scene(128, 128, BUMPS_A))
    assert _ham(a, b) <= 4


def _media_df(spark, imgs):
    rows = [
        (i, "image", bytearray(encode_png(img)),
         {"width": img.shape[1], "height": img.shape[0],
          "sample_rate": 0, "n_frames": 0})
        for i, img in imgs
    ]
    return spark.createDataFrame(
        rows, "asset_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )


def test_image_dup_pairs_on_real_pngs(spark):
    base = _scene(48, 48, BUMPS_A)
    noisy = base.copy()
    noisy[::9, ::9] = np.minimum(noisy[::9, ::9].astype(int) + 2, 255).astype(np.uint8)
    media = _media_df(
        spark,
        [(1, base), (2, noisy), (3, _scene(48, 48, BUMPS_B)),
         (4, _scene(48, 48, [(0.5, 0.5, 0.05, 1.0)]))],
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in image_dup_pairs(media).collect()}
    assert (1, 2) in pairs  # near-dup found via the banded join
    assert all({a, b} == {1, 2} for a, b in pairs)  # nothing spurious


def test_phash_deterministic_across_runs(spark):
    img = _scene(32, 32, BUMPS_A)
    media = _media_df(spark, [(7, img)])
    h1 = phash_images(media).collect()[0].phash
    h2 = phash_images(media).collect()[0].phash
    assert h1 == h2 == phash_plane(img)


# --- audio fingerprint --------------------------------------------------------

def _tone(freqs, n=8000, rate=16000, amps=None):
    t = np.arange(n) / rate
    amps = amps or [1.0] * len(freqs)
    x = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    return (x / np.max(np.abs(x)) * 20000).astype(np.int16)


def test_afingerprint_noise_invariant_content_sensitive():
    from geodiff_spark.functions.multimodal import afingerprint_pcm

    base = _tone([440, 1200]).astype(np.float64)
    noisy = base + 25.0 * np.cos(np.arange(len(base)))  # tiny additive hum
    other = _tone([3000, 250, 777]).astype(np.float64)
    assert _ham(afingerprint_pcm(base), afingerprint_pcm(noisy)) <= 3
    assert _ham(afingerprint_pcm(base), afingerprint_pcm(other)) > 10


def test_audio_dup_pairs_on_real_wavs(spark):
    from geodiff_spark.functions.multimodal import audio_dup_pairs
    from geodiff_spark.functions.wav import encode_wav

    base = _tone([440, 1200])
    noisy = (base.astype(np.float64) + 20.0 * np.cos(np.arange(len(base))))
    noisy = np.clip(noisy, -32768, 32767).astype(np.int16)
    other = _tone([3000, 250, 777])
    rows = [
        (i, "audio", bytearray(encode_wav(x)),
         {"width": 0, "height": 0, "sample_rate": 16000, "n_frames": 0})
        for i, x in [(1, base), (2, noisy), (3, other)]
    ]
    media = spark.createDataFrame(
        rows, "asset_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )
    pairs = {(r.id_a, r.id_b) for r in audio_dup_pairs(media).collect()}
    assert pairs == {(1, 2)}
