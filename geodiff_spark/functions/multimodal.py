"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed in Arrow-batched mapInPandas.

Codec status in this environment (no external codec libs):
  * PNG — REAL: decoded/encoded by functions.png (pure numpy + stdlib
    zlib, all five scanline filters, CRC-checked);
  * JPEG — explicitly gated (NotImplementedError; DCT entropy decode is
    a codec-library job — swap in PIL on a real cluster);
  * raw synthetic payloads — deterministic fake expansion (tests the
    Spark-side plumbing: schemas, Arrow batch iteration, partitioning).

Schema convention for a media table:
    asset_id long, kind string ('image'|'audio'|'video'),
    payload binary, meta struct<width int, height int, sample_rate int,
    n_frames int>
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "asset_id long, kind string, feature array<float>, n_bytes long"
THUMB_SCHEMA = "asset_id long, thumb binary, width int, height int"
FRAME_SCHEMA = "asset_id long, frame_idx int, frame binary"


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """payload -> (h, w) uint8 luma plane.

    PNG payloads decode for REAL (functions.png; meta width/height are
    advisory — the container's own dimensions win). JPEG stays gated.
    Anything else is the deterministic fake expansion for synthetic
    plumbing tests."""
    from .png import PNG_MAGIC, decode_png, luma

    if payload[:8] == PNG_MAGIC:
        return luma(decode_png(payload))
    if payload[:2] == b"\xff\xd8":
        raise NotImplementedError("JPEG decode unavailable in this env (PIL on a real cluster)")
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    reps = int(np.ceil(need / max(len(raw), 1)))
    return np.tile(raw, reps)[:need].reshape(height, width)


#: backwards-compat alias (round-1 name)
_fake_decode_image = _decode_image


def extract_features(media: DataFrame, *, feat_dim: int = 8) -> DataFrame:
    """mapInPandas: binary payload -> small float feature vector
    (mean/std/quantiles of the decoded plane). Batch-vectorized; the
    per-asset decode is the unavoidable ragged step."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .wav import WAV_MAGIC, audio_features, decode_wav

        for pdf in it:
            feats, nbytes = [], []
            for payload, meta, kind in zip(
                pdf["payload"], pdf["meta"], pdf["kind"]
            ):
                payload = bytes(payload)
                if kind == "audio" and payload[:4] == WAV_MAGIC:
                    # REAL RIFF/PCM decode (functions.wav)
                    pcm, _rate = decode_wav(payload)
                    v = audio_features(pcm, n_bands=feat_dim - 2)
                else:
                    w = int(meta["width"] or 16)
                    h = int(meta["height"] or 16)
                    plane = _decode_image(payload, w, h).astype(np.float64)
                    qs = np.quantile(plane, np.linspace(0, 1, feat_dim - 2))
                    v = np.concatenate([[plane.mean(), plane.std()], qs])
                feats.append(v.astype(np.float32))
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, *, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Thumbnail materialization: decode -> stride-subsample -> bytes."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "image"]
            thumbs = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 16)
                h = int(meta["height"] or 16)
                plane = _decode_image(bytes(payload), w, h)
                h2, w2 = plane.shape
                ys = np.linspace(0, h2 - 1, out_h).astype(int)
                xs = np.linspace(0, w2 - 1, out_w).astype(int)
                thumbs.append(plane[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "thumb": thumbs,
                    "width": np.full(len(pdf), out_w, dtype=np.int32),
                    "height": np.full(len(pdf), out_h, dtype=np.int32),
                }
            )

    return media.mapInPandas(op, schema=THUMB_SCHEMA)


def sample_frames(media: DataFrame, *, every_n: int = 4) -> DataFrame:
    """Video frame sampling: emit every Nth 'frame' (fixed-size payload
    slices standing in for decoded frames)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "video"]
            rows = {"asset_id": [], "frame_idx": [], "frame": []}
            for aid, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                n = int(meta["n_frames"] or 0)
                payload = bytes(payload)
                fsize = max(len(payload) // max(n, 1), 1)
                for fi in range(0, n, every_n):
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(fi)
                    rows["frame"].append(payload[fi * fsize : (fi + 1) * fsize])
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


def synth_media(spark, n: int, *, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table for tests/benchmarks."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = np.array(["image", "audio", "video"])
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng_bytes = [
                (np.arange(64 + (i % 128), dtype=np.uint8) * ((i % 251) + 1) % 251).tobytes()
                for i in ids
            ]
            k = kinds[ids % 3]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "kind": k,
                    "payload": rng_bytes,
                    "meta": [
                        {
                            "width": 16 + int(i % 16),
                            "height": 16,
                            "sample_rate": 16000,
                            "n_frames": 8 + int(i % 8),
                        }
                        for i in ids
                    ],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


# --- perceptual hashing (image near-dup detection) -------------------------

PHASH_SCHEMA = "asset_id long, phash long"


def _dct2_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the classic pHash transform)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    c = np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    c[0] *= 1 / np.sqrt(2)
    return c * np.sqrt(2 / n)


def phash_plane(plane: np.ndarray, *, hash_size: int = 8, upsize: int = 32) -> int:
    """64-bit DCT perceptual hash of a luma plane: stride-resample to
    32x32, 2-D DCT-II, keep the top-left hash_size×hash_size
    low-frequency block, threshold each coefficient against the block
    MEDIAN (DC excluded from the median, included in the bits — the
    standard pHash recipe). Deterministic pure numpy."""
    h, w = plane.shape
    ys = np.linspace(0, h - 1, upsize).astype(int)
    xs = np.linspace(0, w - 1, upsize).astype(int)
    small = plane[np.ix_(ys, xs)].astype(np.float64)
    c = _dct2_matrix(upsize)
    d = c @ small @ c.T
    block = d[:hash_size, :hash_size]
    med = np.median(block.flatten()[1:])
    bits = (block.flatten() > med).astype(np.uint64)
    out = np.uint64(0)
    for b in bits:
        out = (out << np.uint64(1)) | b
    return int(out.astype(np.int64))  # two's complement into a Spark long


def phash_images(media: DataFrame) -> DataFrame:
    """mapInPandas: image payload -> 64-bit perceptual hash (PNG decodes
    for real; synthetic payloads use the deterministic fake plane)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "image"]
            hashes = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 16)
                h = int(meta["height"] or 16)
                hashes.append(phash_plane(_decode_image(bytes(payload), w, h)))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"],
                 "phash": pd.Series(hashes, dtype="int64")}
            )

    return media.mapInPandas(op, schema=PHASH_SCHEMA)


def banded_hamming_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    *,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-duplicate pairs among 64-bit hashes via the chunk-banded
    pigeonhole join (same scheme as simhash text dedup,
    operators/dedup.py): two hashes within hamming <= chunks-1 MUST
    agree on at least one of the `chunks` 16-bit bands, so candidates
    come from an equi-join on (band_idx, band_value) — never an
    all-pairs scan; exact bit_count(xor) re-ranks. All JVM-side."""
    width = 64 // chunks
    bands = hashes.select(
        F.col(id_col), F.col(hash_col).alias("_h"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col(hash_col), i * width).bitwiseAND(
                    F.lit((1 << width) - 1)
                )
                for i in range(chunks)
            ])
        ).alias("band_idx", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def image_dup_pairs(media: DataFrame, *, max_hamming: int = 3, chunks: int = 4) -> DataFrame:
    """Near-duplicate images: one decode pass -> pHash -> banded join."""
    return banded_hamming_pairs(
        phash_images(media), "asset_id", "phash",
        max_hamming=max_hamming, chunks=chunks,
    )


# --- audio fingerprinting ---------------------------------------------------

AHASH_SCHEMA = "asset_id long, ahash long"


def afingerprint_pcm(x: np.ndarray, *, frames: int = 16, bands: int = 4) -> int:
    """64-bit spectral fingerprint of a mono PCM signal: split into
    `frames` time frames, `bands` rfft band energies per frame, bit =
    energy > that band's median across frames. Deterministic numpy;
    robust to gain/low-amplitude noise (median thresholding), the audio
    twin of phash_plane."""
    x = x.astype(np.float64)
    if len(x) < frames:
        x = np.pad(x, (0, frames - len(x)))
    e = np.empty((frames, bands))
    for t, chunk in enumerate(np.array_split(x, frames)):
        spec = np.abs(np.fft.rfft(chunk))
        for b, band in enumerate(np.array_split(spec, bands)):
            e[t, b] = np.sqrt(np.mean(np.square(band))) if len(band) else 0.0
    med = np.median(e, axis=0, keepdims=True)
    bits = (e > med).astype(np.uint64).flatten()
    out = np.uint64(0)
    for bit in bits:
        out = (out << np.uint64(1)) | bit
    return int(out.astype(np.int64))


def afingerprint_audio(media: DataFrame) -> DataFrame:
    """mapInPandas: WAV payload -> 64-bit spectral fingerprint (real
    RIFF/PCM decode; non-WAV audio payloads use the raw bytes as int8
    samples — the deterministic stand-in for gated codecs)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .wav import WAV_MAGIC, decode_wav

        for pdf in it:
            pdf = pdf[pdf["kind"] == "audio"]
            hashes = []
            for payload in pdf["payload"]:
                payload = bytes(payload)
                if payload[:4] == WAV_MAGIC:
                    pcm, _ = decode_wav(payload)
                    x = pcm[:, 0]
                else:
                    x = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
                hashes.append(afingerprint_pcm(x))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"],
                 "ahash": pd.Series(hashes, dtype="int64")}
            )

    return media.mapInPandas(op, schema=AHASH_SCHEMA)


def audio_dup_pairs(media: DataFrame, *, max_hamming: int = 3, chunks: int = 4) -> DataFrame:
    """Near-duplicate audio: one decode pass -> fingerprint -> banded join."""
    return banded_hamming_pairs(
        afingerprint_audio(media), "asset_id", "ahash",
        max_hamming=max_hamming, chunks=chunks,
    )


# --- oracle-replayable integer kernels (graded multimodal queries) ----------
#
# The float pHash/fingerprint above are the production kernels; these are
# their INTEGER-EXACT twins, used by the graded registry queries so a
# DuckDB oracle can recompute every bit from scratch (same discipline as
# functions/hash_sql.py replaying FNV-1a/splitmix64). Fixed-point DCT is
# what hardware pHash implementations do anyway — this is not a toy
# variant, it is the deterministic flavor of the same perceptual hash.

PHASH_N = 32          # resampled plane side
PHASH_K = 8           # low-frequency block side (64 bits)
PHASH_SCALE = 1 << 15  # fixed-point scale for the DCT basis


def _phash_basis_q() -> np.ndarray:
    """(8, 32) int64 fixed-point DCT-II basis: floor(C * 2^15 + 0.5).

    Computed once at import; the SQL oracle injects THESE integers as
    literals (never recomputes cos), so Spark/DuckDB parity is exact by
    construction."""
    c = _dct2_matrix(PHASH_N)[:PHASH_K]
    return np.floor(c * PHASH_SCALE + 0.5).astype(np.int64)


PHASH_BASIS_Q = _phash_basis_q()


def phash_plane_q(plane: np.ndarray) -> int:
    """Integer-exact 64-bit DCT perceptual hash of a uint8 luma plane.

    Same recipe as phash_plane (stride-resample to 32x32, DCT-II, keep
    the 8x8 low-frequency block, threshold against the non-DC median)
    but in int64 fixed point end to end: coefficients are exact
    integers (|d| <= 32*32*8192*8192*255 < 2^45), the median is the
    exact 32nd order statistic of the 63 AC coefficients, and the bit
    pack is two's-complement into a Spark long."""
    h, w = plane.shape
    ys = np.linspace(0, h - 1, PHASH_N).astype(int)
    xs = np.linspace(0, w - 1, PHASH_N).astype(int)
    small = plane[np.ix_(ys, xs)].astype(np.int64)
    b = PHASH_BASIS_Q
    d = (b @ small @ b.T).flatten()
    med = int(np.sort(d[1:])[31])
    out = 0
    for val in d:
        out = (out << 1) | int(val > med)
    return out - (1 << 64) if out >= (1 << 63) else out


def phash_images_q(media: DataFrame) -> DataFrame:
    """mapInPandas: image payload -> integer-exact pHash (PNG decodes
    for real via functions.png; the roundtrip is lossless so the oracle
    can regenerate the pre-encode plane instead of decoding)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png import decode_png_gray_batch, luma

        for pdf in it:
            # batch path: unfilter every grey PNG in the batch in
            # lockstep (h·w python steps per BATCH, not per image —
            # guide §4.2); falls back per image on mixed payloads
            planes = decode_png_gray_batch(list(pdf["payload"]))
            if planes is not None:
                hashes = [phash_plane_q(pl) for pl in planes]
            else:
                hashes = [
                    phash_plane_q(_decode_image(bytes(p), 32, 32))
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"],
                 "phash": pd.Series(hashes, dtype="int64")}
            )

    return media.mapInPandas(op, schema=PHASH_SCHEMA)


AFP_FRAMES = 15   # odd -> the per-band median is a unique middle element
AFP_BANDS = 4
AFP_SEG = 34      # samples per (frame, band) segment
AFP_SAMPLES = AFP_FRAMES * AFP_BANDS * AFP_SEG  # 2040


def afingerprint_pcm_q(x: np.ndarray) -> int:
    """Integer-exact 60-bit time-domain energy fingerprint.

    Split the first 2040 samples into 15 frames x 4 sub-band segments
    of 34 samples; e[t,b] = exact int64 sum of squares; bit = e[t,b] >
    that band's median across frames (odd frame count -> the median is
    the exact 8th order statistic). The audio twin of phash_plane_q;
    robust to small sample perturbations because segment energies are
    amplitude-envelope scaled, not white."""
    x = np.asarray(x, dtype=np.int64)
    if len(x) < AFP_SAMPLES:
        x = np.pad(x, (0, AFP_SAMPLES - len(x)))
    e = (x[:AFP_SAMPLES] ** 2).reshape(AFP_FRAMES, AFP_BANDS, AFP_SEG).sum(axis=2)
    med = np.sort(e, axis=0)[AFP_FRAMES // 2]
    bits = (e > med[None, :]).flatten()
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out  # < 2^60, always a valid non-negative Spark long


def afingerprint_audio_q(media: DataFrame) -> DataFrame:
    """mapInPandas: WAV payload -> integer-exact fingerprint (real
    RIFF/PCM decode; int16 PCM roundtrips losslessly so the oracle can
    regenerate the pre-encode samples)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .wav import decode_wav

        for pdf in it:
            hashes = []
            for payload in pdf["payload"]:
                pcm, _ = decode_wav(bytes(payload))
                hashes.append(afingerprint_pcm_q(pcm[:, 0]))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"],
                 "ahash": pd.Series(hashes, dtype="int64")}
            )

    return media.mapInPandas(op, schema=AHASH_SCHEMA)
