"""Real WAV (RIFF PCM) codec in pure numpy + struct — no codec libs.

Companion to functions.png: the multimodal *audio* path handles actual
RIFF/WAVE PCM bytes (16-bit, mono or multi-channel). Compressed audio
(mp3/aac/ogg) stays gated like JPEG — entropy codecs are a library job.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 PCM -> WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, ch) int16 PCM, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError("supported: uncompressed 16-bit PCM")
    arr = np.frombuffer(pcm, dtype="<i2")
    return arr.reshape(-1, ch), rate


def audio_features(samples: np.ndarray, n_bands: int = 4) -> np.ndarray:
    """Deterministic feature vector from PCM: RMS, zero-crossing rate,
    and coarse FFT band energies of the first channel."""
    x = samples[:, 0].astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) if len(x) else np.zeros(1)
    bands = [
        float(np.sqrt(np.mean(np.square(chunk)))) if len(chunk) else 0.0
        for chunk in np.array_split(spec, n_bands)
    ]
    return np.array([rms, zcr] + bands, dtype=np.float32)
