"""Real-PNG codec tests (functions/png.py) + multimodal over real PNGs."""

from __future__ import annotations

import numpy as np
import pytest

from geodiff_spark.functions.png import (
    decode_png,
    decode_png_gray_batch,
    encode_png,
    luma,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(13, 17), (8, 8, 3), (1, 1), (5, 3, 3)])
def test_png_roundtrip_all_filters(filter_type, shape):
    rng = np.random.default_rng(hash((filter_type, shape)) % 2**31)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = encode_png(arr, filter_type=filter_type)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = decode_png(data)
    np.testing.assert_array_equal(back, arr)


def test_png_batch_decoder_matches_scalar():
    """The lockstep batch unfilter (r06 phash fast path) must be
    bit-identical to decode_png across every filter type, including a
    mixed-filter batch."""
    rng = np.random.default_rng(42)
    planes = [rng.integers(0, 256, (32, 32), dtype=np.uint8) for _ in range(10)]
    payloads = [
        encode_png(pl, filter_type=i % 5) for i, pl in enumerate(planes)
    ]
    batch = decode_png_gray_batch(payloads)
    assert batch.shape == (10, 32, 32)
    for i, pl in enumerate(planes):
        np.testing.assert_array_equal(batch[i], decode_png(payloads[i]))
        np.testing.assert_array_equal(batch[i], pl)


def test_png_batch_decoder_falls_back_on_rgb():
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    assert decode_png_gray_batch([encode_png(rgb)]) is None


def test_png_crc_detects_corruption():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = bytearray(encode_png(arr))
    data[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8not a png at all....")


def test_luma_exact_integer():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = (255, 0, 0)
    img[0, 1] = (0, 255, 0)
    img[1, 0] = (0, 0, 255)
    img[1, 1] = (255, 255, 255)
    got = luma(img)
    assert got.tolist() == [[76, 149], [29, 255]]  # BT.601 integer


def test_multimodal_decodes_real_png(spark):
    """extract_features + resize run over REAL PNG payloads: features
    derive from the actual decoded pixels, thumbnails subsample them."""
    import pandas as pd

    from geodiff_spark.functions.multimodal import (
        extract_features,
        resize_images,
    )

    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, size=(16 + i, 12), dtype=np.uint8)
            for i in range(3)}
    rows = [
        (i, "image", bytearray(encode_png(imgs[i])),
         {"width": 999, "height": 999, "sample_rate": 0, "n_frames": 0})
        for i in imgs  # meta dims deliberately wrong: container wins
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"]),
        "asset_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    feats = {r["asset_id"]: r["feature"]
             for r in extract_features(media).collect()}
    for i, img in imgs.items():
        assert abs(feats[i][0] - img.astype(np.float64).mean()) < 1e-5
        assert abs(feats[i][1] - img.astype(np.float64).std()) < 1e-5

    thumbs = {r["asset_id"]: r for r in resize_images(media, out_w=4, out_h=4).collect()}
    for i, img in imgs.items():
        h, w = img.shape
        ys = np.linspace(0, h - 1, 4).astype(int)
        xs = np.linspace(0, w - 1, 4).astype(int)
        expect = img[np.ix_(ys, xs)].tobytes()
        assert bytes(thumbs[i]["thumb"]) == expect


def test_jpeg_still_gated(spark):
    from geodiff_spark.functions.multimodal import _decode_image

    with pytest.raises(NotImplementedError, match="JPEG"):
        _decode_image(b"\xff\xd8\xff\xe0fakejpegbytes", 4, 4)


# ---------------------------------------------------------------------------
# WAV (functions/wav.py)
# ---------------------------------------------------------------------------

def test_wav_roundtrip():
    from geodiff_spark.functions.wav import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    for shape in [(100,), (64, 2), (1, 1)]:
        pcm = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
        data = encode_wav(pcm, sample_rate=8000)
        back, rate = decode_wav(data)
        assert rate == 8000
        want = pcm[:, None] if pcm.ndim == 1 else pcm
        np.testing.assert_array_equal(back, want)


def test_wav_rejects_compressed():
    import struct

    from geodiff_spark.functions.wav import decode_wav, encode_wav

    data = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
    # flip the audio-format field (offset: RIFF(12) + 'fmt '+len(8) = 20)
    data[20:22] = struct.pack("<H", 85)  # mp3
    with np.testing.assert_raises(NotImplementedError):
        decode_wav(bytes(data))


def test_multimodal_real_wav_features(spark):
    import pandas as pd

    from geodiff_spark.functions.multimodal import extract_features
    from geodiff_spark.functions.wav import audio_features, encode_wav

    rng = np.random.default_rng(9)
    pcm = rng.integers(-20000, 20000, size=(2048,), dtype=np.int16)
    media = spark.createDataFrame(
        pd.DataFrame(
            [(0, "audio", bytearray(encode_wav(pcm)),
              {"width": 0, "height": 0, "sample_rate": 16000, "n_frames": 0})],
            columns=["asset_id", "kind", "payload", "meta"],
        ),
        "asset_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    got = extract_features(media).collect()[0]["feature"]
    want = audio_features(pcm[:, None], n_bands=6)
    np.testing.assert_allclose(np.array(got), want, rtol=1e-6)
