"""Real codec-free media decode: PPM/WAV round-trips, perceptual feature
locality, and end-to-end image near-dup through Spark with actual decode."""

import numpy as np
import pytest

from lsh_qd_spark.multimodal import (
    audio_feature,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    image_feature,
    media_near_dup,
    ppm_feature_decoder,
    wav_feature_decoder,
)


def _image(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_ppm_roundtrip_and_header_grammar():
    img = _image(1)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # comments + arbitrary whitespace in the header
    raster = img.tobytes()
    weird = b"P6 # comment right here\n# another\n 64\t48 # dims\n255\n" + raster
    assert np.array_equal(decode_ppm(weird), img)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # not P6
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(img)[:-10])  # truncated raster


def test_wav_roundtrip():
    t = np.linspace(0, 1, 8000, endpoint=False)
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    y, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000
    assert len(y) == len(x)
    assert float(np.abs(y - x).max()) < 1e-3  # 16-bit quantization only


def test_feature_locality():
    img = _image(2)
    noisy = np.clip(
        img.astype(np.int16)
        + np.random.default_rng(3).integers(-8, 9, img.shape),
        0,
        255,
    ).astype(np.uint8)
    other = _image(4)
    f, fn, fo = (image_feature(i) for i in (img, noisy, other))
    assert float(f @ fn) > 0.95  # small noise barely moves block means
    assert float(f @ fo) < 0.5
    # audio: same tone slightly amplitude-scaled ≈ identical shape
    t = np.linspace(0, 1, 8000, endpoint=False)
    a = np.sin(2 * np.pi * 220 * t) * 0.5
    b = a * 0.9
    c = np.sin(2 * np.pi * 1760 * t + 1.0) * 0.5
    fa, fb, fc = (audio_feature(x) for x in (a, b, c))
    assert float(fa @ fb) > 0.99
    assert float(fa @ fc) < 0.9  # different ZCR profile


def test_media_near_dup_real_ppm_decode(spark):
    """Planted near-identical images recovered via REAL decode in Spark."""
    rows = []
    truth = set()
    rng = np.random.default_rng(7)
    for i in range(30):
        img = _image(100 + i)
        rows.append((2 * i, "image", encode_ppm(img), "image/x-portable-pixmap",
                     64, 48, None))
        noisy = np.clip(
            img.astype(np.int16) + rng.integers(-6, 7, img.shape), 0, 255
        ).astype(np.uint8)
        rows.append((2 * i + 1, "image", encode_ppm(noisy),
                     "image/x-portable-pixmap", 64, 48, None))
        truth.add((2 * i, 2 * i + 1))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup(
            media, ppm_feature_decoder(), cosine_threshold=0.9
        ).collect()
    }
    assert got == truth


def test_wav_feature_decoder_shape():
    x = np.sin(np.linspace(0, 100, 4000))
    f = wav_feature_decoder(16)(encode_wav(x, 8000))
    assert f.shape == (32,)
    assert abs(float(np.linalg.norm(f)) - 1.0) < 1e-5
