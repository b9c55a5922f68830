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


def test_pgm_roundtrip_and_gray_features():
    from lsh_qd_spark.multimodal import decode_pgm, encode_pgm

    gray = np.random.default_rng(9).integers(0, 256, (48, 64), dtype=np.uint8)
    assert np.array_equal(decode_pgm(encode_pgm(gray)), gray)
    with pytest.raises(ValueError):
        decode_pgm(encode_ppm(_image(1)))  # P6 magic rejected by P5 decoder
    # grayscale feature == feature of the equivalent 3-channel image
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    assert float(image_feature(gray) @ image_feature(rgb)) > 0.9999


def test_bmp_roundtrip_both_raster_orders():
    import struct

    from lsh_qd_spark.multimodal import decode_bmp, encode_bmp

    img = _image(11)
    payload = encode_bmp(img)
    assert np.array_equal(decode_bmp(payload), img)
    # top-down variant (negative height) must decode identically
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[:, :, ::-1].reshape(h, -1)  # not flipped
    top_down = (
        payload[:22] + struct.pack("<i", -h) + payload[26:54] + rows.tobytes()
    )
    assert np.array_equal(decode_bmp(top_down), img)
    with pytest.raises(ValueError):
        decode_bmp(payload[:-40])  # truncated raster
    with pytest.raises(ValueError):
        decode_bmp(b"PNG not a bmp")


def test_same_image_same_feature_across_formats():
    """PPM, PGM-of-gray, and BMP payloads of one image agree on the
    perceptual feature — the format layer is transparent to dedup."""
    from lsh_qd_spark.multimodal import (
        bmp_feature_decoder,
        encode_bmp,
        ppm_feature_decoder,
    )

    img = _image(13)
    f_ppm = ppm_feature_decoder()(encode_ppm(img))
    f_bmp = bmp_feature_decoder()(encode_bmp(img))
    assert float(f_ppm @ f_bmp) > 0.9999


def test_media_near_dup_mixed_formats(spark):
    """Near-dup pairs recovered when the two copies use DIFFERENT codecs
    (PPM original vs BMP re-encode) — one decode_fn dispatching on magic
    bytes, the realistic crawl shape."""
    from lsh_qd_spark.multimodal import decode_bmp, encode_bmp

    def any_image(payload: bytes) -> np.ndarray:
        img = (
            decode_bmp(payload)
            if payload[:2] == b"BM"
            else __import__(
                "lsh_qd_spark.multimodal", fromlist=["decode_ppm"]
            ).decode_ppm(payload)
        )
        return image_feature(img)

    rows, truth = [], set()
    for i in range(20):
        img = _image(200 + i)
        rows.append((2 * i, "image", encode_ppm(img), "image/x-portable-pixmap",
                     64, 48, None))
        rows.append((2 * i + 1, "image", encode_bmp(img), "image/bmp",
                     64, 48, None))
        truth.add((2 * i, 2 * i + 1))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup(media, any_image, cosine_threshold=0.99).collect()
    }
    assert got == truth


try:
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False
try:
    import soundfile  # noqa: F401

    HAVE_SF = True
except ImportError:
    HAVE_SF = False


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed (sandbox)")
def test_pil_decoder_production_contract(spark):
    """The day a codec exists: PNG bytes through the SAME media_near_dup
    call sites, decode_fn=pil_feature_decoder()."""
    import io

    from PIL import Image

    from lsh_qd_spark.multimodal import pil_feature_decoder

    rows, truth = [], set()
    rng = np.random.default_rng(17)
    for i in range(10):
        img = _image(300 + i)
        noisy = np.clip(
            img.astype(np.int16) + rng.integers(-6, 7, img.shape), 0, 255
        ).astype(np.uint8)
        for j, arr in enumerate((img, noisy)):
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            rows.append((2 * i + j, "image", buf.getvalue(), "image/png",
                         64, 48, None))
        truth.add((2 * i, 2 * i + 1))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup(
            media, pil_feature_decoder(), cosine_threshold=0.9
        ).collect()
    }
    assert got == truth


@pytest.mark.skipif(not HAVE_SF, reason="soundfile not installed (sandbox)")
def test_soundfile_decoder_production_contract():
    import soundfile as sf
    import io

    from lsh_qd_spark.multimodal import soundfile_feature_decoder

    t = np.linspace(0, 1, 8000, endpoint=False)
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    buf = io.BytesIO()
    sf.write(buf, x, 8000, format="WAV")
    f = soundfile_feature_decoder(16)(buf.getvalue())
    ref = wav_feature_decoder(16)(encode_wav(x, 8000))
    assert float(f @ ref) > 0.999


def test_codec_stub_raises_loudly():
    from lsh_qd_spark.multimodal import pil_feature_decoder

    if HAVE_PIL:
        pytest.skip("Pillow present — stub path not reachable")
    with pytest.raises(NotImplementedError, match="codec"):
        pil_feature_decoder()


def test_pnm_comment_mid_token():
    """A '#' comment may START directly after a header token ('100#c') —
    the tokenizer must flush the pending token, not merge across the
    comment ('100' + '200' -> '100200')."""
    from lsh_qd_spark.multimodal import decode_ppm

    raster = bytes(range(6)) * 100  # 2x100 RGB = 600 bytes
    img = decode_ppm(b"P6\n2#width comment\n 100 255\n" + raster)
    assert img.shape == (100, 2, 3)


def test_extract_features_batch_limit_chunks_identically(spark):
    """batch_limit_bytes bounds decoded payloads per chunk; a 1-byte cap
    (every row its own chunk) must produce byte-identical features to the
    uncapped path."""
    from lsh_qd_spark.multimodal import (
        deterministic_fake_decoder,
        extract_features,
    )

    rows = [(i, bytes([i]) * 1000) for i in range(50)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    dec = deterministic_fake_decoder(16)
    base = {
        r["media_id"]: tuple(r["feature"])
        for r in extract_features(media, dec).collect()
    }
    capped = {
        r["media_id"]: tuple(r["feature"])
        for r in extract_features(media, dec, batch_limit_bytes=1).collect()
    }
    assert capped == base and len(base) == 50


def test_null_payload_row_skipped_not_fatal(spark):
    """A NULL payload row must not abort the extract job (decode_fn(None)
    would fail the task 4x and kill a multi-TB run): the row is dropped,
    like the empty-set skip in the text path."""
    from lsh_qd_spark.multimodal import extract_features

    img = encode_ppm(_image(5))
    media = spark.createDataFrame(
        [(1, bytearray(img)), (2, None), (3, bytearray(img))],
        "media_id long, payload binary",
    )
    out = extract_features(media, ppm_feature_decoder()).collect()
    assert sorted(r["media_id"] for r in out) == [1, 3]


def test_all_black_images_still_deduplicate():
    """An all-black (or all-silent) input maps to one canonical unit
    vector, not the zero vector: a zero feature would NULL the cosine
    (try_divide) and silently drop byte-identical duplicates."""
    black = np.zeros((32, 32, 3), dtype=np.uint8)
    fa = image_feature(black)
    fb = image_feature(np.zeros((64, 48, 3), dtype=np.uint8))
    assert float(np.linalg.norm(fa)) > 0
    assert float(np.dot(fa, fb)) == pytest.approx(1.0)
    silent = audio_feature(np.zeros(1000, dtype=np.float32))
    assert float(np.linalg.norm(silent)) > 0


def test_short_clip_no_phantom_windows():
    """n < n_windows: reduceat returns x[i] (not 0) for zero-width
    windows — those slots must be masked, or a single sample leaks
    nonzero energy into several phantom windows."""
    x = np.full(10, 0.5, dtype=np.float32)
    feat = audio_feature(x, n_windows=32)
    rms = feat[:32]
    # exactly the 10 real (width-1) windows carry energy
    assert int(np.count_nonzero(rms)) == 10


# ---------------------------------------------------------------------------
# Pure-stdlib PNG (round-4: first COMPRESSED format — the adapter contract
# runs un-skipped in this sandbox)


def _patch_ihdr(payload: bytes, offset_in_ihdr: int, value: int) -> bytes:
    """Rewrite one IHDR byte and fix the chunk CRC (IHDR data starts at
    byte 16: 8 sig + 4 len + 4 type)."""
    import struct
    import zlib

    data = bytearray(payload)
    data[16 + offset_in_ihdr] = value
    crc = zlib.crc32(bytes(data[12:29])) & 0xFFFFFFFF
    data[29:33] = struct.pack(">I", crc)
    return bytes(data)


def test_png_roundtrip_all_filters_and_color_types():
    from lsh_qd_spark.multimodal import decode_png, encode_png

    rng = np.random.default_rng(21)
    shapes = [(48, 64), (48, 64, 2), (48, 64, 3), (48, 64, 4)]
    for shape in shapes:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            got = decode_png(encode_png(img, filter_type=ft))
            assert got.shape == img.shape
            assert np.array_equal(got, img), (shape, ft)
    # a smooth gradient (the content filters exist for) must compress
    grad = (
        np.linspace(0, 255, 64)[None, :, None]
        + np.linspace(0, 100, 48)[:, None, None]
    ).astype(np.uint8).repeat(3, axis=2)
    payload = encode_png(grad, filter_type=4)
    assert np.array_equal(decode_png(payload), grad)
    assert len(payload) < grad.size // 4  # genuinely compressed


def test_png_error_paths():
    import struct
    import zlib

    from lsh_qd_spark.multimodal import decode_png, encode_png

    img = np.random.default_rng(22).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    payload = encode_png(img)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM not a png")
    with pytest.raises(ValueError, match="CRC"):
        corrupted = bytearray(payload)
        corrupted[40] ^= 0xFF  # flip an IDAT byte, CRC now stale
        decode_png(bytes(corrupted))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_patch_ihdr(payload, 8, 3))  # 3 is legal for no type
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_patch_ihdr(payload, 8, 2))  # 2-bit illegal for RGB
    with pytest.raises(ValueError):
        # depth 16 is LEGAL for RGB (round 5), but this payload carries an
        # 8-bit raster: the doubled size expectation must reject it
        decode_png(_patch_ihdr(payload, 8, 16))
    with pytest.raises(ValueError, match="interlace method"):
        decode_png(_patch_ihdr(payload, 12, 2))  # no such method
    with pytest.raises(ValueError):
        # claims Adam7 but carries a non-interlaced raster: the pass-sum
        # size no longer matches, so decode rejects rather than misreads
        decode_png(_patch_ihdr(payload, 12, 1))
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(_patch_ihdr(payload, 9, 3))  # palette without PLTE
    with pytest.raises(ValueError, match="color type"):
        decode_png(_patch_ihdr(payload, 9, 5))  # no such color type
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(payload[:-20])  # cuts into the IDAT chunk itself
    # unknown filter byte inside a well-formed container
    sig = payload[:8]
    ihdr = payload[8:33]
    body = zlib.compress(b"\x07" + bytes(24))  # filter 7, one 8px RGB row
    bad_h = _patch_ihdr(sig + ihdr, 7, 1)  # height=1... patch via helper

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    crafted = (
        bad_h[:33] + chunk(b"IDAT", body) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter type"):
        decode_png(crafted)


def test_png_feature_matches_other_formats():
    from lsh_qd_spark.multimodal import encode_png, png_feature_decoder

    img = _image(23)
    f_png = png_feature_decoder()(encode_png(img, filter_type=2))
    f_ppm = ppm_feature_decoder()(encode_ppm(img))
    assert float(f_png @ f_ppm) > 0.9999
    # alpha plane must not leak into luminance
    rgba = np.dstack([img, np.random.default_rng(3).integers(
        0, 256, img.shape[:2], dtype=np.uint8)])
    f_rgba = png_feature_decoder()(encode_png(rgba))
    assert float(f_rgba @ f_ppm) > 0.9999


def test_media_near_dup_real_png_decode(spark):
    """The production-adapter contract on a REAL compressed format,
    un-skipped: planted near-identical images ride as zlib-compressed
    PNG payloads through media_near_dup (VERDICT r3 #4 'done' bar)."""
    from lsh_qd_spark.multimodal import encode_png, png_feature_decoder

    rows, truth = [], set()
    rng = np.random.default_rng(29)
    for i in range(25):
        img = _image(400 + i)
        noisy = np.clip(
            img.astype(np.int16) + rng.integers(-6, 7, img.shape), 0, 255
        ).astype(np.uint8)
        rows.append((2 * i, "image", encode_png(img, filter_type=i % 5),
                     "image/png", 64, 48, None))
        rows.append((2 * i + 1, "image", encode_png(noisy, filter_type=4),
                     "image/png", 64, 48, None))
        truth.add((2 * i, 2 * i + 1))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup(
            media, png_feature_decoder(), cosine_threshold=0.9
        ).collect()
    }
    assert got == truth


def test_png_cross_validates_against_jvm_imageio(spark):
    """Independent-oracle check: the JVM's javax.imageio PNG codec (a
    separate, widely-deployed implementation) decodes our encoder's
    output byte-exact, and our decoder reads ImageIO-written bytes
    byte-exact. Uses the already-running test JVM via py4j."""
    from lsh_qd_spark.multimodal import decode_png, encode_png

    jvm = spark._jvm
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (12, 17, 3), dtype=np.uint8)

    bis = jvm.java.io.ByteArrayInputStream(
        bytearray(encode_png(img, filter_type=4))
    )
    bimg = jvm.javax.imageio.ImageIO.read(bis)
    assert bimg is not None and (bimg.getHeight(), bimg.getWidth()) == (12, 17)
    for y in range(12):
        for x in range(17):
            argb = bimg.getRGB(x, y)
            assert (
                (argb >> 16) & 255,
                (argb >> 8) & 255,
                argb & 255,
            ) == tuple(int(v) for v in img[y, x])

    out = jvm.java.awt.image.BufferedImage(
        17, 12, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(12):
        for x in range(17):
            r, g, b = (int(v) for v in img[y, x])
            v = (255 << 24) | (r << 16) | (g << 8) | b
            if v >= 1 << 31:
                v -= 1 << 32  # py4j needs a signed int32
            out.setRGB(x, y, v)
    bos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(out, "png", bos)
    assert np.array_equal(decode_png(bytes(bos.toByteArray())), img)


# ---------------------------------------------------------------------------
# Round-5 PNG additions: palette (PLTE/tRNS) support, decompression-bomb
# guard, and the vectorized/native unfilter fast paths (VERDICT r4 #3/#4 +
# ADVICE decompression-bomb item)


def test_png_palette_roundtrip_and_trns():
    from lsh_qd_spark.multimodal import (
        decode_png,
        encode_png_palette,
    )

    rng = np.random.default_rng(41)
    pal = rng.integers(0, 256, (37, 3), dtype=np.uint8)
    idx = rng.integers(0, 37, (30, 22), dtype=np.uint8)
    for ft in range(5):
        got = decode_png(encode_png_palette(idx, pal, filter_type=ft))
        assert got.shape == (30, 22, 3)
        assert np.array_equal(got, pal[idx]), ft
    # tRNS shorter than the palette: missing entries default to alpha 255
    trns = bytes(rng.integers(0, 256, 9, dtype=np.uint8))
    got = decode_png(encode_png_palette(idx, pal, trns=trns, filter_type=4))
    assert got.shape == (30, 22, 4)
    alut = np.full(37, 255, dtype=np.uint8)
    alut[:9] = np.frombuffer(trns, dtype=np.uint8)
    assert np.array_equal(got, np.dstack([pal[idx], alut[idx]]))


def test_png_palette_malformed_total():
    """Malformed palette containers fail with a clean ValueError — never
    an IndexError or a silent wrong image."""
    import struct
    import zlib

    from lsh_qd_spark.multimodal import decode_png, encode_png_palette

    pal = np.arange(30, dtype=np.uint8).reshape(10, 3)
    idx = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png_palette(idx, pal)

    def rebuild_with_plte(plte_data: bytes) -> bytes:
        # splice a replacement PLTE into the known-good container
        out, i = good[:8], 8
        while i + 8 <= len(good):
            (length,) = struct.unpack_from(">I", good, i)
            ctype = good[i + 4 : i + 8]
            data = good[i + 8 : i + 8 + length]
            if ctype == b"PLTE":
                data = plte_data
            out += (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )
            i += 12 + length
        return out

    with pytest.raises(ValueError, match="PLTE"):
        decode_png(rebuild_with_plte(b"\x00\x01"))  # not divisible by 3
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(rebuild_with_plte(b"\x00" * 769))  # > 256 entries
    # raster indices past the (shrunken) palette end: rejected, not
    # wrapped or crashed — the raster of `good` is all index 0, so build
    # one with index 5 against a 1-entry palette instead
    oob = encode_png_palette(np.full((4, 4), 5, dtype=np.uint8), pal)

    def shrink_plte(payload: bytes) -> bytes:
        out, i = payload[:8], 8
        while i + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, i)
            ctype = payload[i + 4 : i + 8]
            data = payload[i + 8 : i + 8 + length]
            if ctype == b"PLTE":
                data = b"\x00\x01\x02"  # 1 entry: index 5 now out of range
            out += (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )
            i += 12 + length
        return out

    with pytest.raises(ValueError, match="palette index"):
        decode_png(shrink_plte(oob))
    # tRNS longer than the palette: encoder refuses to build it, and the
    # decoder refuses a spliced-in one
    with pytest.raises(ValueError, match="tRNS"):
        encode_png_palette(idx, pal, trns=bytes(11))

    def splice_trns(payload: bytes, trns: bytes) -> bytes:
        out, i = payload[:8], 8
        while i + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, i)
            ctype = payload[i + 4 : i + 8]
            data = payload[i + 8 : i + 8 + length]
            out += (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )
            if ctype == b"PLTE":
                out += (
                    struct.pack(">I", len(trns))
                    + b"tRNS"
                    + trns
                    + struct.pack(
                        ">I", zlib.crc32(b"tRNS" + trns) & 0xFFFFFFFF
                    )
                )
            i += 12 + length
        return out

    with pytest.raises(ValueError, match="tRNS"):
        decode_png(splice_trns(good, bytes(11)))


def test_png_decompression_bomb_rejected():
    """A small crafted IDAT that inflates far beyond the declared raster
    must be rejected without allocating the inflated size, and absurd
    declared dimensions are rejected before any inflate."""
    import struct
    import zlib

    from lsh_qd_spark.multimodal import decode_png, encode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # declares 2x2 gray (raster 2*(2+1)=6 bytes) but IDAT inflates to 64 MB
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)
    assert len(bomb) < 70_000  # the whole point: tiny payload
    payload = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates beyond"):
        decode_png(payload)
    # absurd declared dimensions: rejected before inflate
    huge = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="exceeds cap"):
        decode_png(huge)
    # zero dimensions
    zero = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 4, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="dimensions"):
        decode_png(zero)
    # a normal image still round-trips through the capped inflate
    img = np.random.default_rng(5).integers(0, 256, (6, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type=4)), img)


def test_png_unfilter_native_numpy_parity_and_speed():
    """The optional cc-compiled unfilter kernel and the NumPy wavefront
    must agree byte-exactly on random mixed-filter rasters, and the
    wavefront itself must beat a per-byte Python reference loop by a wide
    margin on the Paeth-heavy shape real crawl PNGs have (ratio-based so
    host weather cancels out)."""
    import time

    from lsh_qd_spark.multimodal import _native_unfilter, _png_unfilter

    rng = np.random.default_rng(43)
    for _ in range(25):
        h, w, ch = (
            int(rng.integers(1, 16)),
            int(rng.integers(1, 16)),
            int(rng.integers(1, 5)),
        )
        da = rng.integers(0, 256, (h, w * ch + 1), dtype=np.uint8)
        da[:, 0] = rng.integers(0, 5, h)
        got_np = _png_unfilter(da, h, w, ch, use_native=False)
        if _native_unfilter() is not None:
            got_nat = _png_unfilter(da, h, w, ch, use_native=True)
            assert np.array_equal(got_np, got_nat), (h, w, ch)

    # speed: per-byte reference loop vs the shipped path, same host, same
    # input — the round-4 implementation was this reference loop
    h, w, ch = 256, 256, 3
    da = rng.integers(0, 256, (h, w * ch + 1), dtype=np.uint8)
    da[:, 0] = 4

    def ref_per_byte(data_arr):
        stride = w * ch
        out = np.zeros((h, stride), np.uint8)
        prev = [0] * stride
        for y in range(h):
            row = data_arr[y, 1:].tolist()
            rec = [0] * stride
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (row[x] + pred) & 255
            out[y] = rec
            prev = rec
        return out.reshape(h, w, ch)

    t0 = time.perf_counter()
    ref = ref_per_byte(da)
    t_ref = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = _png_unfilter(da, h, w, ch)  # native if available, else wavefront
    t_new = time.perf_counter() - t0
    assert np.array_equal(ref, got)
    # native is ~30x, pure wavefront ~3.5x; require >2x so the assertion
    # holds on the wavefront-only path under any host weather
    assert t_ref / t_new > 2.0, (t_ref, t_new)


def test_media_near_dup_palette_png(spark):
    """Planted palette-PNG dedup alongside the RGB/gray ones (VERDICT r4
    #4 'done' bar): palette-quantized crawl images ride through
    media_near_dup with real PLTE expansion in the decode."""
    from lsh_qd_spark.multimodal import (
        encode_png_palette,
        media_near_dup,
        png_feature_decoder,
    )

    rng = np.random.default_rng(47)
    rows, truth = [], set()
    for i in range(12):
        pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
        idx = rng.integers(0, 64, (48, 64), dtype=np.uint8)
        # near-dup: a few index flips — decoded pixels stay ~identical
        idx2 = idx.copy()
        flips = rng.integers(0, idx.size, 20)
        idx2.flat[flips] = rng.integers(0, 64, 20)
        rows.append(
            (2 * i, "image", encode_png_palette(idx, pal, filter_type=i % 5),
             "image/png", 64, 48, None)
        )
        rows.append(
            (2 * i + 1, "image", encode_png_palette(idx2, pal, filter_type=4),
             "image/png", 64, 48, None)
        )
        truth.add((2 * i, 2 * i + 1))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup(
            media, png_feature_decoder(), cosine_threshold=0.9
        ).collect()
    }
    assert got == truth


def test_png_adam7_roundtrip_all_shapes_and_filters():
    """Adam7 interlaced encode→decode is identity, including the shapes
    where some passes are empty (tiny/thin images) and every filter."""
    from lsh_qd_spark.multimodal import decode_png, encode_png_adam7

    rng = np.random.default_rng(53)
    shapes = [
        (1, 1), (1, 9), (7, 1), (8, 8, 3), (9, 9, 4), (48, 64, 3),
        (5, 3, 2), (16, 16),
    ]
    for shape in shapes:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            got = decode_png(encode_png_adam7(img, filter_type=ft))
            assert got.shape == img.shape, (shape, ft)
            assert np.array_equal(got, img), (shape, ft)


def test_png_adam7_cross_validates_against_jvm_imageio(spark):
    """Independent oracle for the interlace path: javax.imageio reads our
    Adam7 encoder's output pixel-exact."""
    from lsh_qd_spark.multimodal import encode_png_adam7

    jvm = spark._jvm
    img = np.random.default_rng(54).integers(0, 256, (11, 13, 3), dtype=np.uint8)
    bis = jvm.java.io.ByteArrayInputStream(
        bytearray(encode_png_adam7(img, filter_type=4))
    )
    bimg = jvm.javax.imageio.ImageIO.read(bis)
    assert bimg is not None and (bimg.getHeight(), bimg.getWidth()) == (11, 13)
    for y in range(11):
        for x in range(13):
            argb = bimg.getRGB(x, y)
            assert (
                (argb >> 16) & 255,
                (argb >> 8) & 255,
                argb & 255,
            ) == tuple(int(v) for v in img[y, x]), (y, x)


def test_png_bit_depths_16_and_subbyte():
    """Round-5 depth matrix: 16-bit (decoder takes the high byte), and
    1/2/4-bit gray (exact scaling) and palette (packed indices), across
    all five filters and both interlace modes."""
    from lsh_qd_spark.multimodal import (
        decode_png,
        encode_png16,
        encode_png_adam7,
        encode_png_lowdepth,
    )

    rng = np.random.default_rng(61)
    # 16-bit plain + interlaced
    for shape in [(9, 7), (6, 5, 3), (4, 4, 4), (1, 1, 2), (13, 11, 3)]:
        hi = rng.integers(0, 256, shape, dtype=np.uint16)
        img16 = (hi << 8) | rng.integers(0, 256, shape, dtype=np.uint16)
        for ft in range(5):
            got = decode_png(encode_png16(img16, filter_type=ft))
            assert np.array_equal(got, hi.astype(np.uint8)), (shape, ft)
        got = decode_png(encode_png_adam7(img16, filter_type=4))
        assert np.array_equal(got, hi.astype(np.uint8)), shape
    # sub-byte gray + palette, plain + interlaced, odd widths (pad bits)
    for d in (1, 2, 4):
        n = 1 << d
        scale = 255 // (n - 1)
        codes = rng.integers(0, n, (11, 13), dtype=np.uint8)
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        for ft in range(5):
            got = decode_png(encode_png_lowdepth(codes, d, filter_type=ft))
            assert np.array_equal(got, (codes * scale).astype(np.uint8))
            got = decode_png(
                encode_png_lowdepth(codes, d, palette=pal, filter_type=ft)
            )
            assert np.array_equal(got, pal[codes]), (d, ft)
        for payload in (
            encode_png_lowdepth(codes, d, interlace=True, filter_type=2),
            encode_png_lowdepth(
                codes, d, palette=pal, interlace=True, filter_type=4
            ),
        ):
            got = decode_png(payload)
            assert got.shape[:2] == (11, 13)
    # illegal depth/color combos rejected (16-bit palette, 2-bit RGB)
    import struct
    import zlib

    from lsh_qd_spark.multimodal import _png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    bad = (
        sig
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", bytes(6))
        + _png_chunk(b"IDAT", zlib.compress(bytes(40)))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth 16 invalid"):
        decode_png(bad)
    bad2 = (
        sig
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 2, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(16)))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth 2 invalid"):
        decode_png(bad2)


def test_png_depth_matrix_cross_validates_against_jvm_imageio(spark):
    """Independent oracle for the new depth paths: javax.imageio reads our
    4-bit palette and 16-bit RGB output pixel-exact (16-bit compared on
    the high byte, the decoder's stated reduction)."""
    from lsh_qd_spark.multimodal import encode_png16, encode_png_lowdepth

    jvm = spark._jvm
    rng = np.random.default_rng(62)

    def jvm_rgb(payload: bytes, h: int, w: int) -> np.ndarray:
        bis = jvm.java.io.ByteArrayInputStream(bytearray(payload))
        bimg = jvm.javax.imageio.ImageIO.read(bis)
        assert bimg is not None
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                argb = bimg.getRGB(x, y)
                out[y, x] = ((argb >> 16) & 255, (argb >> 8) & 255, argb & 255)
        return out

    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 7), dtype=np.uint8)
    got = jvm_rgb(encode_png_lowdepth(idx, 4, palette=pal, filter_type=1), 9, 7)
    assert np.array_equal(got, pal[idx])

    hi = rng.integers(0, 256, (8, 6, 3), dtype=np.uint16)
    img16 = (hi << 8) | hi  # replicate high byte so 16→8 is exact both ways
    got = jvm_rgb(encode_png16(img16, filter_type=4), 8, 6)
    assert np.array_equal(got, hi.astype(np.uint8))


# ---------------------------------------------------------------------------
# Baseline JPEG (round 5): the dominant crawl image format, decoded with
# pure NumPy — previously stubbed behind require_decoder("needs PIL")


def _smooth_image(seed: int, h: int = 40, w: int = 56) -> np.ndarray:
    """JPEG-friendly structured content (random per-pixel noise is
    adversarial to DCT quantization and would need useless tolerances).
    The low-frequency structure is SEED-dependent — a coarse random grid
    upscaled — so different seeds give genuinely different images (the
    near-dup tests depend on cross-image features being far apart)."""
    r = np.random.default_rng(seed)
    coarse = r.uniform(0, 255, (5, 7, 3))
    img = np.kron(coarse, np.ones(((h + 4) // 5, (w + 6) // 7, 1)))[:h, :w]
    img = img + r.normal(0, 5, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_quality_and_modes():
    from lsh_qd_spark.multimodal import decode_jpeg, encode_jpeg_baseline

    img = _smooth_image(71)
    # quality 100 4:4:4 — quant tables collapse to 1: near-lossless
    got = decode_jpeg(encode_jpeg_baseline(img, quality=100))
    assert got.shape == img.shape
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 3
    # grayscale
    g = img[:, :, 0]
    got = decode_jpeg(encode_jpeg_baseline(g, quality=100))
    assert got.shape == g.shape
    assert int(np.abs(got.astype(int) - g.astype(int)).max()) <= 3
    # lossy qualities, both subsamplings, odd dimensions, restart markers.
    # 4:2:0 halves chroma resolution: on this content's hard color edges
    # the loss vs the ORIGINAL is genuinely large (any decoder's would
    # be) — the tight cross-decoder agreement lives in the ImageIO test.
    odd = _smooth_image(72, h=37, w=51)
    for kw, mean_tol in (
        (dict(quality=90), 6),
        (dict(quality=85, subsampling="420"), 14),
        (dict(quality=90, restart_interval=3), 6),
        (dict(quality=90, subsampling="420", restart_interval=2), 14),
    ):
        got = decode_jpeg(encode_jpeg_baseline(odd, **kw))
        d = np.abs(got.astype(int) - odd.astype(int))
        assert got.shape == odd.shape, kw
        assert float(d.mean()) < mean_tol, (kw, d.max(), d.mean())
        if "subsampling" not in kw:
            assert int(d.max()) < 48, (kw, d.max())
    # tiny images exercise the single-MCU edge
    for shape in ((1, 1, 3), (3, 9, 3), (8, 8, 3)):
        t = np.clip(
            np.random.default_rng(73).normal(128, 20, shape), 0, 255
        ).astype(np.uint8)
        assert decode_jpeg(encode_jpeg_baseline(t, quality=100)).shape == shape


def test_jpeg_error_paths_total():
    import struct

    from lsh_qd_spark.multimodal import decode_jpeg, encode_jpeg_baseline

    img = _smooth_image(74, h=16, w=16)
    payload = encode_jpeg_baseline(img, quality=90)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(payload[:30])  # truncated mid-segment
    # genuinely unsupported process (SOF3 lossless) rejected loudly
    sof_at = payload.index(b"\xff\xc0")
    lossless = bytearray(payload)
    lossless[sof_at + 1] = 0xC3
    with pytest.raises(ValueError, match="unsupported JPEG process"):
        decode_jpeg(bytes(lossless))
    # a sequential stream RELABELED progressive (round 5 supports real
    # SOF2): the scan header is inconsistent for progressive → ValueError
    prog = bytearray(payload)
    prog[sof_at + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))
    # corrupted entropy data: clean ValueError or a decoded (wrong) image,
    # never an unhandled crash
    rng = np.random.default_rng(75)
    for _ in range(25):
        broken = bytearray(payload)
        pos = int(rng.integers(2, len(broken) - 2))
        broken[pos] ^= 0xFF
        try:
            decode_jpeg(bytes(broken))
        except ValueError:
            pass
    # absurd declared dimensions rejected before allocation
    huge = bytearray(payload)
    struct.pack_into(">HH", huge, sof_at + 5, 65000, 65000)
    with pytest.raises(ValueError, match="cap"):
        decode_jpeg(bytes(huge))


def test_jpeg_cross_validates_against_jvm_imageio(spark):
    """Two-sided independent oracle: javax.imageio DECODES our encoder's
    bitstream (444, 420, restart markers — proving it is spec-legal) to
    within IDCT/upsample rounding of our own decode, and our decoder
    reads an ImageIO-WRITTEN (libjpeg-shaped, 4:2:0) file."""
    from lsh_qd_spark.multimodal import decode_jpeg, encode_jpeg_baseline

    jvm = spark._jvm
    img = _smooth_image(76, h=24, w=31)

    def jvm_read(payload: bytes) -> np.ndarray:
        bis = jvm.java.io.ByteArrayInputStream(bytearray(payload))
        bimg = jvm.javax.imageio.ImageIO.read(bis)
        assert bimg is not None, "ImageIO could not parse our bitstream"
        h, w = bimg.getHeight(), bimg.getWidth()
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                argb = bimg.getRGB(x, y)
                out[y, x] = (
                    (argb >> 16) & 255, (argb >> 8) & 255, argb & 255
                )
        return out

    for kw, tol in (
        (dict(quality=95), 4),  # 4:4:4 — IDCT rounding only
        (dict(quality=90, restart_interval=2), 4),
        (dict(quality=90, subsampling="420"), 16),  # fancy-vs-nearest chroma
    ):
        pay = encode_jpeg_baseline(img, **kw)
        theirs = jvm_read(pay)
        ours = decode_jpeg(pay)
        d = np.abs(theirs.astype(int) - ours.astype(int))
        assert int(d.max()) <= tol and float(d.mean()) < 3, (kw, d.max())

    # ImageIO-written JPEG (default writer: 4:2:0) through OUR decoder
    h, w = img.shape[:2]
    bimg = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            v = (255 << 24) | (r << 16) | (g << 8) | b
            if v >= 1 << 31:
                v -= 1 << 32
            bimg.setRGB(x, y, v)
    bos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bimg, "jpg", bos)
    pay = bytes(bos.toByteArray())
    ours = decode_jpeg(pay)
    theirs = jvm_read(pay)
    d = np.abs(theirs.astype(int) - ours.astype(int))
    assert int(d.max()) <= 24 and float(d.mean()) < 4, (d.max(), d.mean())


def test_media_near_dup_real_jpeg_decode(spark):
    """The production-adapter contract on REAL lossy-compressed JPEG
    payloads: planted near-identical images ride through media_near_dup
    with actual entropy decode on executors."""
    from lsh_qd_spark.multimodal import (
        encode_jpeg_baseline,
        jpeg_feature_decoder,
        media_near_dup,
    )

    rows, truth = [], set()
    rng = np.random.default_rng(77)
    for i in range(15):
        img = _smooth_image(500 + i, h=48, w=64)
        noisy = np.clip(
            img.astype(np.int16) + rng.integers(-5, 6, img.shape), 0, 255
        ).astype(np.uint8)
        sub = "420" if i % 2 else "444"
        rows.append(
            (2 * i, "image", encode_jpeg_baseline(img, quality=92),
             "image/jpeg", 64, 48, None)
        )
        rows.append(
            (2 * i + 1, "image",
             encode_jpeg_baseline(noisy, quality=88, subsampling=sub),
             "image/jpeg", 64, 48, None)
        )
        truth.add((2 * i, 2 * i + 1))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup(
            media, jpeg_feature_decoder(), cosine_threshold=0.9
        ).collect()
    }
    assert got == truth


def test_media_near_dup_all_formats_one_decoder(spark):
    """One image_feature_decoder() over a column mixing every codec-free
    format — PNG (palette + interlaced), JPEG (420), BMP, PPM — recovers
    the planted pairs across format boundaries."""
    from lsh_qd_spark.multimodal import (
        encode_bmp,
        encode_jpeg_baseline,
        encode_png,
        encode_png_adam7,
        encode_png_palette,
        image_feature_decoder,
        media_near_dup,
    )

    rng = np.random.default_rng(81)
    rows, truth = [], set()
    for i in range(12):
        img = _smooth_image(600 + i, h=48, w=64)
        noisy = np.clip(
            img.astype(np.int16) + rng.integers(-4, 5, img.shape), 0, 255
        ).astype(np.uint8)
        encoders = [
            lambda a: encode_png(a, filter_type=4),
            lambda a: encode_jpeg_baseline(a, quality=92, subsampling="420"),
            lambda a: encode_bmp(a),
            lambda a: encode_ppm(a),
            lambda a: encode_png_adam7(a, filter_type=2),
        ]
        enc_a = encoders[i % len(encoders)]
        enc_b = encoders[(i + 1) % len(encoders)]
        rows.append((2 * i, "image", enc_a(img), "image/any", 64, 48, None))
        rows.append(
            (2 * i + 1, "image", enc_b(noisy), "image/any", 64, 48, None)
        )
        truth.add((2 * i, 2 * i + 1))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup(
            media, image_feature_decoder(), cosine_threshold=0.9
        ).collect()
    }
    assert got == truth
    # unknown magic raises loudly
    from lsh_qd_spark.multimodal import decode_image

    with pytest.raises(ValueError, match="unrecognized image magic"):
        decode_image(b"RIFF0000WEBPVP8 not supported")


def test_jpeg_progressive_cross_validates_against_jvm_imageio(spark):
    """Progressive (SOF2) JPEG: ImageIO writes a real multi-scan
    progressive stream (spectral selection + successive approximation,
    the web's standard progressive shape); our decoder must agree with
    ImageIO's own decode to within IDCT/upsample rounding."""
    from lsh_qd_spark.multimodal import decode_jpeg

    jvm = spark._jvm

    def to_bimg(img):
        h, w = img.shape[:2]
        b = jvm.java.awt.image.BufferedImage(
            w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
        )
        for y in range(h):
            for x in range(w):
                r, g, bl = (int(v) for v in img[y, x])
                v = (255 << 24) | (r << 16) | (g << 8) | bl
                if v >= 1 << 31:
                    v -= 1 << 32
                b.setRGB(x, y, v)
        return b

    def write_prog(img):
        ImageIO = jvm.javax.imageio.ImageIO
        writer = ImageIO.getImageWritersByFormatName("jpg").next()
        param = writer.getDefaultWriteParam()
        param.setProgressiveMode(
            jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT
        )
        bos = jvm.java.io.ByteArrayOutputStream()
        ios = ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(
            None, jvm.javax.imageio.IIOImage(to_bimg(img), None, None), param
        )
        ios.flush()
        return bytes(bos.toByteArray())

    def jvm_read(payload):
        bis = jvm.java.io.ByteArrayInputStream(bytearray(payload))
        bimg = jvm.javax.imageio.ImageIO.read(bis)
        h, w = bimg.getHeight(), bimg.getWidth()
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                argb = bimg.getRGB(x, y)
                out[y, x] = (
                    (argb >> 16) & 255, (argb >> 8) & 255, argb & 255
                )
        return out

    for h, w, seed in ((16, 16, 2), (40, 56, 3), (9, 13, 4), (24, 31, 1)):
        img = _smooth_image(seed, h=h, w=w)
        pay = write_prog(img)
        assert b"\xff\xc2" in pay, "fixture is not progressive"
        ours = decode_jpeg(pay)
        theirs = jvm_read(pay)
        d = np.abs(theirs.astype(int) - ours.astype(int))
        assert int(d.max()) <= 16 and float(d.mean()) < 2, (
            (h, w), d.max(), d.mean()
        )


# ---------------------------------------------------------------------------
# GIF (round 5): LZW + palettes + interlace + transparency


def test_gif_roundtrip_interlace_transparency():
    from lsh_qd_spark.multimodal import decode_gif, decode_image, encode_gif

    rng = np.random.default_rng(91)
    for trial in range(12):
        n = int(rng.integers(1, 257))
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (h, w), dtype=np.uint8)
        interlace = bool(trial % 2)
        tr = int(rng.integers(0, n)) if trial % 3 == 0 else None
        got = decode_gif(
            encode_gif(idx, pal, transparent=tr, interlace=interlace)
        )
        if tr is None:
            assert got.shape == (h, w, 3)
            assert np.array_equal(got, pal[idx]), (trial, h, w)
        else:
            assert got.shape == (h, w, 4)
            assert np.array_equal(got[:, :, :3], pal[idx])
            assert np.array_equal(
                got[:, :, 3],
                np.where(idx == tr, 0, 255).astype(np.uint8),
            )
    # the magic-byte dispatcher routes GIF too
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx = np.arange(8, dtype=np.uint8).reshape(2, 4) % 4
    assert np.array_equal(decode_image(encode_gif(idx, pal)), pal[idx])


def test_gif_error_paths_total():
    from lsh_qd_spark.multimodal import decode_gif, encode_gif

    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    idx = np.zeros((5, 6), dtype=np.uint8)
    payload = encode_gif(idx, pal)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG nope")
    with pytest.raises(ValueError):
        decode_gif(payload[:20])  # truncated inside the color table/blocks
    # byte-flips: clean ValueError or a (wrong) image, never a crash
    rng = np.random.default_rng(92)
    for _ in range(40):
        broken = bytearray(payload)
        pos = int(rng.integers(6, len(broken)))
        broken[pos] ^= 0xFF
        try:
            decode_gif(bytes(broken))
        except ValueError:
            pass


def test_gif_cross_validates_against_jvm_imageio(spark):
    """Two-sided oracle, EXACT both ways (GIF is lossless past
    quantization): ImageIO reads our encoder's trivial-LZW output
    byte-exact (plain + interlaced), and our decoder reads an
    ImageIO-written GIF (real growing-table LZW) exactly as ImageIO
    itself re-reads it."""
    from lsh_qd_spark.multimodal import decode_gif, encode_gif

    jvm = spark._jvm
    rng = np.random.default_rng(93)

    def jvm_read_rgb(payload, h, w):
        bis = jvm.java.io.ByteArrayInputStream(bytearray(payload))
        bimg = jvm.javax.imageio.ImageIO.read(bis)
        assert bimg is not None, "ImageIO could not parse the GIF"
        assert (bimg.getHeight(), bimg.getWidth()) == (h, w)
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                argb = bimg.getRGB(x, y)
                out[y, x] = (
                    (argb >> 16) & 255, (argb >> 8) & 255, argb & 255
                )
        return out

    pal = rng.integers(0, 256, (31, 3), dtype=np.uint8)
    idx = rng.integers(0, 31, (14, 19), dtype=np.uint8)
    for interlace in (False, True):
        pay = encode_gif(idx, pal, interlace=interlace)
        assert np.array_equal(jvm_read_rgb(pay, 14, 19), pal[idx]), interlace

    h, w = 21, 17
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    bimg = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            v = (255 << 24) | (r << 16) | (g << 8) | b
            if v >= 1 << 31:
                v -= 1 << 32
            bimg.setRGB(x, y, v)
    bos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bimg, "gif", bos)
    pay = bytes(bos.toByteArray())
    ours = decode_gif(pay)
    theirs = jvm_read_rgb(pay, h, w)
    assert np.array_equal(ours[:, :, :3], theirs)


def test_wav_all_pcm_widths():
    """decode_wav handles every stdlib-PCM sample width (8/16/24/32-bit),
    mono and stereo-downmixed, to the same normalized float signal."""
    import io
    import wave

    from lsh_qd_spark.multimodal import decode_wav

    t = np.linspace(0, 1, 4000, endpoint=False)
    x = 0.5 * np.sin(2 * np.pi * 330 * t)

    def make(width: int, n_ch: int = 1) -> bytes:
        sig = np.repeat(x[:, None], n_ch, axis=1).ravel()
        if width == 1:
            raw = (np.clip(sig, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
        elif width == 2:
            raw = (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes()
        elif width == 3:
            v = (np.clip(sig, -1, 1) * ((1 << 23) - 1)).astype(np.int64)
            v = np.where(v < 0, v + (1 << 24), v)
            b = np.zeros((len(v), 3), dtype=np.uint8)
            b[:, 0] = v & 255
            b[:, 1] = (v >> 8) & 255
            b[:, 2] = (v >> 16) & 255
            raw = b.tobytes()
        else:
            raw = (np.clip(sig, -1, 1) * ((1 << 31) - 1)).astype("<i4").tobytes()
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(n_ch)
            f.setsampwidth(width)
            f.setframerate(8000)
            f.writeframes(raw)
        return buf.getvalue()

    for width, tol in ((1, 2e-2), (2, 1e-3), (3, 1e-5), (4, 1e-6)):
        y, rate = decode_wav(make(width))
        assert rate == 8000 and len(y) == len(x)
        assert float(np.abs(y - x).max()) < tol, width
        # stereo downmix of identical channels reproduces the mono signal
        y2, _ = decode_wav(make(width, n_ch=2))
        assert float(np.abs(y2 - x).max()) < tol, width


def test_gif_frame_dimension_bomb_rejected():
    """Round-5 review fix: a tiny logical screen with a huge image
    descriptor must be rejected before any pixel allocation."""
    import struct

    from lsh_qd_spark.multimodal import decode_gif

    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 1, 1, 0x80, 0, 0)  # 1x1 screen, 2-entry GCT
        + bytes(6)  # global color table
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 65535, 65535, 0)  # huge frame
        + bytes([2, 1, 0x44, 0])  # min_code + one sub-block + terminator
        + b"\x3b"
    )
    with pytest.raises(ValueError, match="frame dimensions"):
        decode_gif(payload)


def test_gif_truncated_descriptor_is_valueerror():
    """Round-5 review fix: truncation inside the image descriptor must be
    a ValueError, not a struct.error escaping the totality contract."""
    import struct

    from lsh_qd_spark.multimodal import decode_gif

    payload = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x2c\x00"
    with pytest.raises(ValueError):
        decode_gif(payload)


def test_jpeg_fill_bytes_before_restart_marker():
    """Round-5 review fix: T.81 B.1.1.2 allows any number of 0xFF fill
    bytes before a marker — a conformant stream padded before its RSTn
    markers must still decode."""
    from lsh_qd_spark.multimodal import decode_jpeg, encode_jpeg_baseline

    img = _smooth_image(99, h=24, w=24)
    payload = encode_jpeg_baseline(img, quality=95, restart_interval=1)
    clean = decode_jpeg(payload)
    # inject a fill byte before every restart marker
    padded = bytearray()
    i = 0
    while i < len(payload):
        if (
            payload[i] == 0xFF
            and i + 1 < len(payload)
            and 0xD0 <= payload[i + 1] <= 0xD7
        ):
            padded.append(0xFF)  # fill byte
        padded.append(payload[i])
        i += 1
    got = decode_jpeg(bytes(padded))
    assert np.array_equal(got, clean)


def test_jpeg_cmyk_and_dimension_cap_rejected_early():
    """Round-5 review fix: unsupported component counts and over-cap
    dimensions fail from the header, before entropy decode."""
    import struct

    from lsh_qd_spark.multimodal import decode_jpeg, encode_jpeg_baseline

    img = _smooth_image(98, h=8, w=8)
    payload = encode_jpeg_baseline(img, quality=90)
    sof_at = payload.index(b"\xff\xc0")

    # a well-formed 4-component (CMYK-shaped) header: rejected by the
    # count check with no DQT/DHT/entropy work at all
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof4 = struct.pack(">BHHB", 8, 8, 8, 4) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1, 4, 0x11, 1]
    )
    sos4 = bytes([4, 1, 0, 2, 0, 3, 0, 4, 0, 0, 63, 0])
    cmyk = b"\xff\xd8" + seg(0xC0, sof4) + seg(0xDA, sos4) + b"\xff\xd9"
    with pytest.raises(ValueError, match="component count"):
        decode_jpeg(cmyk)
    huge = bytearray(payload)
    struct.pack_into(">HH", huge, sof_at + 5, 40000, 40000)
    with pytest.raises(ValueError, match="cap"):
        decode_jpeg(bytes(huge))


def test_jpeg_grayscale_with_chroma_sampling_factors():
    """T.81: a one-component sequential scan is non-interleaved over the
    component's REAL block grid. A legal grayscale JPEG declaring H/V=2
    (patched SOF byte) must decode to the same pixels as its H/V=1 twin
    — it previously failed with 'invalid JPEG huffman code' because the
    decoder walked the sampling-padded MCU grid (ADVICE.md round 5)."""
    import numpy as np

    from lsh_qd_spark.multimodal import decode_jpeg, encode_jpeg_baseline

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    pay = encode_jpeg_baseline(g, quality=95)
    base = decode_jpeg(pay)
    buf = bytearray(pay)
    i = 2
    patched = None
    while i < len(buf) - 1:
        marker = buf[i + 1]
        seglen = (buf[i + 2] << 8) | buf[i + 3]
        if marker == 0xC0:  # SOF0: ... nf(1), then per-comp id, HV, Tq
            assert buf[i + 9] == 1  # one component
            assert buf[i + 11] == 0x11
            buf[i + 11] = 0x22
            patched = bytes(buf)
            break
        i += 2 + seglen
    assert patched is not None
    out = decode_jpeg(patched)
    assert out.shape == base.shape
    assert np.array_equal(out, base)


def test_jpeg_dequantize_does_not_wrap_int32():
    """A large accumulated DC predictor times a 16-bit quant entry can
    exceed int32; the dequantize must widen to int64 so the sample
    saturates (255) instead of wrapping negative (0) — ADVICE.md."""
    import numpy as np

    from lsh_qd_spark.multimodal import _jpeg_reconstruct

    coef = np.zeros((1, 64), dtype=np.int32)
    coef[0, 0] = 300_000  # legal int32 DC accumulation
    q = np.zeros(64, dtype=np.int64)
    q[0] = 10_000  # 16-bit DQT entry; product 3e9 wraps int32
    st = {"coef": coef, "q": q, "bw": 1, "bh": 1, "H": 1, "V": 1}
    plane = _jpeg_reconstruct(8, 8, [st], 1, 1)
    assert plane.shape == (8, 8)
    # huge positive DC -> every sample saturates high
    assert (plane == 255).all()
