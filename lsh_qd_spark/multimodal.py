"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extraction are Arrow-batched ``mapInPandas`` kernels.

Decode is REAL for codec-free formats: PPM (P6) images and PCM WAV audio
decode with pure NumPy/stdlib (``decode_ppm`` / ``decode_wav``), and
feature extraction is real too — 8×8 block-mean luminance (the classic
aHash-style perceptual embedding) for images, per-window RMS energy +
zero-crossing rate for audio. Formats that need external codecs
(JPEG/PNG/ffmpeg) are STUBBED behind the same interface:
``decode_fn=None`` raises ``NotImplementedError`` eagerly; production
passes ``PIL.Image.open`` / ``soundfile.read`` there. The dedup path
downstream of decode is fully real either way: features →
hyperplane-LSH buckets → candidate pairs → cosine verify
(operators/ann.py), identical to the text path's shape.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)

FEATURE_SCHEMA = "media_id long, feature array<float>, feat_dim int"


def require_decoder(kind: str) -> Callable[[bytes], np.ndarray]:
    """Codec-dependent formats (JPEG/PNG/mp3/video) need PIL/ffmpeg —
    absent in this environment by design. PPM/WAV decode IS available:
    ``ppm_feature_decoder`` / ``wav_feature_decoder``."""
    raise NotImplementedError(
        f"no {kind} codec in this environment; pass decode_fn= explicitly "
        "(production: PIL.Image.open / soundfile.read / frame sampler; "
        "codec-free: ppm_feature_decoder() / wav_feature_decoder())"
    )


# ---------------------------------------------------------------------------
# Real, codec-free decoders (pure NumPy/stdlib)
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes, magic: bytes, fmt: str) -> tuple[int, int, int]:
    """Parse a binary PNM header (P5/P6): whitespace-separated tokens with
    ``#`` comments, maxval ≤ 255. Returns (width, height, raster_offset)."""
    if not payload or not payload.startswith(magic):
        raise ValueError(f"not a binary {fmt} ({magic.decode()}) payload")
    # tokenize the header byte-by-byte (comments run to end of line)
    tokens: list[bytes] = []
    i = 2
    cur = b""
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            # a comment is whitespace-equivalent and may START mid-token
            # ('100#c\n200'): flush the current token first, or width and
            # height merge into one number
            if cur:
                tokens.append(cur)
                cur = b""
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            if cur:
                tokens.append(cur)
                cur = b""
        else:
            cur += c
        i += 1
    if len(tokens) < 3:
        raise ValueError(f"truncated {fmt} header")
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError(f"16-bit {fmt} not supported")
    return w, h, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (H, W, 3) uint8 array."""
    w, h, i = _pnm_header(payload, b"P6", "PPM")
    raster = payload[i : i + w * h * 3]
    if len(raster) < w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_pgm(payload: bytes) -> np.ndarray:
    """Binary PGM (P5, grayscale) → (H, W) uint8 array. Same header
    grammar as PPM; one byte per pixel."""
    w, h, i = _pnm_header(payload, b"P5", "PGM")
    raster = payload[i : i + w * h]
    if len(raster) < w * h:
        raise ValueError("truncated PGM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w).copy()


def encode_pgm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P5\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) → (H, W, 3)
    uint8 RGB array. Pure struct/NumPy: handles the 4-byte row padding and
    the bottom-up (positive height) / top-down (negative height) raster
    orders. The third codec-free real format next to PPM/PGM."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    raster = payload[data_offset : data_offset + stride * h]
    if len(raster) < stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP."""
    import struct

    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = (
        np.ascontiguousarray(img[::-1, :, ::-1], dtype=np.uint8).reshape(h, -1)
    )
    raster = rows.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(raster), 0, 0, 54,
        40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0,
    )
    return header + raster


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (mono float32 in [-1, 1], sample_rate). stdlib ``wave``
    handles the RIFF framing; NumPy converts/downmixes."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as f:
        rate = f.getframerate()
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav(x: np.ndarray, rate: int) -> bytes:
    import io
    import wave

    pcm = np.clip(np.asarray(x, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm16.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Real feature extraction (vectorized NumPy, no codec deps)
# ---------------------------------------------------------------------------


def image_feature(img: np.ndarray, grid: int = 8) -> np.ndarray:
    """8×8 block-mean luminance, mean-centered and L2-normalized — the
    perceptual aHash embedding. Arbitrary (H, W) bins to the grid with a
    single bincount (no per-block Python loop)."""
    h, w = img.shape[:2]
    gray = (
        img.astype(np.float32)
        if img.ndim == 2  # grayscale (PGM / PIL mode "L")
        else img.astype(np.float32)[:, :, :3].mean(axis=2)
    )
    rb = np.arange(h, dtype=np.int64) * grid // h
    cb = np.arange(w, dtype=np.int64) * grid // w
    bins = (rb[:, None] * grid + cb[None, :]).ravel()
    sums = np.bincount(bins, weights=gray.ravel(), minlength=grid * grid)
    counts = np.bincount(bins, minlength=grid * grid)
    means = (sums / np.maximum(counts, 1)).astype(np.float32)
    v = means - means.mean()
    n = float(np.linalg.norm(v))
    if n > 0:
        return v / n
    m = float(np.linalg.norm(means))
    if m > 0:
        return means / m  # constant non-black frame
    # all-black frame: a zero vector would make cosine NULL downstream
    # (try_divide) and silently drop even byte-identical duplicates — map
    # every dead frame to one canonical unit vector instead, so identical
    # blanks still bucket together and verify at cosine 1.0
    out = np.zeros(grid * grid, dtype=np.float32)
    out[0] = 1.0
    return out


def audio_feature(x: np.ndarray, n_windows: int = 32) -> np.ndarray:
    """Per-window RMS energy + zero-crossing rate (2·n_windows dims),
    L2-normalized. Window sums via ``reduceat`` — no Python loop."""
    n = len(x)
    if n == 0:
        return np.zeros(2 * n_windows, dtype=np.float32)
    bounds = (np.arange(n_windows, dtype=np.int64) * n) // n_windows
    sq = np.add.reduceat(x.astype(np.float64) ** 2, bounds)
    sb = np.signbit(x).astype(np.int8)
    crossings = np.concatenate([[0.0], np.abs(np.diff(sb)).astype(np.float64)])
    zc = np.add.reduceat(crossings, bounds)
    widths = np.diff(np.append(bounds, n))
    # reduceat quirk: a zero-width window (duplicate bounds when
    # n < n_windows) yields x[bounds[i]], NOT 0 — without masking, a
    # short clip double-counts samples into phantom windows
    empty = widths == 0
    sq[empty] = 0.0
    zc[empty] = 0.0
    feat = np.concatenate(
        [np.sqrt(sq / np.maximum(widths, 1)), zc / np.maximum(widths, 1)]
    ).astype(np.float32)
    norm = float(np.linalg.norm(feat))
    if norm > 0:
        return feat / norm
    # all-silent clip: same canonical-unit treatment as image_feature —
    # a zero feature would NULL the cosine and drop identical silences
    feat[0] = 1.0
    return feat


def ppm_feature_decoder(grid: int = 8) -> Callable[[bytes], np.ndarray]:
    """payload → 64-dim perceptual feature (decode_ppm + image_feature)."""

    def decode(payload: bytes) -> np.ndarray:
        return image_feature(decode_ppm(payload), grid)

    return decode


def wav_feature_decoder(n_windows: int = 32) -> Callable[[bytes], np.ndarray]:
    """payload → 64-dim energy/ZCR feature (decode_wav + audio_feature)."""

    def decode(payload: bytes) -> np.ndarray:
        x, _rate = decode_wav(payload)
        return audio_feature(x, n_windows)

    return decode


def pgm_feature_decoder(grid: int = 8) -> Callable[[bytes], np.ndarray]:
    """payload → 64-dim perceptual feature (decode_pgm + image_feature)."""

    def decode(payload: bytes) -> np.ndarray:
        return image_feature(decode_pgm(payload), grid)

    return decode


def bmp_feature_decoder(grid: int = 8) -> Callable[[bytes], np.ndarray]:
    """payload → 64-dim perceptual feature (decode_bmp + image_feature)."""

    def decode(payload: bytes) -> np.ndarray:
        return image_feature(decode_bmp(payload), grid)

    return decode


def pil_feature_decoder(grid: int = 8) -> Callable[[bytes], np.ndarray]:
    """Production image decode: any PIL-readable payload (JPEG/PNG/WebP/…)
    → perceptual feature. Runtime-detected — raises the standard stub error
    when Pillow is absent (this sandbox), so the same call site works the
    day a codec exists (tests/test_multimodal_codecs.py skip-if-no-PIL)."""
    try:
        from PIL import Image
    except ImportError:
        require_decoder("PIL image")

    def decode(payload: bytes) -> np.ndarray:
        import io

        with Image.open(io.BytesIO(payload)) as im:
            arr = np.asarray(im.convert("RGB"))
        return image_feature(arr, grid)

    return decode


def soundfile_feature_decoder(
    n_windows: int = 32,
) -> Callable[[bytes], np.ndarray]:
    """Production audio decode: any libsndfile-readable payload (FLAC/OGG/
    WAV/…) → energy/ZCR feature. Runtime-detected like the PIL path."""
    try:
        import soundfile
    except ImportError:
        require_decoder("soundfile audio")

    def decode(payload: bytes) -> np.ndarray:
        import io

        x, _rate = soundfile.read(io.BytesIO(payload), dtype="float32")
        if x.ndim > 1:
            x = x.mean(axis=1)
        return audio_feature(x, n_windows)

    return decode


def deterministic_fake_decoder(dim: int = 64) -> Callable[[bytes], np.ndarray]:
    """Content-addressed fake 'decode': bytes → unit vector seeded by a
    CRC of the payload. Byte-identical media → identical features, so the
    whole downstream near-dup path is exercised realistically."""
    import zlib

    def decode(payload: bytes) -> np.ndarray:
        rng = np.random.default_rng(zlib.crc32(payload or b""))
        v = rng.standard_normal(dim).astype(np.float32)
        return v / np.linalg.norm(v)

    return decode


def _decode_chunk(
    pdf: pd.DataFrame, decode_fn: Callable[[bytes], np.ndarray]
) -> pd.DataFrame:
    # NULL payloads carry no content: drop the row (the empty-set skip
    # convention, functions/fast_shingle.py) instead of handing None to
    # decode_fn — one null row would otherwise fail the task 4× and
    # abort the whole multi-TB extract job
    pdf = pdf[pdf["payload"].notna()]
    feats = [decode_fn(p) for p in pdf["payload"]]
    # explicit dtypes: an all-NULL chunk yields an EMPTY frame, and
    # pandas' default empty-column dtype (float64) breaks the Arrow
    # list<float> conversion for the feature column
    return pd.DataFrame(
        {
            "media_id": pd.Series(
                pdf["media_id"].to_numpy(), dtype="int64"
            ),
            "feature": pd.Series(
                [f.tolist() for f in feats], dtype="object"
            ),
            "feat_dim": pd.Series(
                [len(f) for f in feats], dtype="int64"
            ),
        }
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    batch_limit_bytes: int = 256 << 20,
) -> DataFrame:
    """media(binary payload) → (media_id, feature, feat_dim).

    ``mapInPandas`` so each Arrow batch holds full binary payloads exactly
    once; heavy rows are bounded by repartitioning upstream (payload column
    never passes through a shuffle here — narrow map over the scan).
    ``batch_limit_bytes`` bounds how many payload bytes are DECODED per
    chunk: an Arrow batch of large media rows is split so decoded feature
    lists never hold more than the cap's worth of source payloads at once.
    """
    if decode_fn is None:
        require_decoder("media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            start = 0
            acc = 0
            for i, p in enumerate(pdf["payload"]):
                acc += len(p) if p is not None else 0
                # flush BEFORE exceeding the cap (each chunk keeps >=1 row
                # so a single over-cap payload still decodes)
                if acc > batch_limit_bytes and i > start:
                    yield _decode_chunk(pdf.iloc[start:i], decode_fn)
                    start, acc = i, len(p) if p is not None else 0
            if start < len(pdf):
                yield _decode_chunk(pdf.iloc[start:], decode_fn)

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def media_near_dup(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    cosine_threshold: float = 0.98,
    n_tables: int = 8,
    bits_per_table: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cosine): near-duplicate media via hyperplane-LSH bucket
    join + exact cosine verify — the image-dedup workload named in the
    reference's notes (/root/reference/notes_from_chris.txt:7), with the
    decode stage stubbed."""
    from lsh_qd_spark.operators.ann import cosine_expr, hyperplane_coefficients, make_hyperplane_udf
    from lsh_qd_spark.operators.pairs import candidate_pairs

    # eager localCheckpoint: feats has THREE consumers in one action (the
    # bucketing explode plus both sides of the verify join) — on a lazy
    # plan the mapInPandas decode kernel re-runs per consumer and rescans
    # the binary payload column three times; decode dominates the job
    # with real codecs. Same discipline as pipeline._MULTI_CONSUMER_STAGES.
    feats = extract_features(media, decode_fn).localCheckpoint(eager=True)
    udf = make_hyperplane_udf(
        hyperplane_coefficients(n_tables, bits_per_table, dim, seed),
        bits_per_table,
    )
    keyed = feats.select(
        F.col("media_id").alias("doc_id"),
        F.posexplode(udf(F.col("feature"))).alias("band_idx", "band_key"),
    )
    cand = candidate_pairs(
        keyed.select("doc_id", "band_idx", "band_key"),
        alpha=1,
        max_bucket_size=10_000,
    )
    side = feats.select(F.col("media_id").alias("_id"), F.col("feature").alias("_f"))
    return (
        cand.join(side.withColumnRenamed("_id", "id_a"), "id_a")
        .withColumnRenamed("_f", "f_a")
        .join(side.withColumnRenamed("_id", "id_b"), "id_b")
        .withColumnRenamed("_f", "f_b")
        .select(
            "id_a",
            "id_b",
            cosine_expr(F.col("f_a"), F.col("f_b")).alias("cosine"),
        )
        .where(F.col("cosine") >= cosine_threshold)
    )
