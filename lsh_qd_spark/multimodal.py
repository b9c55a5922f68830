"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extraction are Arrow-batched ``mapInPandas`` kernels.

Decode is REAL for codec-free formats: PPM/PGM/BMP images, zlib-
compressed PNG (``decode_png`` — pure stdlib inflate + full filter-set
unfilter), and PCM WAV audio all decode with pure NumPy/stdlib, and
feature extraction is real too — 8×8 block-mean luminance (the classic
aHash-style perceptual embedding) for images, per-window RMS energy +
zero-crossing rate for audio. Formats that need external codecs
(JPEG/ffmpeg/mp3) are STUBBED behind the same interface:
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
    """Codec-dependent formats (JPEG/mp3/video) need PIL/ffmpeg — absent
    in this environment by design. PPM/PGM/BMP/PNG/WAV decode IS
    available codec-free: ``*_feature_decoder``."""
    raise NotImplementedError(
        f"no {kind} codec in this environment; pass decode_fn= explicitly "
        "(production: PIL.Image.open / soundfile.read / frame sampler; "
        "codec-free: ppm/pgm/bmp/png_feature_decoder() / "
        "wav_feature_decoder())"
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (3 = palette, unsupported without PLTE)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode: chunk walk + CRC check + zlib inflate +
    per-scanline unfilter (None/Sub/Up/Average/Paeth — the full RFC 2083
    filter set). Non-interlaced 8-bit gray / gray+alpha / RGB / RGBA
    (color types 0/4/2/6). Returns (H, W) uint8 for grayscale, else
    (H, W, C). The fourth real codec-free format next to PPM/PGM/BMP —
    and the first COMPRESSED one, so the production-adapter contract
    (tests/test_multimodal_codecs.py) runs un-skipped in this sandbox.

    Sub unfilters as a vectorized per-lane cumulative sum; Up is a
    vectorized add against the prior scanline; Average/Paeth carry a
    genuine serial dependency along x and run one NumPy step per pixel
    column (bounded by image width; the kernel already runs per-payload
    inside Arrow-batched ``mapInPandas`` on executors).
    """
    import struct
    import zlib

    if not payload or not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    ihdr = None
    idat: list[bytes] = []
    i = len(_PNG_SIG)
    while i + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, i), payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) < length or i + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, i + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (bit depth {depth})")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = _PNG_CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(
            f"unsupported PNG color type {color_type} (palette needs PLTE)"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG raster")
    data_arr = (
        np.frombuffer(raw, dtype=np.uint8)[: h * (stride + 1)]
        .reshape(h, stride + 1)
    )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = int(data_arr[y, 0])
        row = data_arr[y, 1:].astype(np.int32)
        if ftype == 0:
            rec = row
        elif ftype == 1:  # Sub: per-lane prefix sum
            rec = (np.cumsum(row.reshape(w, ch), axis=0) % 256).ravel()
        elif ftype == 2:  # Up
            rec = (row + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: serial in x
            # plain-int bytearray loop: one Python int op per byte beats
            # per-pixel length-ch ndarray ops by ~an order of magnitude
            # (libpng's adaptive filtering emits mostly Paeth/Average, so
            # this IS the hot path for real-world PNGs)
            rec_b = bytearray(stride)
            prow = prev.tolist()
            rowl = row.tolist()
            if ftype == 3:
                for x in range(stride):
                    a = rec_b[x - ch] if x >= ch else 0
                    rec_b[x] = (rowl[x] + ((a + prow[x]) >> 1)) & 255
            else:
                for x in range(stride):
                    a = rec_b[x - ch] if x >= ch else 0
                    b = prow[x]
                    c = prow[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pred = (
                        a
                        if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                    rec_b[x] = (rowl[x] + pred) & 255
            rec = np.frombuffer(bytes(rec_b), dtype=np.uint8).astype(
                np.int32
            )
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int32)
    img = out.reshape(h, w, ch)
    return img[:, :, 0].copy() if ch == 1 else img


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W[, C]) uint8 → non-interlaced 8-bit PNG. ``filter_type``
    applies one RFC 2083 filter (0–4) to every scanline — the decode
    tests use it to exercise each unfilter path against real zlib-
    compressed bytes. Filtering is fully vectorized (the RECON plane is
    already known when encoding, unlike decoding)."""
    import struct
    import zlib

    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"unknown PNG filter type {filter_type}")
    rows = arr.reshape(h, w * ch).astype(np.int16)
    left = np.zeros_like(rows)
    left[:, ch:] = rows[:, :-ch]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    upleft = np.zeros_like(rows)
    upleft[1:, ch:] = rows[:-1, :-ch]
    if filter_type == 0:
        filtered = rows
    elif filter_type == 1:
        filtered = rows - left
    elif filter_type == 2:
        filtered = rows - up
    elif filter_type == 3:
        filtered = rows - ((left + up) >> 1)
    else:
        p = left + up - upleft
        pa = np.abs(p - left)
        pb = np.abs(p - up)
        pc = np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        filtered = rows - pred
    body = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8),
         (filtered % 256).astype(np.uint8)],
        axis=1,
    ).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body, 6))
        + chunk(b"IEND", b"")
    )


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


def png_feature_decoder(grid: int = 8) -> Callable[[bytes], np.ndarray]:
    """payload → 64-dim perceptual feature (decode_png + image_feature).
    Alpha never feeds luminance: RGBA drops to RGB, gray+alpha to gray."""

    def decode(payload: bytes) -> np.ndarray:
        arr = decode_png(payload)
        if arr.ndim == 3 and arr.shape[2] == 2:
            arr = arr[:, :, 0]
        elif arr.ndim == 3 and arr.shape[2] == 4:
            arr = arr[:, :, :3]
        return image_feature(arr, grid)

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
