"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extraction are Arrow-batched ``mapInPandas`` kernels.

Decode is REAL for codec-free formats: PPM/PGM/BMP images, zlib-
compressed PNG (``decode_png`` — pure stdlib inflate + full filter-set
unfilter, every legal bit depth, palette, Adam7), baseline JPEG
(``decode_jpeg`` — pure NumPy Huffman + IDCT, 4:2:0/4:4:4, restart
markers), and PCM WAV audio all decode with pure NumPy/stdlib, and
feature extraction is real too — 8×8 block-mean luminance (the classic
aHash-style perceptual embedding) for images, per-window RMS energy +
zero-crossing rate for audio. Formats that need external codecs
(ffmpeg/mp3/video) are STUBBED behind the same interface:
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
    """Codec-dependent formats (mp3/video) need ffmpeg/soundfile — absent
    in this environment by design. PPM/PGM/BMP/PNG/JPEG/WAV decode IS
    available codec-free: ``*_feature_decoder``."""
    raise NotImplementedError(
        f"no {kind} codec in this environment; pass decode_fn= explicitly "
        "(production: PIL.Image.open / soundfile.read / frame sampler; "
        "codec-free: ppm/pgm/bmp/png/jpeg_feature_decoder() / "
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
# color type → samples per pixel in the RASTER (3 = palette: 1 index byte
# per pixel, expanded through PLTE after unfiltering)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: Adam7 interlace pass grid: (x0, y0, dx, dy) per pass, RFC 2083 §2.6
_ADAM7_GRID = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_passes(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """Non-empty Adam7 passes for a w×h image as
    (x0, y0, dx, dy, pass_width, pass_height)."""
    out = []
    for x0, y0, dx, dy in _ADAM7_GRID:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp > 0 and hp > 0:
            out.append((x0, y0, dx, dy, wp, hp))
    return out


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    """length + type + data + CRC32 framing (shared by all encoders)."""
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


#: channel count → PNG color type (gray / gray+alpha / RGB / RGBA)
_PNG_COLOR_TYPE_BY_CH = {1: 0, 2: 4, 3: 2, 4: 6}


def _png_assemble(
    w: int,
    h: int,
    depth: int,
    color_type: int,
    interlace: int,
    body: bytes,
    extra: tuple = (),
) -> bytes:
    """SIG + IHDR (+ extra chunks, e.g. PLTE/tRNS) + deflated IDAT + IEND
    — the one container-assembly path every encoder shares."""
    import struct
    import zlib

    out = _PNG_SIG + _png_chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace),
    )
    for ctype, data in extra:
        out += _png_chunk(ctype, data)
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(body, 6))
        + _png_chunk(b"IEND", b"")
    )


# decompression-bomb guard: deflate expands up to ~1000x, so a small
# crafted IDAT could otherwise allocate GBs per executor task in a
# pipeline whose stated job is deduping untrusted media. 256 MiB decoded
# raster ≈ a 9200² RGBA image — far beyond any dedup-feature use here.
_PNG_MAX_RASTER_BYTES = 1 << 28


_UNFILTER_C_SRC = r"""
#include <stdint.h>
static int iabs(int v) { return v < 0 ? -v : v; }
void png_unfilter(const uint8_t *data, int64_t h, int64_t w, int64_t ch,
                  uint8_t *out) {
    int64_t stride = w * ch;
    const uint8_t *prev = 0;
    for (int64_t y = 0; y < h; y++) {
        int f = data[y * (stride + 1)];
        const uint8_t *row = data + y * (stride + 1) + 1;
        uint8_t *rec = out + y * stride;
        for (int64_t x = 0; x < stride; x++) {
            int a = x >= ch ? rec[x - ch] : 0;
            int b = prev ? prev[x] : 0;
            int c = (prev && x >= ch) ? prev[x - ch] : 0;
            int pred;
            switch (f) {
                case 0: pred = 0; break;
                case 1: pred = a; break;
                case 2: pred = b; break;
                case 3: pred = (a + b) >> 1; break;
                default: {
                    int p = a + b - c;
                    int pa = iabs(p - a), pb = iabs(p - b), pc = iabs(p - c);
                    pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                }
            }
            rec[x] = (uint8_t)(row[x] + pred);
        }
        prev = rec;
    }
}
"""

#: tri-state: None = not tried yet, False = unavailable, else the ctypes fn
_native_unfilter_fn = None


def _native_unfilter():
    """Best-effort native unfilter kernel: compiled ONCE per host from
    ``_UNFILTER_C_SRC`` with the system C compiler into a content-hashed
    shared object under the temp dir, loaded via ctypes. The serial
    Average/Paeth byte recurrence is the one genuinely scalar loop in the
    whole decode path; at C speed a 512² Paeth RGB image unfilters in
    ~1 ms vs ~60 ms for the vectorized NumPy wavefront and ~220 ms for a
    Python byte loop — the difference between CPU-bound-in-Python and
    codec-bound for an image-heavy crawl corpus. Strictly optional: any
    failure (no compiler, read-only tmp, load error) latches to None and
    decode falls back to the NumPy wavefront with identical results
    (parity is property-tested)."""
    global _native_unfilter_fn
    if _native_unfilter_fn is not None:
        return _native_unfilter_fn or None
    try:
        import ctypes
        import hashlib
        import os
        import subprocess
        import tempfile

        tag = hashlib.sha1(_UNFILTER_C_SRC.encode()).hexdigest()[:12]
        # per-user 0700 cache dir, NOT the shared temp root: a predictable
        # world-writable path would let another local user pre-plant a
        # malicious .so that CDLL below would happily execute
        cache_dir = os.path.join(
            tempfile.gettempdir(), f"lsh_qd_native_{os.getuid()}"
        )
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        st = os.stat(cache_dir)
        if st.st_uid != os.getuid() or (st.st_mode & 0o077):
            raise RuntimeError("native cache dir not exclusively ours")
        so_path = os.path.join(cache_dir, f"png_unfilter_{tag}.so")
        if not os.path.exists(so_path):
            tmp = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-x", "c", "-", "-o", tmp],
                input=_UNFILTER_C_SRC.encode(),
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp, so_path)  # atomic vs concurrent compilers
        st = os.stat(so_path)
        if st.st_uid != os.getuid():
            raise RuntimeError("native kernel not owned by this user")
        lib = ctypes.CDLL(so_path)
        fn = lib.png_unfilter
        fn.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        fn.restype = None
        _native_unfilter_fn = fn
        return fn
    except Exception:  # noqa: BLE001 — purely opportunistic acceleration
        _native_unfilter_fn = False
        return None


def _png_unfilter(
    data_arr: np.ndarray, h: int, w: int, ch: int, use_native: bool = True
) -> np.ndarray:
    """Reverse RFC 2083 scanline filtering. ``data_arr`` is (h, stride+1)
    uint8: one filter-type byte then the filtered scanline. Returns
    (h, w, ch) uint8.

    None/Sub/Up rows have no cross-lane serial dependency and unfilter in
    one vectorized step per scanline (Sub is a per-lane prefix sum, Up a
    shifted add). Average/Paeth rows depend on BOTH the left pixel and
    the previous scanline — a 2D wavefront — so when any row uses them
    the whole image runs as an anti-diagonal sweep: every cell (y, x) on
    diagonal y+x=d depends only on diagonals d-1 and d-2, so each sweep
    step updates a full diagonal of pixels in vectorized NumPy through
    zero-copy strided views (h+w steps total instead of h*w*ch Python
    byte ops — ~40x faster on a 512² Paeth-filtered RGB image, and it
    handles per-row mixed filter types, which real libpng adaptive
    output is)."""
    from numpy.lib.stride_tricks import as_strided

    ft = data_arr[:, 0].astype(np.int64)
    bad = ft[(ft < 0) | (ft > 4)]
    if bad.size:
        raise ValueError(f"unknown PNG filter type {int(bad[0])}")
    if use_native:
        fn = _native_unfilter()
        if fn is not None:
            src = np.ascontiguousarray(data_arr, dtype=np.uint8)
            out = np.empty((h, w * ch), dtype=np.uint8)
            fn(src.ctypes.data, h, w, ch, out.ctypes.data)
            return out.reshape(h, w, ch)
    raw = data_arr[:, 1:].astype(np.int16).reshape(h, w, ch)
    if not np.any(ft >= 3):
        out = np.zeros((h, w, ch), dtype=np.int16)
        prev = np.zeros((w, ch), dtype=np.int16)
        for y in range(h):
            f = ft[y]
            if f == 0:
                out[y] = raw[y]
            elif f == 1:  # Sub: per-lane prefix sum
                out[y] = np.cumsum(raw[y].astype(np.int32), axis=0) % 256
            else:  # Up
                out[y] = (raw[y] + prev) % 256
            prev = out[y]
        return out.astype(np.uint8)
    # Anti-diagonal wavefront over a zero-padded plane: pad one top row
    # and one left pixel-column of zeros so the a/b/c neighbor reads
    # (left, up, up-left) never need boundary branches — the pad IS the
    # spec's "treat out-of-image pixels as zero".
    recP = np.zeros((h + 1, w + 1, ch), dtype=np.int16)
    rawP = np.zeros((h + 1, w + 1, ch), dtype=np.int16)
    rawP[1:, 1:] = raw
    ftP = np.zeros(h + 1, dtype=np.int64)
    ftP[1:] = ft
    # ONE diag-major strided view per plane, built up front: element
    # [d, i] aliases cell (y=i, x=d-i), so each sweep step is plain basic
    # indexing instead of a fresh as_strided call. Rows of the view with
    # d-i outside [0, w] alias addresses we never touch (the y0/y1 loop
    # bounds below keep every access to real in-bounds cells).
    sy, sx, sc = recP.strides
    Arec = as_strided(recP, shape=(h + w + 1, h + 1, ch), strides=(sx, sy - sx, sc))
    Araw = as_strided(rawP, shape=(h + w + 1, h + 1, ch), strides=(sx, sy - sx, sc))
    # preallocated temporaries (sliced to each diagonal's length): the
    # sweep's cost is NumPy call overhead, so every op below is out=
    uniform = int(ft[0]) if (ft == ft[0]).all() else None
    T1 = np.empty((h + 1, ch), dtype=np.int16)
    T2 = np.empty_like(T1)
    T3 = np.empty_like(T1)
    M1 = np.empty((h + 1, ch), dtype=bool)
    M2 = np.empty_like(M1)

    def paeth_pred(a, b, c, n):
        pa = np.subtract(b, c, out=T1[:n])  # |p-a| for p=a+b-c
        np.abs(pa, out=pa)
        pb = np.subtract(a, c, out=T2[:n])
        np.abs(pb, out=pb)
        pc = np.add(a, b, out=T3[:n])
        np.subtract(pc, c, out=pc)
        np.subtract(pc, c, out=pc)
        np.abs(pc, out=pc)
        np.less_equal(pa, pb, out=M1[:n])
        np.less_equal(pa, pc, out=M2[:n])
        np.logical_and(M1[:n], M2[:n], out=M1[:n])
        np.less_equal(pb, pc, out=M2[:n])
        pred = np.where(M2[:n], b, c)
        np.copyto(pred, a, where=M1[:n])
        return pred

    for d in range(2, h + w + 1):
        y0 = max(1, d - w)
        y1 = min(h, d - 1)
        if y1 < y0:
            continue
        n = y1 - y0 + 1
        a = Arec[d - 1, y0 : y0 + n]  # left
        b = Arec[d - 1, y0 - 1 : y0 - 1 + n]  # up
        c = Arec[d - 2, y0 - 1 : y0 - 1 + n]  # up-left
        x = Araw[d, y0 : y0 + n]
        if uniform == 4:  # all-Paeth image (libpng's dominant choice)
            pred = paeth_pred(a, b, c, n)
        elif uniform == 3:
            pred = np.add(a, b, out=T1[:n])
            np.right_shift(pred, 1, out=pred)
        else:  # mixed filter types along the diagonal (uniform 0/1/2
            # images never reach the wavefront, so uniform is 3, 4, or
            # None here)
            f2 = ftP[y0 : y0 + n, None]
            paeth = paeth_pred(a, b, c, n)
            pred = np.where(
                f2 == 1,
                a,
                np.where(
                    f2 == 2,
                    b,
                    np.where(
                        f2 == 3,
                        (a + b) >> 1,
                        np.where(f2 == 4, paeth, np.zeros_like(a)),
                    ),
                ),
            )
        cur = Arec[d, y0 : y0 + n]
        np.add(x, pred, out=cur)
        np.bitwise_and(cur, 255, out=cur)
    return recP[1:, 1:].astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode: chunk walk + CRC check + size-capped zlib
    inflate + vectorized wavefront unfilter (None/Sub/Up/Average/Paeth —
    the full RFC 2083 filter set; see ``_png_unfilter``). Gray /
    gray+alpha / RGB / RGBA / palette (color types 0/4/2/6/3, palette via
    PLTE with optional tRNS → alpha) at every legal bit depth — 1/2/4-bit
    packed rows are unpacked MSB-first (gray scaled exactly to 8-bit),
    16-bit samples downsample to the high byte — both non-interlaced and
    Adam7-interlaced (each pass unfiltered independently, scattered into
    place by strided assignment). Returns
    (H, W) uint8 for grayscale, else (H, W, C). The fourth real
    codec-free format next to PPM/PGM/BMP — and the first COMPRESSED
    one, so the production-adapter contract
    (tests/test_multimodal_codecs.py) runs un-skipped in this sandbox.

    Untrusted-input hardening: the expected raster size is computed from
    IHDR BEFORE inflating and the stream is inflated with an output cap
    (``zlib.decompressobj(...).decompress(data, max_length)``), so a
    crafted high-ratio deflate payload cannot allocate beyond the
    declared dimensions, and declared dimensions themselves are capped
    at ``_PNG_MAX_RASTER_BYTES``. A stream that inflates to MORE than
    the declared raster is rejected outright."""
    import struct
    import zlib

    if not payload or not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    ihdr = None
    idat: list[bytes] = []
    plte: bytes | None = None
    trns: bytes | None = None
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
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IEND":
            break
        i += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    ch = _PNG_CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    # legal (color type → bit depth) matrix, RFC 2083 §4.1.1: sub-byte
    # depths exist only for gray and palette; 16-bit never for palette
    allowed_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                      4: (8, 16), 6: (8, 16)}[color_type]
    if depth not in allowed_depths:
        raise ValueError(
            f"bit depth {depth} invalid for PNG color type {color_type}"
        )
    palette: np.ndarray | None = None
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG (color type 3) missing PLTE chunk")
        if len(plte) % 3 or not 3 <= len(plte) <= 768:
            raise ValueError(f"malformed PLTE length {len(plte)}")
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if trns is not None and len(trns) > len(palette):
            raise ValueError("tRNS longer than palette")
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    passes = (
        _adam7_passes(w, h) if interlace == 1 else [(0, 0, 1, 1, w, h)]
    )

    def _scanline_bytes(wp: int) -> int:
        return (wp * ch * depth + 7) // 8

    # filter "left" distance: whole bytes per pixel, floored to 1 for the
    # sub-byte depths (RFC 2083: filters always operate on BYTES)
    bpp = max(1, (ch * depth) // 8)
    expected = sum(hp * (_scanline_bytes(wp) + 1) for *_xyd, wp, hp in passes)
    if expected > _PNG_MAX_RASTER_BYTES:
        raise ValueError(
            f"PNG raster {expected} bytes exceeds cap {_PNG_MAX_RASTER_BYTES}"
        )
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected)
    if len(raw) < expected:
        raise ValueError("truncated PNG raster")
    # one more capped pull: returns pending output whether it was retained
    # internally (max_length truncation) or still sits in unconsumed_tail.
    # NOT flush(): its arg is only an initial buffer size — flush returns
    # ALL remaining output, which would be the very bomb this guards.
    if d.decompress(d.unconsumed_tail, 1):
        raise ValueError("PNG IDAT inflates beyond the declared raster size")

    def _decode_block(block: bytes, wp: int, hp: int) -> np.ndarray:
        """One (sub-)image: unfilter the packed byte rows, then expand to
        (hp, wp, ch) uint8 pixels according to the bit depth."""
        sb = _scanline_bytes(wp)
        arr = np.frombuffer(block, dtype=np.uint8).reshape(hp, sb + 1)
        # the unfilter kernel thinks in (row, unit, byte) where unit =
        # bpp bytes; packed scanlines are a whole number of units
        rec = _png_unfilter(arr, hp, sb // bpp, bpp).reshape(hp, sb)
        if depth == 8:
            return rec.reshape(hp, wp, ch)
        if depth == 16:
            # network byte order: high byte first; downsample to 8-bit by
            # taking it (the standard 16→8 reduction)
            return rec.reshape(hp, wp, ch, 2)[:, :, :, 0]
        # sub-byte gray / palette indices: unpack d-bit codes, MSB first
        bits = np.unpackbits(rec, axis=1).reshape(hp, -1, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        vals = (bits * weights).sum(axis=2).astype(np.uint8)[:, :wp]
        if color_type == 0:
            # exact d-bit → 8-bit scaling: 255/(2^d-1) is integral here
            vals = (vals * (255 // ((1 << depth) - 1))).astype(np.uint8)
        return vals[:, :, None]

    if interlace == 0:
        img = _decode_block(raw, w, h)
    else:
        # Adam7: each pass is an independently filtered sub-image —
        # unfilter per pass, scatter into place via strided assignment
        img = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy, wp, hp in passes:
            n = hp * (_scanline_bytes(wp) + 1)
            img[y0::dy, x0::dx] = _decode_block(raw[off : off + n], wp, hp)
            off += n
    if palette is not None:
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of PLTE range")
        rgb = palette[idx]  # (H, W, 3)
        if trns is None:
            return rgb.copy()
        alpha_lut = np.full(len(palette), 255, dtype=np.uint8)
        alpha_lut[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
        return np.dstack([rgb, alpha_lut[idx]])
    return img[:, :, 0].copy() if ch == 1 else img


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W[, C]) uint8 → non-interlaced 8-bit PNG. ``filter_type``
    applies one RFC 2083 filter (0–4) to every scanline — the decode
    tests use it to exercise each unfilter path against real zlib-
    compressed bytes. Filtering is fully vectorized (the RECON plane is
    already known when encoding, unlike decoding)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = _PNG_COLOR_TYPE_BY_CH.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    body = _png_filter_body(arr, filter_type)
    return _png_assemble(w, h, 8, color_type, 0, body)


def _png_sample_bytes(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 or uint16 → the raster BYTE matrix PNG filters see
    (uint16 samples become network-order byte pairs). Shared by the
    16-bit-capable encoders."""
    if arr.dtype != np.uint16:
        return arr
    hp, wp, ch = arr.shape
    return arr.astype(">u2").view(np.uint8).reshape(hp, wp, ch * 2)


def _png_filter_body(arr: np.ndarray, filter_type: int) -> bytes:
    """Apply one RFC 2083 filter to every scanline of (H, W, C) uint8;
    returns the raw (pre-deflate) raster: filter byte + filtered row per
    scanline. Fully vectorized (the RECON plane is already known when
    encoding, unlike decoding). Shared by the plain and Adam7 encoders."""
    h, w, ch = arr.shape
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
    return np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8),
         (filtered % 256).astype(np.uint8)],
        axis=1,
    ).tobytes()


def encode_png_adam7(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W[, C]) uint8 (→ 8-bit) or uint16 (→ 16-bit) → Adam7-INTERLACED
    PNG: each of the seven passes is extracted by the RFC 2083 §2.6 grid,
    filtered as an independent sub-image, and the concatenated pass
    rasters deflate into one IDAT. Fixture-side twin of ``decode_png``'s
    interlace path (real crawl PNGs are sometimes interlaced for
    progressive rendering)."""
    wide = np.asarray(img).dtype == np.uint16
    arr = np.ascontiguousarray(img, dtype=np.uint16 if wide else np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = _PNG_COLOR_TYPE_BY_CH.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    body = b"".join(
        _png_filter_body(
            _png_sample_bytes(np.ascontiguousarray(arr[y0::dy, x0::dx])),
            filter_type,
        )
        for x0, y0, dx, dy, _wp, _hp in _adam7_passes(w, h)
    )
    return _png_assemble(w, h, 16 if wide else 8, color_type, 1, body)


def encode_png16(img16: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W[, C]) uint16 → 16-bit PNG (network byte order). Fixture-side
    twin of ``decode_png``'s 16-bit path (which downsamples to the high
    byte); filtering runs on the packed byte matrix with the correct
    2·C-byte pixel distance."""
    arr = np.ascontiguousarray(img16, dtype=np.uint16)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = _PNG_COLOR_TYPE_BY_CH.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    body = _png_filter_body(_png_sample_bytes(arr), filter_type)
    return _png_assemble(w, h, 16, color_type, 0, body)


def encode_png_lowdepth(
    codes: np.ndarray,
    depth: int,
    palette: np.ndarray | None = None,
    filter_type: int = 0,
    interlace: bool = False,
) -> bytes:
    """(H, W) d-bit codes (d ∈ 1/2/4) → sub-byte PNG: grayscale when
    ``palette`` is None (codes are raw d-bit gray levels the decoder
    scales to 8-bit), else color-type-3 with packed palette indices —
    the favicon-grade shape small crawl images actually use. Rows are
    bit-packed MSB-first per RFC 2083; filtering runs on the packed
    bytes (bpp = 1)."""
    if depth not in (1, 2, 4):
        raise ValueError(f"low-depth encoder supports 1/2/4, got {depth}")
    arr = np.ascontiguousarray(codes, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("codes must be (H, W)")
    if int(arr.max(initial=0)) >= (1 << depth):
        raise ValueError(f"code out of range for depth {depth}")
    if palette is not None:
        pal = np.ascontiguousarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= (
            1 << depth
        ):
            raise ValueError("palette must be (N<=2^depth, 3) uint8")
        if int(arr.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
    h, w = arr.shape

    def pack_rows(sub: np.ndarray) -> bytes:
        # MSB-first d-bit packing, each row padded to a whole byte
        hp, wp = sub.shape
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        bits = ((sub[:, :, None] & weights) > 0).astype(np.uint8)
        sb = (wp * depth + 7) // 8
        row_bits = np.zeros((hp, sb * 8), dtype=np.uint8)
        row_bits[:, : wp * depth] = bits.reshape(hp, wp * depth)
        packed = np.packbits(row_bits, axis=1)  # (hp, sb)
        return _png_filter_body(packed[:, :, None], filter_type)

    if interlace:
        body = b"".join(
            pack_rows(np.ascontiguousarray(arr[y0::dy, x0::dx]))
            for x0, y0, dx, dy, _wp, _hp in _adam7_passes(w, h)
        )
    else:
        body = pack_rows(arr)
    return _png_assemble(
        w,
        h,
        depth,
        0 if palette is None else 3,
        1 if interlace else 0,
        body,
        extra=() if palette is None else ((b"PLTE", pal.tobytes()),),
    )


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    trns: bytes | None = None,
    filter_type: int = 0,
) -> bytes:
    """(H, W) uint8 palette indices + (N≤256, 3) uint8 palette → 8-bit
    color-type-3 PNG (optional tRNS alpha table). Real crawl images are
    often palette-quantized; this is the fixture-side twin of
    ``decode_png``'s PLTE path."""
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("palette indices must be (H, W)")
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError("palette must be (N<=256, 3) uint8")
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("palette index out of range")
    if trns is not None and len(trns) > len(pal):
        raise ValueError("tRNS longer than palette")
    h, w = idx.shape
    body = _png_filter_body(idx[:, :, None], filter_type)
    extra = [(b"PLTE", pal.tobytes())]
    if trns is not None:
        extra.append((b"tRNS", trns))
    return _png_assemble(w, h, 8, 3, 0, body, extra=tuple(extra))


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU T.81 sequential DCT) — pure NumPy/stdlib.
#
# JPEG is the dominant crawl image format; until round 5 it was stubbed
# behind require_decoder ("needs PIL"). This implements the baseline
# sequential process end to end: marker parse, DQT/DHT/SOF0/SOS/DRI,
# entropy segments (restart markers + 0xFF00 unstuffing), per-block
# Huffman decode, vectorized dequant + IDCT (one einsum over all blocks
# per component), chroma upsampling, and YCbCr→RGB. Progressive (SOF2),
# arithmetic coding, and hierarchical modes raise ValueError. The
# Huffman bit loop is per-symbol Python — fine for the Arrow-batched
# per-payload decode this module does in-sandbox; production adapters
# still pass PIL for bulk image corpora.
# ---------------------------------------------------------------------------

#: JPEG decode allocation cap, in SAMPLES (w·h·components). The JPEG path
#: costs ~14 bytes per sample transient (int32 coefficients + float32
#: IDCT/plane buffers), not the 1 byte/sample of the PNG raster cap, so
#: it gets its own bound: 2^26 samples keeps a 12-megapixel RGB photo
#: decodable (~36M samples) while bounding a crafted near-cap header to
#: ~1 GB transient instead of the ~5 GB the PNG-cap reuse allowed.
_JPEG_MAX_SAMPLES = 1 << 26

#: zigzag position → raster index within an 8x8 block (T.81 fig. A.6)
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _jpeg_dct_matrix() -> np.ndarray:
    x = np.arange(8)
    a = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    a[0] /= np.sqrt(2.0)
    return a  # orthonormal: forward F = A @ B @ A.T, inverse B = A.T @ F @ A


class _JpegBitReader:
    """MSB-first bit reader over one unstuffed entropy segment; reads past
    the end return zero bits (the spec pads the final byte)."""

    __slots__ = ("d", "i", "acc", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        while self.n < k:
            if self.i < len(self.d):
                self.acc = (self.acc << 8) | self.d[self.i]
                self.i += 1
            else:
                self.acc <<= 8
            self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v


def _jpeg_build_huff(counts: list[int], symbols: bytes):
    """Canonical Huffman table → (mincode, maxcode, valptr, symbols) for
    the classic maxcode-walk decoder (T.81 F.2.2.3)."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        valptr[length] = k
        mincode[length] = code
        n = counts[length - 1]
        code += n
        k += n
        maxcode[length] = code - 1 if n else -1
        code <<= 1
    return mincode, maxcode, valptr, list(symbols)


def _jpeg_huff_decode(rd: _JpegBitReader, tbl) -> int:
    mincode, maxcode, valptr, vals = tbl
    code = rd.get(1)
    for length in range(1, 17):
        mc = maxcode[length]
        if mc >= 0 and code <= mc:
            return vals[valptr[length] + code - mincode[length]]
        code = (code << 1) | rd.get(1)
    raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _jpeg_entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Split the scan's entropy-coded bytes at restart markers, removing
    0xFF00 stuffing; returns (segments, index of the terminating marker)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif nxt == 0xFF:
            i += 1  # fill byte (T.81 B.1.1.2: any number may pad a marker)
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Pure-NumPy baseline JPEG decode (sequential DCT, SOF0/SOF1):
    grayscale → (H, W) uint8, 3-component YCbCr → (H, W, 3) uint8 RGB.
    Restart intervals and 4:2:0/4:2:2/4:4:4 chroma subsampling (any
    H,V ≤ 2; nearest-neighbor chroma upsample) supported; progressive /
    arithmetic / hierarchical modes and multi-scan sequential raise
    ValueError. Declared dimensions are capped like the PNG path, and
    EVERY malformed-input failure is a clean ValueError (totality —
    same contract the PNG property tests pin)."""
    import struct

    try:
        return _decode_jpeg_markers(payload)
    except (struct.error, IndexError, OverflowError) as e:
        # OverflowError: a corrupted stream can run the unbounded DC
        # predictor past int32 before any plausibility check can see it
        raise ValueError(f"malformed JPEG: {e}") from e


def _decode_jpeg_markers(payload: bytes) -> np.ndarray:
    import struct

    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    sof = None
    progressive = False
    restart_interval = 0
    scans: list[dict] = []
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[i + 1]
        if marker == 0xD8:  # stray SOI
            i += 2
            continue
        if marker == 0xD9:  # EOI before any scan
            break
        (seg_len,) = struct.unpack_from(">H", payload, i + 2)
        seg = payload[i + 4 : i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                n = 64 * (2 if pq else 1)
                raw = seg[j + 1 : j + 1 + n]
                if len(raw) < n:
                    raise ValueError("truncated DQT")
                tbl = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                qt[tq] = tbl  # zigzag order, as stored
                j += 1 + n
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                symbols = seg[j + 17 : j + 17 + n]
                if len(symbols) < n:
                    raise ValueError("truncated DHT")
                tbl = _jpeg_build_huff(counts, symbols)
                (huff_ac if tc else huff_dc)[th] = tbl
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append([cid, hv >> 4, hv & 15, tq])
            sof = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}); "
                "only baseline/extended sequential and progressive DCT "
                "are decoded"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 15))
            ss, se, ahl = seg[1 + 2 * ns : 4 + 2 * ns]
            segs, end = _jpeg_entropy_segments(payload, i + 2 + seg_len)
            scans.append({
                "comps": scan_comps,
                "ss": ss,
                "se": se,
                "ah": ahl >> 4,
                "al": ahl & 15,
                "segs": segs,
                # DHT/DRI may be redefined between scans: snapshot now
                "dc": dict(huff_dc),
                "ac": dict(huff_ac),
                "ri": restart_interval,
            })
            i = end
            continue
        # APPn / COM / others: skip
        i += 2 + seg_len
    if sof is None or not scans:
        raise ValueError("JPEG has no SOS scan")
    h, w, comps = sof
    if w <= 0 or h <= 0:
        raise ValueError("invalid JPEG dimensions")
    if len(comps) not in (1, 3):
        # reject CMYK/2-comp BEFORE entropy decode and reconstruction —
        # the color-convert tail only handles gray and YCbCr anyway
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    if w * h * len(comps) > _JPEG_MAX_SAMPLES:
        raise ValueError("JPEG dimensions exceed decode cap")
    if progressive:
        return _jpeg_decode_progressive(h, w, comps, scans, qt)
    if len(scans) != 1 or len(scans[0]["comps"]) != len(comps):
        raise ValueError(
            "multi-scan sequential JPEG not supported "
            f"({len(scans)} scans, first has {len(scans[0]['comps'])} of "
            f"{len(comps)} components)"
        )
    s0 = scans[0]
    scan_tbl = {cs: (td, ta) for cs, td, ta in s0["comps"]}
    return _jpeg_decode_scan(
        h, w, comps, scan_tbl, qt, s0["dc"], s0["ac"], s0["ri"], s0["segs"]
    )


def _jpeg_decode_scan(
    h, w, comps, scan_tbl, qt, huff_dc, huff_ac, restart_interval, segs
) -> np.ndarray:
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(1 <= c[1] <= 2 and 1 <= c[2] <= 2 for c in comps):
        raise ValueError("unsupported JPEG sampling factors (H,V must be 1-2)")
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    states = []
    for cid, ch, cv, tq in comps:
        if tq not in qt:
            raise ValueError(f"JPEG component references missing DQT {tq}")
        if cid not in scan_tbl:
            raise ValueError(f"JPEG scan missing component {cid}")
        td, ta = scan_tbl[cid]
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("JPEG scan references missing DHT")
        bw, bh = mcx * ch, mcy * cv
        states.append({
            "H": ch, "V": cv, "bw": bw, "bh": bh,
            "coef": np.zeros((bw * bh, 64), dtype=np.int32),
            "q": qt[tq], "dc": huff_dc[td], "ac": huff_ac[ta],
        })

    seg_idx = 0
    rd = _JpegBitReader(segs[0])
    preds = [0] * len(states)
    mcus_in_seg = 0

    def next_restart_segment():
        nonlocal seg_idx, rd, mcus_in_seg
        seg_idx += 1
        if seg_idx >= len(segs):
            raise ValueError("JPEG truncated at restart boundary")
        rd = _JpegBitReader(segs[seg_idx])
        preds[:] = [0] * len(states)
        mcus_in_seg = 0

    def decode_block(ci, st, row):
        t = _jpeg_huff_decode(rd, st["dc"])
        if t > 15:
            # only possible via a corrupted DHT: a size
            # this large would overflow the coef array
            raise ValueError(f"invalid JPEG DC size {t}")
        diff = _jpeg_extend(rd.get(t), t) if t else 0
        preds[ci] += diff
        row[0] = preds[ci]
        k = 1
        while k < 64:
            rs = _jpeg_huff_decode(rd, st["ac"])
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC run past block end")
            row[k] = _jpeg_extend(rd.get(s), s)
            k += 1

    if len(states) == 1:
        # T.81: a one-component scan is NON-INTERLEAVED — the MCU is a
        # single block and the scan covers the component's real block
        # grid ceil(cw/8) x ceil(ch/8), NOT the grid padded by its own
        # sampling factors. A legal grayscale JPEG declaring H/V=2 would
        # otherwise be walked over 4x the blocks its entropy stream
        # encodes and fail with 'invalid JPEG huffman code' (ADVICE.md).
        # For H=V=1 this traversal is identical to the MCU loop below.
        st = states[0]
        cw = (w * st["H"] + hmax - 1) // hmax
        chh = (h * st["V"] + vmax - 1) // vmax
        for by in range((chh + 7) // 8):
            for bx in range((cw + 7) // 8):
                if restart_interval and mcus_in_seg == restart_interval:
                    next_restart_segment()
                decode_block(0, st, st["coef"][by * st["bw"] + bx])
                mcus_in_seg += 1
        return _jpeg_reconstruct(h, w, states, hmax, vmax)

    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcus_in_seg == restart_interval:
                next_restart_segment()
            for ci, st in enumerate(states):
                for by in range(st["V"]):
                    for bx in range(st["H"]):
                        decode_block(
                            ci,
                            st,
                            st["coef"][
                                (my * st["V"] + by) * st["bw"]
                                + mx * st["H"]
                                + bx
                            ],
                        )
            mcus_in_seg += 1

    return _jpeg_reconstruct(h, w, states, hmax, vmax)


def _jpeg_decode_progressive(h, w, comps, scans, qt) -> np.ndarray:
    """Progressive JPEG (SOF2): coefficients accumulate across scans —
    DC first + DC refinement (interleaved or single-component), AC
    spectral-selection bands and AC successive-approximation refinement
    (single-component scans with EOB-run coding, T.81 G.1.2). Each scan
    snapshots the Huffman tables in force when its SOS appeared."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(1 <= c[1] <= 2 and 1 <= c[2] <= 2 for c in comps):
        raise ValueError("unsupported JPEG sampling factors (H,V must be 1-2)")
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    states = []
    by_id: dict[int, dict] = {}
    for cid, ch, cv, tq in comps:
        if tq not in qt:
            raise ValueError(f"JPEG component references missing DQT {tq}")
        bw, bh = mcx * ch, mcy * cv
        # non-interleaved scans cover only the component's REAL block
        # grid (ceil of its sample dims), not the MCU-padded one
        cw = (w * ch + hmax - 1) // hmax
        chh = (h * cv + vmax - 1) // vmax
        st = {
            "cid": cid, "H": ch, "V": cv, "bw": bw, "bh": bh,
            "nbx": (cw + 7) // 8, "nby": (chh + 7) // 8,
            "coef": np.zeros((bw * bh, 64), dtype=np.int32),
            "q": qt[tq], "pred": 0,
        }
        states.append(st)
        by_id[cid] = st

    for scan in scans:
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        ri = scan["ri"]
        segs = scan["segs"]
        seg_idx = 0
        rd = _JpegBitReader(segs[0])
        if ss == 0:  # DC scan (se must be 0)
            if se != 0:
                raise ValueError("JPEG DC scan with nonzero Se")
            members = []
            for cs, td, _ta in scan["comps"]:
                if cs not in by_id:
                    raise ValueError(f"JPEG scan references component {cs}")
                if ah == 0 and td not in scan["dc"]:
                    raise ValueError("JPEG scan references missing DHT")
                members.append((by_id[cs], scan["dc"].get(td)))
                by_id[cs]["pred"] = 0
            interleaved = len(members) > 1
            if interleaved:
                nx, ny = mcx, mcy
            else:
                st0 = members[0][0]
                nx, ny = st0["nbx"], st0["nby"]
            units = 0
            for uy in range(ny):
                for ux in range(nx):
                    if ri and units == ri:
                        seg_idx += 1
                        if seg_idx >= len(segs):
                            raise ValueError("JPEG truncated at restart")
                        rd = _JpegBitReader(segs[seg_idx])
                        for st, _t in members:
                            st["pred"] = 0
                        units = 0
                    for st, dtbl in members:
                        reps = (
                            [(by_, bx_) for by_ in range(st["V"])
                             for bx_ in range(st["H"])]
                            if interleaved
                            else [(0, 0)]
                        )
                        for by_, bx_ in reps:
                            if interleaved:
                                bidx = (uy * st["V"] + by_) * st["bw"] + (
                                    ux * st["H"] + bx_
                                )
                            else:
                                bidx = uy * st["bw"] + ux
                            row = st["coef"][bidx]
                            if ah == 0:
                                t = _jpeg_huff_decode(rd, dtbl)
                                if t > 15:
                                    raise ValueError(
                                        f"invalid JPEG DC size {t}"
                                    )
                                diff = (
                                    _jpeg_extend(rd.get(t), t) if t else 0
                                )
                                st["pred"] += diff
                                row[0] = st["pred"] << al
                            else:  # DC refinement: one bit per block
                                if rd.get(1):
                                    row[0] = int(row[0]) | (1 << al)
                    units += 1
        else:  # AC scan: exactly one component, never interleaved
            if len(scan["comps"]) != 1:
                raise ValueError("JPEG AC progressive scan must have 1 comp")
            if not 1 <= ss <= se <= 63:
                raise ValueError("invalid JPEG spectral selection band")
            cs, _td, ta = scan["comps"][0]
            if cs not in by_id:
                raise ValueError(f"JPEG scan references component {cs}")
            if ta not in scan["ac"]:
                raise ValueError("JPEG scan references missing DHT")
            st = by_id[cs]
            atbl = scan["ac"][ta]
            eobrun = 0
            units = 0
            for by_ in range(st["nby"]):
                for bx_ in range(st["nbx"]):
                    if ri and units == ri:
                        seg_idx += 1
                        if seg_idx >= len(segs):
                            raise ValueError("JPEG truncated at restart")
                        rd = _JpegBitReader(segs[seg_idx])
                        eobrun = 0
                        units = 0
                    row = st["coef"][by_ * st["bw"] + bx_]
                    if ah == 0:
                        eobrun = _jpeg_ac_first_block(
                            rd, row, ss, se, al, atbl, eobrun
                        )
                    else:
                        eobrun = _jpeg_ac_refine_block(
                            rd, row, ss, se, al, atbl, eobrun
                        )
                    units += 1
    return _jpeg_reconstruct(h, w, states, hmax, vmax)


def _jpeg_ac_first_block(rd, row, ss, se, al, atbl, eobrun) -> int:
    """First (Ah=0) AC scan of a spectral band for one block; returns the
    remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _jpeg_huff_decode(rd, atbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:
                return (1 << r) - 1 + rd.get(r)  # EOB run incl. this block
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        row[k] = _jpeg_extend(rd.get(s), s) << al
        k += 1
    return 0


def _jpeg_ac_refine_block(rd, row, ss, se, al, atbl, eobrun) -> int:
    """Successive-approximation (Ah>0) AC refinement for one block —
    the T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine control flow:
    correction bits for already-nonzero coefficients, ±1<<Al births for
    new ones, EOB runs carrying correction bits to the band end."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_huff_decode(rd, atbl)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + rd.get(r)
                    break
                # ZRL: advance over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid JPEG AC refinement size")
                newval = p1 if rd.get(1) else m1
            while k <= se:
                v = int(row[k])
                if v != 0:
                    if rd.get(1) and (v & p1) == 0:
                        row[k] = v + (p1 if v > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                row[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(row[k])
            if v != 0 and rd.get(1) and (v & p1) == 0:
                row[k] = v + (p1 if v > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_reconstruct(h, w, states, hmax, vmax) -> np.ndarray:
    """Shared tail of the sequential and progressive decoders: dequant +
    IDCT (one einsum per component) + fancy chroma upsample + color
    convert."""
    # float32 throughout: IDCT at this precision is within ±1 LSB of the
    # float64 result for 8-bit samples, at half the transient footprint
    # (this path is sized by _JPEG_MAX_SAMPLES)
    a = _jpeg_dct_matrix().astype(np.float32)
    planes = []
    for st in states:
        # int64 product: coef is int32 and q can be 16-bit — a crafted
        # stream with a large accumulated DC predictor times a big quant
        # entry can wrap int32 silently (garbage pixels instead of a
        # loud error — ADVICE.md); the float32 cast below is unchanged
        deq = st["coef"].astype(np.int64) * st["q"][None, :]  # zigzag order
        blocks = np.zeros((len(deq), 64), dtype=np.float32)
        blocks[:, _JPEG_ZIGZAG] = deq
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ij,njk,kl->nil", a.T, blocks, a) + np.float32(
            128.0
        )
        plane = (
            spatial.reshape(st["bh"], st["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(st["bh"] * 8, st["bw"] * 8)
        )
        # triangular ("fancy") chroma upsampling, the libjpeg-family
        # default: each output sample is a 3:1 blend toward its nearer
        # source neighbor, separably per axis, edges replicated —
        # nearest-replicate leaves visible (and cross-decoder-diff-
        # visible) errors exactly on block edges
        if vmax // st["V"] == 2:
            prev = np.vstack([plane[:1], plane[:-1]])
            nxt = np.vstack([plane[1:], plane[-1:]])
            up = np.empty((plane.shape[0] * 2, plane.shape[1]), plane.dtype)
            up[0::2] = (3.0 * plane + prev) / 4.0
            up[1::2] = (3.0 * plane + nxt) / 4.0
            plane = up
        if hmax // st["H"] == 2:
            prev = np.hstack([plane[:, :1], plane[:, :-1]])
            nxt = np.hstack([plane[:, 1:], plane[:, -1:]])
            up = np.empty((plane.shape[0], plane.shape[1] * 2), plane.dtype)
            up[:, 0::2] = (3.0 * plane + prev) / 4.0
            up[:, 1::2] = (3.0 * plane + nxt) / 4.0
            plane = up
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# GIF (87a/89a) — pure stdlib/NumPy LZW decode: palettes (global/local),
# interlacing, and GCE transparency. Animations decode as their FIRST
# frame (dedup features come from one frame; a frame sampler is the
# production adapter's job).
# ---------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code: int, max_pixels: int) -> bytes:
    """GIF-flavor LZW (LSB-first variable-width codes, CLEAR/END, 12-bit
    table cap). Stops at END, at ``max_pixels`` output bytes (a crafted
    stream cannot allocate past the declared frame — same bomb posture
    as the PNG/JPEG caps), or at input exhaustion."""
    if not 2 <= min_code <= 8:
        raise ValueError(f"invalid GIF LZW minimum code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while len(out) < max_pixels:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out)  # missing END: return what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW stream starts with invalid code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("invalid GIF LZW code")
            if len(table) < 4096:
                table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out)


#: interlaced GIF pass structure: row start / step per pass
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a → (H, W, 3) uint8, or (H, W, 4) when the first frame's
    graphic-control extension declares a transparent index (alpha 0
    there, and on any screen area the frame does not cover). Interlaced
    frames are de-interlaced; animations return the FIRST frame composed
    onto the logical screen. Malformed input always raises ValueError
    (totality), and BOTH the logical-screen and frame dimensions are
    capped before any pixel allocation."""
    import struct

    try:
        return _decode_gif_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed GIF: {e}") from e


def _decode_gif_inner(payload: bytes) -> np.ndarray:
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if w <= 0 or h <= 0 or w * h * 4 > _PNG_MAX_RASTER_BYTES:
        raise ValueError(f"invalid GIF dimensions {w}x{h}")
    i = 13
    gct: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        raw = payload[i : i + 3 * n]
        if len(raw) < 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    transparent: int | None = None
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if i + 2 > len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[i + 1]
            i += 2
            first = True
            while True:
                if i >= len(payload):
                    raise ValueError("truncated GIF extension blocks")
                size = payload[i]
                if first and label == 0xF9 and size >= 4:
                    block = payload[i + 1 : i + 1 + size]
                    if len(block) >= 4 and block[0] & 1:
                        transparent = block[3]
                first = False
                i += 1 + size
                if size == 0:
                    break
        elif b == 0x2C:  # image descriptor
            left, top, iw, ih, lflags = struct.unpack_from(
                "<HHHHB", payload, i + 1
            )
            i += 10
            if iw <= 0 or ih <= 0 or iw * ih * 4 > _PNG_MAX_RASTER_BYTES:
                # the FRAME dims need their own cap: a 1x1 logical screen
                # with a 65535x65535 descriptor would otherwise let a tiny
                # KwKwK-growing LZW stream allocate gigabytes
                raise ValueError(f"invalid GIF frame dimensions {iw}x{ih}")
            ct = gct
            if lflags & 0x80:
                n = 2 << (lflags & 7)
                raw = payload[i : i + 3 * n]
                if len(raw) < 3 * n:
                    raise ValueError("truncated GIF local color table")
                ct = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
                i += 3 * n
            if ct is None:
                raise ValueError("GIF frame without any color table")
            if i >= len(payload):
                raise ValueError("truncated GIF image data")
            min_code = payload[i]
            i += 1
            data = bytearray()
            while True:
                if i >= len(payload):
                    raise ValueError("truncated GIF data sub-blocks")
                size = payload[i]
                i += 1
                data += payload[i : i + size]
                i += size
                if size == 0:
                    break
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(data), min_code, iw * ih),
                dtype=np.uint8,
            )
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data shorter than the frame")
            idx = idx[: iw * ih].reshape(ih, iw)
            if lflags & 0x40:  # interlaced: rows arrive in 4 passes
                rows = np.concatenate(
                    [np.arange(start, ih, step) for start, step in
                     _GIF_INTERLACE]
                )
                out = np.empty_like(idx)
                out[rows] = idx
                idx = out
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("GIF index out of color-table range")
            rgb = ct[idx]
            with_alpha = transparent is not None
            if with_alpha:
                alpha = np.where(idx == int(transparent), 0, 255).astype(
                    np.uint8
                )
                frame = np.dstack([rgb, alpha])
            else:
                frame = rgb
            if (left, top, iw, ih) == (0, 0, w, h):
                return frame
            # partial first frame: compose onto the logical screen
            ch = 4 if with_alpha else 3
            fill = (
                list(gct[bg]) if gct is not None and bg < len(gct)
                else [0, 0, 0]
            )
            canvas = np.zeros((h, w, ch), dtype=np.uint8)
            canvas[:, :, :3] = np.array(fill, dtype=np.uint8)
            if with_alpha:
                canvas[:, :, 3] = 0  # uncovered screen is transparent
            y1 = min(top + ih, h)
            x1 = min(left + iw, w)
            if y1 > top and x1 > left:
                canvas[top:y1, left:x1] = frame[: y1 - top, : x1 - left]
            return canvas
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    raise ValueError("GIF has no image data")


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    transparent: int | None = None,
    interlace: bool = False,
) -> bytes:
    """(H, W) uint8 palette indices + (N ≤ 256, 3) palette → GIF89a.
    Fixture-side twin of ``decode_gif``: the LZW stream is the trivial
    legal encoding (CLEAR before every pixel code, so the table never
    grows) — bloated output, spec-conformant input for any decoder, and
    it lets tests plant interlaced/transparent frames no off-the-shelf
    writer emits."""
    import struct

    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("indices must be (H, W)")
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError("palette must be (N<=256, 3) uint8")
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("palette index out of range")
    if transparent is not None and not 0 <= transparent < len(pal):
        raise ValueError("transparent index out of palette range")
    h, w = idx.shape
    # color-table size: power of two ≥ len(pal), ≥ 4 (min_code ≥ 2)
    bits = max(2, (len(pal) - 1).bit_length())
    n = 1 << bits
    table = np.zeros((n, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    rows = idx
    if interlace:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _GIF_INTERLACE]
        )
        rows = idx[order]
    min_code = bits
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    acc = 0
    nbits = 0
    stream = bytearray()
    # CLEAR resets the decoder's table before every pixel, so the code
    # size never grows past min_code+1 — trivially legal LZW
    for px in rows.ravel():
        for code in (clear, int(px)):
            acc |= code << nbits
            nbits += code_size
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
    acc |= end << nbits
    nbits += code_size
    while nbits > 0:
        stream.append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    out += bytes([min_code])
    for off in range(0, len(stream), 255):
        chunk = stream[off : off + 255]
        out += bytes([len(chunk)]) + bytes(chunk)
    return out + b"\x00\x3b"


def gif_feature_decoder(grid: int = 8) -> Callable[[bytes], np.ndarray]:
    """payload → 64-dim perceptual feature (decode_gif + image_feature);
    alpha never feeds luminance."""

    def decode(payload: bytes) -> np.ndarray:
        arr = decode_gif(payload)
        if arr.ndim == 3 and arr.shape[2] == 4:
            arr = arr[:, :, :3]
        return image_feature(arr, grid)

    return decode


# T.81 Annex K.1/K.2 reference quantization tables (zigzag order applied
# at encode time; stored here in raster order for readability)
_JPEG_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_JPEG_QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int32,
)


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, k: int) -> None:
        if k == 0:
            return
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


# fixed single-length canonical Huffman fixture tables: every DC size
# symbol at 4 bits (12 < 2^4 - 1) and every baseline AC symbol at 8 bits
# (162 < 2^8 - 1) — legal, simple, shared by all components
_JPEG_DC_SYMBOLS = bytes(range(12))
_JPEG_AC_SYMBOLS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_JPEG_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_JPEG_AC_COUNTS = [0] * 7 + [162] + [0] * 8


def _jpeg_code_map(counts: list[int], symbols: bytes) -> dict:
    code = 0
    k = 0
    out = {}
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex K tables."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1-100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def sc(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
    return sc(_JPEG_QT_LUMA), sc(_JPEG_QT_CHROMA)


def encode_jpeg_baseline(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline sequential JPEG.
    Fixture-side twin of ``decode_jpeg`` — NOT a production encoder: it
    exists so the decoder can be exercised against real entropy-coded
    bitstreams (including 4:2:0 subsampling and restart markers) without
    any codec library, and so an independent decoder (javax.imageio, PIL)
    can cross-validate that the bitstream is spec-legal."""
    import struct

    arr = np.ascontiguousarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encoder takes (H, W) gray or (H, W, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    qt_l, qt_c = _jpeg_quality_tables(quality)
    a = _jpeg_dct_matrix()
    dc_map = _jpeg_code_map(_JPEG_DC_COUNTS, _JPEG_DC_SYMBOLS)
    ac_map = _jpeg_code_map(_JPEG_AC_COUNTS, _JPEG_AC_SYMBOLS)

    if gray:
        planes = [arr.astype(np.float64)]
        factors = [(1, 1)]
        qts = [qt_l]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # pad to even, 2x2 box-mean the chroma planes
            pe = np.pad(
                np.dstack([cb, cr]),
                ((0, h % 2), (0, w % 2), (0, 0)),
                mode="edge",
            )
            sub = pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2, 2).mean(
                axis=(1, 3)
            )
            planes = [y, sub[:, :, 0], sub[:, :, 1]]
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    # quantized zigzag coefficients per component, MCU block order
    comp_blocks = []
    for plane, (fh, fv), q in zip(planes, factors, qts):
        ph, pw = mcy * fv * 8, mcx * fh * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        blocks = (
            padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        ) - 128.0
        coef = np.einsum("ij,njk,kl->nil", a, blocks, a.T).reshape(-1, 64)
        zig = coef[:, _JPEG_ZIGZAG]
        qz = q[_JPEG_ZIGZAG][None, :]
        comp_blocks.append(
            np.round(zig / qz).astype(np.int32)
        )

    def put_code(wr, cmap, sym):
        c, ln = cmap[sym]
        wr.put(c, ln)

    wr = _JpegBitWriter()
    chunks: list[bytes] = []
    preds = [0] * len(planes)
    bws = [mcx * f[0] for f in factors]
    mcus_in_seg = 0
    rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcus_in_seg == restart_interval:
                wr.pad_to_byte()
                chunks.append(bytes(wr.out))
                chunks.append(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                wr = _JpegBitWriter()
                preds = [0] * len(planes)
                mcus_in_seg = 0
            for ci, (fh, fv) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        row = comp_blocks[ci][
                            (my * fv + by) * bws[ci] + mx * fh + bx
                        ]
                        diff = int(row[0]) - preds[ci]
                        preds[ci] = int(row[0])
                        t = abs(diff).bit_length()
                        put_code(wr, dc_map, t)
                        if t:
                            wr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
                        run = 0
                        last_nz = int(np.max(np.nonzero(row)[0])) if np.any(
                            row[1:]
                        ) else 0
                        for k in range(1, 64):
                            v = int(row[k])
                            if k > last_nz:
                                put_code(wr, ac_map, 0x00)  # EOB
                                break
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                put_code(wr, ac_map, 0xF0)  # ZRL
                                run -= 16
                            s = abs(v).bit_length()
                            put_code(wr, ac_map, (run << 4) | s)
                            wr.put(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
            mcus_in_seg += 1
    wr.pad_to_byte()
    chunks.append(bytes(wr.out))
    entropy = b"".join(chunks)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xDB, bytes([0]) + bytes(qt_l[_JPEG_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(
            0xDB, bytes([1]) + bytes(qt_c[_JPEG_ZIGZAG].astype(np.uint8))
        )
    nc = 1 if gray else 3
    sof_body = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        fh, fv = factors[ci]
        sof_body += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof_body)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + _JPEG_DC_SYMBOLS
        + bytes([0x10]) + bytes(_JPEG_AC_COUNTS) + _JPEG_AC_SYMBOLS,
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos_body = bytes([nc])
    for ci in range(nc):
        sos_body += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos_body += bytes([0, 63, 0])
    out += seg(0xDA, sos_body)
    return out + entropy + b"\xff\xd9"


def jpeg_feature_decoder(grid: int = 8) -> Callable[[bytes], np.ndarray]:
    """payload → 64-dim perceptual feature (decode_jpeg + image_feature)."""

    def decode(payload: bytes) -> np.ndarray:
        return image_feature(decode_jpeg(payload), grid)

    return decode


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
    elif width == 3:  # 24-bit little-endian signed PCM
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float32) / float(1 << 23)
    elif width == 4:  # 32-bit signed PCM (stdlib wave is PCM-only)
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / float(1 << 31)
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


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch over every codec-free image decoder
    (PNG/JPEG/GIF/BMP/PPM/PGM) — the realistic crawl shape where one
    binary column carries whatever formats the web served. Raises
    ValueError on unrecognized magic (same totality contract as each
    decoder)."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"P5":
        return decode_pgm(payload)
    raise ValueError(
        f"unrecognized image magic {bytes(payload[:8])!r} "
        "(codec-free formats: PNG/JPEG/GIF/BMP/PPM/PGM)"
    )


def image_feature_decoder(grid: int = 8) -> Callable[[bytes], np.ndarray]:
    """payload (any codec-free format) → 64-dim perceptual feature.
    Alpha never feeds luminance: RGBA drops to RGB, gray+alpha to gray."""

    def decode(payload: bytes) -> np.ndarray:
        arr = decode_image(payload)
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
