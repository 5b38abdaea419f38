"""From-scratch media codecs: BMP + PNG (image), RIFF/WAV PCM16 (audio),
and a length-prefixed motion-BMP container (video frames).

Round 5 closes the "codec stubs, env-bound" gap for every format that
needs NO external library: uncompressed 24-bit BMP and PCM WAV are fully
specified public formats decodable with numpy/struct alone, and the MBMP
frame container is this engine's own documented spec.  The multimodal
operators sniff magic bytes — payloads in these formats take the REAL
decode paths; anything else still falls back to the clearly-marked stub
histogram, so the frozen-artifact oracle battery is untouched.

Independence of the test gates (tests/test_codecs.py):
- WAV: this module parses RIFF chunks from scratch; the test decodes the
  same bytes with the stdlib ``wave`` module — a genuinely independent
  implementation — and requires sample-exact agreement.
- BMP: golden-pixel decode vectors plus encode→decode round-trip
  identity on random images (the format has one canonical uncompressed
  24-bit form given our fixed header).
- MBMP: sampled frames must be byte-identical to the frames the builder
  encoded at the sampled indices.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# BMP — uncompressed 24-bit bottom-up, BITMAPINFOHEADER
# ---------------------------------------------------------------------------


def bmp_encode(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("pixels must be (H, W, 3) uint8")
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    img_size = row_size * h
    # pixel data: bottom-up rows, BGR order
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def bmp_decode(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB.

    Raises ValueError on anything that is not the canonical form
    :func:`bmp_encode` emits (callers sniff + fall back to the stub)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or planes != 1:
        raise ValueError("unsupported BMP variant")
    if w <= 0 or h == 0:
        raise ValueError("bad dimensions")
    flip = h > 0  # positive height = bottom-up
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    need = off + row_size * h
    if len(data) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=off)
    bgr = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return (rgb[::-1] if flip else rgb).copy()


def resize_nearest_pixels(px: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor index math on DECODED (H, W, 3) pixels — the one
    implementation serving both :func:`bmp_resize_nearest` and the
    multimodal ``resize_images`` operator (ADVICE r5: two inline copies
    of the same indexing logic can drift)."""
    h, w = px.shape[0], px.shape[1]
    yi = (np.arange(th) * h // th).clip(0, h - 1)
    xi = (np.arange(tw) * w // tw).clip(0, w - 1)
    return px[yi][:, xi]


def bmp_resize_nearest(data: bytes, tw: int, th: int) -> bytes:
    """Real aspect-free nearest-neighbor resize: decode, index, encode."""
    return bmp_encode(resize_nearest_pixels(bmp_decode(data), tw, th))


def bmp_features(pixels: np.ndarray, dim: int = 16) -> list[float]:
    """Real image features from decoded RGB: [mean RGB (3), std RGB (3),
    10-bin normalized luma histogram] — ``dim`` floats."""
    px = np.asarray(pixels, dtype=np.float64)
    mean = px.mean(axis=(0, 1)).tolist()
    std = px.std(axis=(0, 1)).tolist()
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    hist, _ = np.histogram(luma, bins=dim - 6, range=(0.0, 256.0))
    return mean + std + (hist / max(luma.size, 1)).astype(float).tolist()


# ---------------------------------------------------------------------------
# PNG — from-scratch decode/encode: stdlib zlib + the five scanline
# filters (None/Sub/Up/Average/Paeth).  The web's most common lossless
# image format, and the one compressed format decodable here with zero
# external dependencies (round-6 mandate; the round-5 BMP/WAV pattern).
# Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
# no interlace — the canonical truecolor forms.  Palette (3) and 16-bit
# variants raise ValueError and fall back to the stub path upstream.
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}
_PNG_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a channel slice."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.int32)


def _png_filter_row(
    ft: int, row: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    """recon row -> filtered bytes for filter type ``ft`` (encoder side:
    the exact inverse of :func:`_png_unfilter_row`)."""
    r = row.astype(np.int32)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prior.astype(np.int32)
    ul = np.zeros_like(r)
    ul[bpp:] = up[:-bpp]
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - left
    elif ft == 2:
        out = r - up
    elif ft == 3:
        out = r - ((left + up) >> 1)
    elif ft == 4:
        out = r - _paeth(left, up, ul)
    else:
        raise ValueError(f"bad PNG filter type {ft}")
    return (out % 256).astype(np.uint8)


def _png_unfilter_row(
    ft: int, line: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    """filtered bytes -> recon row.  Sub/Average/Paeth depend on the
    already-reconstructed left neighbor, so they walk the row in
    ``bpp``-wide steps (channel slices stay vectorized)."""
    f = line.astype(np.int32)
    up = prior.astype(np.int32)
    n = len(f)
    if ft == 0:
        return line.astype(np.uint8)
    if ft == 2:
        return ((f + up) % 256).astype(np.uint8)
    # out must hold REDUCED (mod-256) bytes at every step: Average's >>1
    # and Paeth's magnitude comparisons are not congruence-preserving,
    # so an unreduced left neighbor would corrupt the rest of the row
    out = np.zeros(n, dtype=np.int32)
    if ft == 1:
        out[:bpp] = f[:bpp]
        for x in range(bpp, n, bpp):
            out[x : x + bpp] = (f[x : x + bpp] + out[x - bpp : x]) % 256
    elif ft == 3:
        out[:bpp] = (f[:bpp] + (up[:bpp] >> 1)) % 256
        for x in range(bpp, n, bpp):
            out[x : x + bpp] = (
                f[x : x + bpp]
                + ((out[x - bpp : x] + up[x : x + bpp]) >> 1)
            ) % 256
    elif ft == 4:
        zero = np.zeros(bpp, dtype=np.int32)
        out[:bpp] = (f[:bpp] + _paeth(zero, up[:bpp], zero)) % 256
        for x in range(bpp, n, bpp):
            out[x : x + bpp] = (
                f[x : x + bpp]
                + _paeth(
                    out[x - bpp : x], up[x : x + bpp], up[x - bpp : x]
                )
            ) % 256
    else:
        raise ValueError(f"bad PNG filter type {ft}")
    return (out % 256).astype(np.uint8)


def png_encode(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W) or (H, W, C) uint8 (C in {1, 3, 4}) -> PNG bytes, every
    scanline filtered with ``filter_type`` (0-4; non-zero types exist so
    tests can exercise every decoder filter path with real payloads)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _PNG_COLOR_TYPE:
        raise ValueError("pixels must be (H, W[, 1|3|4]) uint8")
    h, w, ch = arr.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, _PNG_COLOR_TYPE[ch], 0, 0, 0
    )
    flat = arr.reshape(h, w * ch)
    prior = np.zeros(w * ch, dtype=np.uint8)
    lines = []
    for y in range(h):
        lines.append(bytes([filter_type]))
        lines.append(
            _png_filter_row(filter_type, flat[y], prior, ch).tobytes()
        )
        prior = flat[y]
    idat = zlib.compress(b"".join(lines))
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 (C = 1 gray / 3 RGB / 4 RGBA).

    From-scratch chunk walk with per-chunk CRC verification; inflate via
    stdlib zlib; all five scanline filters reconstructed.  Raises
    ValueError on palette/16-bit/interlaced variants (callers sniff and
    fall back to the stub path)."""
    if len(data) < len(PNG_MAGIC) + 12 or data[: len(PNG_MAGIC)] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, end = len(PNG_MAGIC), len(data)
    ihdr = None
    idats = []
    while pos + 12 <= end:
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch ({ctype!r})")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idats.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idats:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ct, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or ct not in _PNG_CHANNELS or comp != 0 or filt != 0:
        raise ValueError("unsupported PNG variant (need 8-bit gray/RGB/RGBA)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if w < 1 or h < 1:
        raise ValueError("bad dimensions")
    ch = _PNG_CHANNELS[ct]
    stride = w * ch
    raw = zlib.decompress(b"".join(idats))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        out[y] = _png_unfilter_row(int(raw[y, 0]), raw[y, 1:], prior, ch)
        prior = out[y]
    return out.reshape(h, w, ch)


def png_to_rgb(px: np.ndarray) -> np.ndarray:
    """Decoded PNG pixels -> (H, W, 3) RGB for the shared feature path
    (gray broadcasts, alpha drops)."""
    if px.shape[2] == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]


# ---------------------------------------------------------------------------
# WAV — RIFF container, PCM16 mono/stereo (from-scratch chunk walk)
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(N,) or (N, C) int16 -> PCM16 WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    payload = arr.reshape(-1).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes -> ((N, C) int16 samples, sample_rate).

    A from-scratch RIFF chunk walk (the independent test oracle is the
    stdlib ``wave`` module): tolerates extra chunks (LIST, fact, ...)
    and odd-length chunk padding; rejects non-PCM16 encodings."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, end = 12, len(data)
    ch = rate = bits = None
    payload = None
    while pos + 8 <= end:
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if audio_fmt != 1 or bits != 16:
                raise ValueError("not PCM16")
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if ch is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    if ch <= 0 or rate <= 0:
        # 0 channels / 0 rate would ZeroDivide below and in wav_features;
        # malformed headers must surface as ValueError so operator-level
        # sniff-and-fallback catches them
        raise ValueError("malformed fmt chunk (channels/rate)")
    n = len(payload) // (2 * ch)
    samples = np.frombuffer(payload, dtype="<i2", count=n * ch).reshape(n, ch)
    return samples.copy(), int(rate)


def wav_features(samples: np.ndarray, rate: int, dim: int = 16) -> list[float]:
    """Real audio features from decoded PCM: [rms, zero-crossing rate,
    peak, duration_sec, 12 log-energy FFT bands] — ``dim`` floats."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
    peak = float(np.max(np.abs(mono))) if len(mono) else 0.0
    # rate is validated > 0 by wav_decode; empty audio reports 0.0, not
    # 1/rate (ADVICE r5 — the max(n,1) guard was feeding the duration)
    dur = len(mono) / float(rate)
    n_bands = dim - 4
    # rfft rejects 0 data points — empty audio has an empty spectrum
    spec = np.abs(np.fft.rfft(mono)) if len(mono) else np.zeros(0)
    if len(spec) >= n_bands:
        bands = np.array_split(spec, n_bands)
        energies = [float(np.log1p(b.sum())) for b in bands]
    else:
        energies = [float(np.log1p(spec.sum()))] + [0.0] * (n_bands - 1)
    return [rms, zcr, peak, dur] + energies


# ---------------------------------------------------------------------------
# MBMP — motion-BMP frame container (this engine's documented spec)
# ---------------------------------------------------------------------------
#
#   magic  b"MBMP"            4 bytes
#   n      u32 LE             frame count
#   dt     u32 LE             frame interval, ms
#   n ×  ( u32 LE frame byte length, then that many BMP bytes )

MBMP_MAGIC = b"MBMP"


def mbmp_encode(frames: list[bytes], frame_ms: int) -> bytes:
    out = [MBMP_MAGIC, struct.pack("<II", len(frames), frame_ms)]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def mbmp_index(data: bytes) -> tuple[int, int, list[tuple[int, int]]]:
    """-> (n_frames, frame_ms, [(offset, length), ...]) without copying
    frame bytes (sampling reads only the frames it needs)."""
    if len(data) < 12 or data[:4] != MBMP_MAGIC:
        raise ValueError("not MBMP")
    n, frame_ms = struct.unpack_from("<II", data, 4)
    pos, spans = 12, []
    for _ in range(n):
        if pos + 4 > len(data):
            raise ValueError("truncated MBMP index")
        ln = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if pos + ln > len(data):
            raise ValueError("truncated MBMP frame")
        spans.append((pos, ln))
        pos += ln
    return n, frame_ms, spans
