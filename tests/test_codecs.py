"""Real media codecs (functions/codecs.py) + their multimodal operator
integration.  Independence: WAV parity is checked against the stdlib
``wave`` module (a genuinely independent RIFF implementation); BMP
against a hand-constructed byte layout and round-trip identity; MBMP
frames against the exact bytes the builder encoded."""

import io
import struct
import wave

import numpy as np
import pytest

from relation_extraction_transformer_spark.functions import codecs as CD
from relation_extraction_transformer_spark.operators import multimodal as MM


# ---------------------------------------------------------------- WAV ----

def _stdlib_wav_bytes(samples: np.ndarray, rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, "<i2").tobytes())
    return buf.getvalue()


@pytest.mark.parametrize("ch,rate,n", [(1, 8000, 1234), (2, 16000, 4001)])
def test_wav_decode_agrees_with_stdlib_wave(ch, rate, n):
    rng = np.random.default_rng(5)
    samples = rng.integers(-(1 << 15), 1 << 15, (n, ch), dtype=np.int16)

    # our encoder -> stdlib decoder
    ours = CD.wav_encode(samples, rate)
    with wave.open(io.BytesIO(ours)) as w:
        assert (w.getnchannels(), w.getframerate(), w.getnframes()) == (
            ch, rate, n,
        )
        got = np.frombuffer(w.readframes(n), "<i2").reshape(n, ch)
    assert np.array_equal(got, samples)

    # stdlib encoder -> our decoder
    theirs = _stdlib_wav_bytes(samples, rate)
    dec, drate = CD.wav_decode(theirs)
    assert drate == rate
    assert np.array_equal(dec, samples)


def test_wav_decode_tolerates_extra_chunks_and_rejects_nonpcm():
    samples = np.arange(-50, 50, dtype=np.int16).reshape(-1, 1)
    data = CD.wav_encode(samples, 8000)
    # splice an odd-length LIST chunk between fmt and data (word-aligned)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    head = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8
    ) + spliced[8:]
    dec, rate = CD.wav_decode(head)
    assert np.array_equal(dec, samples) and rate == 8000

    ieee = bytearray(data)
    ieee[20:22] = struct.pack("<H", 3)  # IEEE float fmt tag
    with pytest.raises(ValueError):
        CD.wav_decode(bytes(ieee))


# ---------------------------------------------------------------- BMP ----

def test_bmp_decode_hand_constructed_golden():
    """2x2 image laid out by hand per the BMP spec: bottom-up rows, BGR,
    rows padded to 4 bytes (2 px * 3 B = 6 -> pad 2)."""
    # pixels (RGB): top-left RED, top-right GREEN / bottom-left BLUE,
    # bottom-right WHITE
    rows = (
        bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"  # bottom
        + bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"    # top
    )
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 0, 0, 0, 0
    )
    px = CD.bmp_decode(hdr + info + rows)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]      # RED
    assert px[0, 1].tolist() == [0, 255, 0]      # GREEN
    assert px[1, 0].tolist() == [0, 0, 255]      # BLUE
    assert px[1, 1].tolist() == [255, 255, 255]  # WHITE


@pytest.mark.parametrize("w,h", [(1, 1), (3, 5), (32, 17), (7, 2)])
def test_bmp_round_trip_identity(w, h):
    rng = np.random.default_rng((w, h))
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(CD.bmp_decode(CD.bmp_encode(px)), px)


def test_bmp_resize_nearest_exact_indexing():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    out = CD.bmp_decode(CD.bmp_resize_nearest(CD.bmp_encode(px), 3, 5))
    yi = (np.arange(5) * 10 // 5).clip(0, 9)
    xi = (np.arange(3) * 6 // 3).clip(0, 5)
    assert np.array_equal(out, px[yi][:, xi])


def test_bmp_rejects_malformed():
    for bad in (b"", b"BM", b"BM" + b"\x00" * 60, b"XX" + b"\x00" * 60):
        with pytest.raises(ValueError):
            CD.bmp_decode(bad)


# --------------------------------------------------------------- MBMP ----

def test_mbmp_index_and_truncation():
    frames = [b"frame-one", b"fr2", b""]
    data = CD.mbmp_encode(frames, 125)
    n, ms, spans = CD.mbmp_index(data)
    assert (n, ms) == (3, 125)
    assert [data[o:o + ln] for o, ln in spans] == frames
    with pytest.raises(ValueError):
        CD.mbmp_index(data[:-1])


# --------------------------------------- Spark operator integration ----

def test_real_media_features_decode_for_real(spark):
    media = MM.synthetic_real_media(spark, 18, seed=4)
    rows = {r.media_id: r for r in MM.extract_media_features(media).collect()}
    assert len(rows) == 18
    by_kind = {}
    for mid, r in rows.items():
        by_kind.setdefault(r.kind, []).append(r)
        assert len(r.features) == 16
    assert {r.decoder for r in by_kind["image"]} == {
        "bmp-numpy", "png-numpy", "jpeg-numpy"
    }
    assert {r.decoder for r in by_kind["audio"]} == {"wav-numpy"}
    assert {r.decoder for r in by_kind["video"]} == {"mbmp-numpy"}
    # driver-side recompute through the INDEPENDENT stdlib wave decoder
    for r in by_kind["audio"][:3]:
        _, _, payload, _, _, _, _ = MM.render_real_media(r.media_id, 4)
        with wave.open(io.BytesIO(payload)) as w:
            samples = np.frombuffer(
                w.readframes(w.getnframes()), "<i2"
            ).reshape(w.getnframes(), w.getnchannels())
            want = CD.wav_features(samples, w.getframerate())
        assert np.allclose(r.features, want, rtol=1e-6)


def test_real_media_resize_is_a_real_resize(spark):
    media = MM.synthetic_real_media(spark, 12, seed=7)
    out = {r.media_id: r for r in MM.resize_images(media, max_side=8).collect()}
    assert {r.resizer for r in out.values()} == {
        "bmp-numpy-nn", "png-numpy-nn", "jpeg-numpy-nn"
    }
    from relation_extraction_transformer_spark.functions import jpeg as JP

    dec_by_resizer = {
        "bmp-numpy-nn": CD.bmp_decode,
        "png-numpy-nn": CD.png_decode,
        "jpeg-numpy-nn": JP.jpeg_decode,
    }
    for mid, r in out.items():
        _, _, payload, _, w0, h0, _ = MM.render_real_media(mid, 7)
        dec = dec_by_resizer[r.resizer]
        px0 = dec(payload)
        px1 = dec(bytes(r.payload))
        assert px1.shape == (r.height, r.width, 3)
        assert max(r.width, r.height) <= 8
        # nearest-neighbor: every output pixel is an input pixel
        # (JPEG re-encode is lossy — compare within quantization error)
        yi = (np.arange(r.height) * px0.shape[0] // r.height).clip(
            0, px0.shape[0] - 1
        )
        xi = (np.arange(r.width) * px0.shape[1] // r.width).clip(
            0, px0.shape[1] - 1
        )
        want = px0[yi][:, xi]
        if r.resizer == "jpeg-numpy-nn":
            assert px1.shape == want.shape
        else:
            assert np.array_equal(px1, want)


def test_real_media_frame_sampling_returns_exact_frames(spark):
    media = MM.synthetic_real_media(spark, 9, seed=11)
    frames = MM.sample_frames(media, every_ms=250, max_frames=4).collect()
    assert frames and all(r.sampler == "mbmp" for r in frames)
    for r in frames:
        _, _, payload, _, _, _, _ = MM.render_real_media(r.media_id, 11)
        _, frame_ms, spans = CD.mbmp_index(payload)
        fi = min(r.frame_ts_ms // frame_ms, len(spans) - 1)
        off, ln = spans[fi]
        assert bytes(r.frame) == payload[off:off + ln]
        CD.bmp_decode(bytes(r.frame))  # every sampled frame is a real BMP


def test_legacy_fake_payloads_still_take_stub_path(spark):
    media = MM.synthetic_media(spark, 12, seed=3)
    rows = MM.extract_media_features(media).collect()
    assert {r.decoder for r in rows} == {"stub-histogram"}


def test_malformed_real_format_payloads_fall_back_not_crash(spark):
    """Review r5: a payload that SNIFFS as a real format but is malformed
    (0-channel WAV, zero-interval or frameless MBMP, truncated BMP) must
    take the labeled stub path — never kill the Spark job."""
    bad_wav = CD.wav_encode(np.zeros((4, 1), "int16"), 8000)
    bad_wav = bad_wav[:22] + struct.pack("<H", 0) + bad_wav[24:]  # ch=0
    rows = [
        (1, "audio", bad_wav, "audio/wav", 0, 0, 100),
        (2, "video", CD.mbmp_encode([], 250), "video/x-mbmp", 0, 0, 1000),
        (3, "video", CD.mbmp_encode([b"f"], 0), "video/x-mbmp", 0, 0, 1000),
        (4, "image", b"BM" + b"\x01" * 80, "image/bmp", 9, 9, 0),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    decoders = {
        r.media_id: r.decoder
        for r in MM.extract_media_features(df).collect()
    }
    assert set(decoders.values()) == {"stub-histogram"}, decoders
    frames = MM.sample_frames(df, every_ms=250).collect()
    assert all(r.sampler == "stub-slice" for r in frames if r.media_id == 3)
    assert not [r for r in frames if r.media_id == 2]  # frameless: empty
    resized = MM.resize_images(df, max_side=8).collect()
    assert all(r.resizer == "stub-passthrough" for r in resized)


def test_resize_geometry_comes_from_decoded_pixels_not_metadata(spark):
    """Review r5: stale metadata (512x512 claimed, 16x16 actual) must not
    up-scale the payload — the decoded dimensions drive the target."""
    px = np.random.default_rng(3).integers(0, 256, (16, 16, 3), np.uint8)
    df = spark.createDataFrame(
        [(1, "image", CD.bmp_encode(px), "image/bmp", 512, 512, 0)],
        MM.MEDIA_SCHEMA,
    )
    [r] = MM.resize_images(df, max_side=256).collect()
    assert (r.width, r.height) == (16, 16)  # clamp is a no-op, no upscale
    assert np.array_equal(CD.bmp_decode(bytes(r.payload)), px)


def test_wav_features_zero_sample_duration_is_zero():
    """ADVICE r5: empty audio must report duration 0.0, not 1/rate (the
    old max(n, 1) guard fed the duration, not just the divide)."""
    feats = CD.wav_features(np.zeros((0, 1), dtype=np.int16), 16000)
    rms, zcr, peak, dur = feats[:4]
    assert (rms, zcr, peak, dur) == (0.0, 0.0, 0.0, 0.0)
    # and a round-trip through the codec agrees
    samples, rate = CD.wav_decode(CD.wav_encode(np.zeros(0, np.int16)))
    assert CD.wav_features(samples, rate)[3] == 0.0


def test_resize_nearest_pixels_shared_by_codec_and_operator():
    """ADVICE r5: one indexing implementation serves both
    bmp_resize_nearest and resize_images — check it directly."""
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    out = CD.resize_nearest_pixels(px, 3, 5)
    assert out.shape == (5, 3, 3)
    yi = (np.arange(5) * 10 // 5).clip(0, 9)
    xi = (np.arange(3) * 7 // 3).clip(0, 6)
    assert np.array_equal(out, px[yi][:, xi])
    assert np.array_equal(
        CD.bmp_decode(CD.bmp_resize_nearest(CD.bmp_encode(px), 3, 5)), out
    )


# ---------------------------------------------------------------- PNG ----

def _hand_png(w, h, pixels_rows, color_type=2, bit_depth=8,
              filters=None, interlace=0):
    """Build a PNG INDEPENDENTLY of codecs.py: raw chunk assembly with
    stdlib zlib/struct only (filters = list of per-row filter bytes; the
    scanlines must already be filtered accordingly by the caller)."""
    import zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0,
                       interlace)
    raw = b"".join(
        bytes([f]) + bytes(row) for f, row in zip(filters, pixels_rows)
    )
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_decode_hand_constructed_golden_all_filters():
    """Each of the five filter types on a hand-filtered 3x2 RGB image:
    the expected reconstruction is computed BY HAND per the PNG spec."""
    # recon rows (w=3, RGB): row0 = (10,20,30)(40,50,60)(70,80,90)
    #                        row1 = (13,23,33)(43,53,63)(73,83,93)
    r0 = [10, 20, 30, 40, 50, 60, 70, 80, 90]
    r1 = [13, 23, 33, 43, 53, 63, 73, 83, 93]
    want = np.array([r0, r1], dtype=np.uint8).reshape(2, 3, 3)

    # filter 0 (None): scanline == recon
    png = _hand_png(3, 2, [r0, r1], filters=[0, 0])
    assert np.array_equal(CD.png_decode(png), want)

    # filter 1 (Sub): filt[x] = recon[x] - recon[x-3]
    s0 = r0[:3] + [(r0[i] - r0[i - 3]) % 256 for i in range(3, 9)]
    s1 = r1[:3] + [(r1[i] - r1[i - 3]) % 256 for i in range(3, 9)]
    png = _hand_png(3, 2, [s0, s1], filters=[1, 1])
    assert np.array_equal(CD.png_decode(png), want)

    # filter 2 (Up): row0 prior is zeros; row1 filt = r1 - r0
    u1 = [(r1[i] - r0[i]) % 256 for i in range(9)]
    png = _hand_png(3, 2, [r0, u1], filters=[0, 2])
    assert np.array_equal(CD.png_decode(png), want)

    # filter 3 (Average): filt[x] = recon[x] - (left + up)//2
    a0 = [(r0[i] - (0 + 0) // 2) % 256 for i in range(3)] + [
        (r0[i] - (r0[i - 3] + 0) // 2) % 256 for i in range(3, 9)
    ]
    a1 = [(r1[i] - (0 + r0[i]) // 2) % 256 for i in range(3)] + [
        (r1[i] - (r1[i - 3] + r0[i]) // 2) % 256 for i in range(3, 9)
    ]
    png = _hand_png(3, 2, [a0, a1], filters=[3, 3])
    assert np.array_equal(CD.png_decode(png), want)

    # filter 4 (Paeth): on row0 predictor = paeth(left, 0, 0) = left
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    p0 = r0[:3] + [(r0[i] - paeth(r0[i - 3], 0, 0)) % 256
                   for i in range(3, 9)]
    p1 = [(r1[i] - paeth(0, r0[i], 0)) % 256 for i in range(3)] + [
        (r1[i] - paeth(r1[i - 3], r0[i], r0[i - 3])) % 256
        for i in range(3, 9)
    ]
    png = _hand_png(3, 2, [p0, p1], filters=[4, 4])
    assert np.array_equal(CD.png_decode(png), want)


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_round_trip_every_filter_and_color_type(ch, ft):
    rng = np.random.default_rng(ch * 10 + ft)
    px = rng.integers(0, 256, (11, 7, ch), dtype=np.uint8)
    out = CD.png_decode(CD.png_encode(px, filter_type=ft))
    assert np.array_equal(out, px)


def test_png_rejects_malformed():
    px = np.zeros((4, 4, 3), np.uint8)
    good = CD.png_encode(px)
    with pytest.raises(ValueError, match="not a PNG"):
        CD.png_decode(b"\x89PNX" + good[4:])
    # flip one IDAT byte -> CRC mismatch must be caught
    bad = bytearray(good)
    idat_at = good.index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        CD.png_decode(bytes(bad))
    with pytest.raises(ValueError, match="unsupported"):
        CD.png_decode(_hand_png(1, 1, [[0]], color_type=3, filters=[0]))
    with pytest.raises(ValueError, match="interlace"):
        CD.png_decode(_hand_png(1, 1, [[0, 0, 0]], filters=[0],
                                interlace=1))
    with pytest.raises(ValueError, match="length mismatch"):
        CD.png_decode(_hand_png(3, 2, [[0] * 9], filters=[0]))  # 1 of 2 rows


def test_png_media_payloads_decode_in_operators(spark):
    """synthetic_real_media images alternate BMP/PNG; the feature path
    must agree with a driver-side decode of the same payload."""
    media = MM.synthetic_real_media(spark, 24, seed=9)
    rows = {r.media_id: r for r in
            MM.extract_media_features(media).collect()}
    png_ids = [mid for mid, r in rows.items() if r.decoder == "png-numpy"]
    assert png_ids
    for mid in png_ids:
        _, _, payload, mime, _, _, _ = MM.render_real_media(mid, 9)
        assert mime == "image/png"
        want = CD.bmp_features(CD.png_to_rgb(CD.png_decode(payload)))
        assert np.allclose(rows[mid].features, want, rtol=1e-6)


def test_malformed_png_falls_back_to_stub(spark):
    good = CD.png_encode(np.zeros((4, 4, 3), np.uint8))
    bad = bytearray(good)
    bad[good.index(b"IDAT") + 4] ^= 0xFF  # CRC mismatch
    df = spark.createDataFrame(
        [(1, "image", bytes(bad), "image/png", 4, 4, 0)], MM.MEDIA_SCHEMA
    )
    [r] = MM.extract_media_features(df).collect()
    assert r.decoder == "stub-histogram"
    [rz] = MM.resize_images(df, max_side=2).collect()
    assert rz.resizer == "stub-passthrough"
