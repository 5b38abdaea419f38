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
    assert {r.decoder for r in by_kind["image"]} == {"bmp-numpy"}
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
    assert out and all(r.resizer == "bmp-numpy-nn" for r in out.values())
    for mid, r in out.items():
        _, _, payload, _, w0, h0, _ = MM.render_real_media(mid, 7)
        px0 = CD.bmp_decode(payload)
        px1 = CD.bmp_decode(bytes(r.payload))
        assert px1.shape == (r.height, r.width, 3)
        assert max(r.width, r.height) <= 8
        # nearest-neighbor: every output pixel is an input pixel
        yi = (np.arange(r.height) * px0.shape[0] // r.height).clip(
            0, px0.shape[0] - 1
        )
        xi = (np.arange(r.width) * px0.shape[1] // r.width).clip(
            0, px0.shape[1] - 1
        )
        assert np.array_equal(px1, px0[yi][:, xi])


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
