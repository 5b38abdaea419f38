"""Baseline JPEG codec (functions/jpeg.py).

Independence: the IDCT oracle below is a naive per-pixel double loop
implementing the T.81 §A.3.3 formula directly (the codec uses a
separable matrix product); Huffman canonical-code construction is
checked against the spec's worked property (codes of equal length are
consecutive, shorter codes are prefixes of nothing); round trips gate
the full marker/entropy/DCT pipeline end-to-end with PSNR floors.
"""

import struct

import numpy as np
import pytest

from relation_extraction_transformer_spark.functions import jpeg as J


# ------------------------------------------------------------- oracle ----

def naive_idct_8x8(coef: np.ndarray) -> np.ndarray:
    """T.81 §A.3.3, straight from the spec: four nested loops."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def test_matrix_idct_matches_naive_spec_formula():
    rng = np.random.default_rng(3)
    for _ in range(5):
        coef = rng.normal(0, 100, (8, 8))
        fast = J._DCT_T.T @ coef @ J._DCT_T
        assert np.allclose(fast, naive_idct_8x8(coef), atol=1e-9)


def test_fdct_is_exact_inverse_of_idct():
    rng = np.random.default_rng(4)
    block = rng.integers(-128, 128, (8, 8)).astype(float)
    coef = J._DCT_T @ block @ J._DCT_T.T
    back = J._DCT_T.T @ coef @ J._DCT_T
    assert np.allclose(back, block, atol=1e-9)


def test_huffman_canonical_codes():
    """Canonical property: within a length, codes are consecutive; the
    total count matches; decode table round-trips the encode table."""
    bits, vals = J.STD_AC_LUMA
    dec = J._build_huffman(bits, vals)
    assert len(dec) == sum(bits) == len(vals)
    enc = J._build_encode_table(bits, vals)
    for (length, code), sym in dec.items():
        assert enc[sym] == (code, length)
    by_len = {}
    for (length, code) in dec:
        by_len.setdefault(length, []).append(code)
    for length, codes in by_len.items():
        codes.sort()
        assert codes == list(range(codes[0], codes[0] + len(codes)))


# -------------------------------------------------------- round trips ----

def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("shape", [(8, 8), (9, 15), (17, 33), (40, 24)])
def test_q100_round_trip_near_lossless(shape):
    px = np.random.default_rng(shape).integers(
        0, 256, (*shape, 3), np.uint8
    )
    out = J.jpeg_decode(J.jpeg_encode(px, quality=100))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_smooth_image_high_psnr_all_modes():
    px = np.zeros((24, 20, 3), np.uint8)
    px[..., 0] = np.linspace(10, 240, 20)[None, :]
    px[..., 1] = np.linspace(5, 250, 24)[:, None]
    px[..., 2] = 77
    for kw in (
        dict(quality=90),
        dict(quality=90, subsample=True),
        dict(quality=90, restart_interval=1),
    ):
        out = J.jpeg_decode(J.jpeg_encode(px, **kw))
        assert _psnr(out, px) > 30, kw


def test_grayscale_single_component():
    g = np.random.default_rng(7).integers(0, 256, (20, 22), np.uint8)
    out = J.jpeg_decode(J.jpeg_encode(g, quality=100))
    assert out.shape == (20, 22, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 3


def test_restart_markers_present_and_decoded():
    px = np.random.default_rng(8).integers(0, 256, (32, 32, 3), np.uint8)
    plain = J.jpeg_encode(px, quality=95)
    dri = J.jpeg_encode(px, quality=95, restart_interval=2)
    assert b"\xff\xdd" in dri and b"\xff\xdd" not in plain  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in dri for i in range(8))
    # identical reconstruction: restarts change framing, not content
    assert np.array_equal(J.jpeg_decode(dri), J.jpeg_decode(plain))


def test_subsampled_chroma_halves_chroma_plane():
    """4:2:0 must actually subsample: the Cb/Cr planes carry h=v=1 vs
    luma h=v=2 in the SOF, and the payload is smaller on chroma-noisy
    input."""
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (32, 32, 3), np.uint8)
    full = J.jpeg_encode(px, quality=90)
    sub = J.jpeg_encode(px, quality=90, subsample=True)
    assert len(sub) < len(full)
    sof_at = sub.index(b"\xff\xc0")
    nc = sub[sof_at + 9]
    assert nc == 3
    hv = [sub[sof_at + 11 + 3 * i] for i in range(3)]
    assert hv == [0x22, 0x11, 0x11]


def test_rejects_non_baseline_and_malformed():
    px = np.zeros((8, 8, 3), np.uint8)
    good = J.jpeg_encode(px)
    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"\x00\x00" + good[2:])
    # flip SOF0 -> SOF3 (lossless): still rejected as non-baseline
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        J.jpeg_decode(lossless)
    # flip SOF0 -> SOF2: r7 DECODES progressive, so a baseline stream
    # mislabeled progressive now fails as an illegal progressive scan
    # (its single interleaved scan claims Ss=0 Se=63)
    mislabel = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="DC scan"):
        J.jpeg_decode(mislabel)
    with pytest.raises(ValueError):
        J.jpeg_decode(good[: len(good) // 2])  # truncated scan
    # 16-bit quant table flag
    bad = bytearray(good)
    dqt_at = good.index(b"\xff\xdb") + 4
    bad[dqt_at] |= 0x10
    with pytest.raises(ValueError, match="16-bit"):
        J.jpeg_decode(bytes(bad))


@pytest.mark.parametrize(
    "shape,subsample",
    [((16, 24, 3), False), ((17, 23, 3), True), ((8, 8), False),
     ((33, 9, 3), False)],
)
def test_progressive_decode_equals_baseline_exactly(shape, subsample):
    """SOF2 vs SOF0 are two entropy organizations of the SAME quantized
    coefficients: decoding the progressive stream (DC Al=1 + refine,
    split AC bands at Al=1 + full-band refinement with EOB runs and
    correction bits) must reproduce the baseline decode bit-for-bit.
    The baseline decoder is independently oracled against the naive
    spec-formula IDCT, so this transitively pins the progressive path."""
    rng = np.random.default_rng(int(np.prod(shape)))
    px = rng.integers(0, 256, shape).astype(np.uint8)
    kw = {} if len(shape) == 2 else {"subsample": subsample}
    base = J.jpeg_decode(J.jpeg_encode(px, quality=85, **kw))
    prog_bytes = J.jpeg_encode_progressive(px, quality=85, **kw)
    # it really is a progressive stream: SOF2 marker present, SOF0 absent
    assert b"\xff\xc2" in prog_bytes and b"\xff\xc0" not in prog_bytes
    assert prog_bytes.count(b"\xff\xda") >= 5  # multi-scan
    prog = J.jpeg_decode(prog_bytes)
    assert np.array_equal(base, prog)


def test_progressive_smooth_image_and_quality_sweep():
    """Smooth gradients at several qualities — exercises long EOB runs
    (most high-frequency bands are entirely zero) and the ZRL path."""
    yy, xx = np.mgrid[0:24, 0:40]
    px = np.stack(
        [(yy * 5) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    for q in (30, 60, 95):
        base = J.jpeg_decode(J.jpeg_encode(px, quality=q))
        prog = J.jpeg_decode(J.jpeg_encode_progressive(px, quality=q))
        assert np.array_equal(base, prog), f"quality {q}"


def test_progressive_truncated_stream_raises():
    px = np.full((16, 16, 3), 77, np.uint8)
    data = J.jpeg_encode_progressive(px)
    with pytest.raises(ValueError):
        J.jpeg_decode(data[: len(data) // 3])


def test_progressive_payload_takes_real_decoder_in_multimodal():
    """The multimodal sniffing path now really decodes SOF2 payloads
    (they used to fall to the labeled stub)."""
    from relation_extraction_transformer_spark.operators import (
        multimodal as MM,
    )

    px = np.zeros((16, 16, 3), np.uint8)
    px[:8, :8] = (200, 30, 90)
    data = J.jpeg_encode_progressive(px)
    feats, name = MM._try_real_decode(data)
    assert name == "jpeg-numpy"
    assert feats is not None and len(feats) > 0
    # identical features to the baseline encoding of the same pixels
    feats_base, name_base = MM._try_real_decode(J.jpeg_encode(px))
    assert name_base == "jpeg-numpy" and feats == feats_base


def test_rejects_non_interleaved_scan():
    """A legal baseline stream may carry one scan PER component
    (non-interleaved).  Decoding only the first (Y) scan would silently
    return a grayscale image for a color frame — the decoder must raise
    instead, so the multimodal stub fallback takes over (same path as
    progressive)."""
    px = np.zeros((8, 8, 3), np.uint8)
    good = J.jpeg_encode(px)
    sos_at = good.index(b"\xff\xda")
    # rebuild the SOS header declaring a 1-component (Y-only) scan:
    # len=8, ns=1, (cs=1, dc0/ac0), spectral 0..63, ah/al 0
    patched = (
        good[:sos_at]
        + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
        + good[sos_at + 14:]  # original SOS was len 12 (+2 marker)
    )
    with pytest.raises(ValueError, match="non-interleaved"):
        J.jpeg_decode(patched)


def test_quality_knob_monotone_size_and_error():
    px = np.random.default_rng(10).integers(0, 256, (24, 24, 3), np.uint8)
    sizes, errs = [], []
    for q in (30, 60, 90, 100):
        data = J.jpeg_encode(px, quality=q)
        out = J.jpeg_decode(data)
        sizes.append(len(data))
        errs.append(np.abs(out.astype(int) - px.astype(int)).mean())
    assert sizes == sorted(sizes), "payload must grow with quality"
    assert errs == sorted(errs, reverse=True), "error must shrink"


def test_byte_stuffing_round_trips():
    """An image whose entropy stream is certain to contain 0xFF bytes
    (high-entropy, many blocks) must round-trip — i.e. stuffing and
    unstuffing agree."""
    px = np.random.default_rng(11).integers(0, 256, (48, 48, 3), np.uint8)
    data = J.jpeg_encode(px, quality=85)
    sos_at = data.index(b"\xff\xda")
    assert b"\xff\x00" in data[sos_at:], "fixture must exercise stuffing"
    out = J.jpeg_decode(data)
    assert out.shape == px.shape


def test_decoder_handles_appn_and_com_segments():
    px = np.full((8, 8, 3), 77, np.uint8)
    data = J.jpeg_encode(px, quality=100)
    # splice a COM and an APP2 segment after the APP0
    app0_end = 2 + 2 + 16  # SOI + APP0 marker + (len incl. its 2 bytes)
    extra = (
        b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
        + b"\xff\xe2" + struct.pack(">H", 6) + b"ICC!"
    )
    spliced = data[:app0_end] + extra + data[app0_end:]
    out = J.jpeg_decode(spliced)
    assert np.abs(out.astype(int) - 77).max() <= 2
