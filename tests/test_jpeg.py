from __future__ import annotations

import numpy as np
import pytest

from tern_ep_data_pipeline_spark.operators import multimodal
from tern_ep_data_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 100 * np.sin(xx / 9.0)).clip(0, 255)
    g = (128 + 100 * np.cos(yy / 7.0)).clip(0, 255)
    b = (128 + 80 * np.sin((xx + yy) / 11.0)).clip(0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("size", [(40, 56), (13, 11), (64, 64), (17, 31)])
def test_rgb_444_roundtrip(size):
    img = _smooth(*size)
    dec = decode_jpeg(encode_jpeg(img, quality=92))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 12


@pytest.mark.parametrize("size", [(40, 56), (13, 11), (17, 31)])
def test_rgb_420_roundtrip(size):
    img = _smooth(*size)
    dec = decode_jpeg(encode_jpeg(img, quality=92, subsampling="420"))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    # chroma is 2x2 box-averaged, so the bar is looser than 4:4:4
    assert err.mean() < 6.0 and err.max() <= 40


def test_grayscale_roundtrip():
    g = _smooth(24, 40)[..., 0]
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (24, 40, 3)
    assert np.array_equal(dec[..., 0], dec[..., 1])
    err = np.abs(dec[..., 0].astype(int) - g.astype(int))
    assert err.mean() < 1.5 and err.max() <= 10


def test_sharp_edges_survive_roughly():
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[:16] = 255
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    # the halves stay separated despite ringing at the boundary
    assert dec[:12].mean() > 230 and dec[20:].mean() < 25


def test_deterministic_bytes():
    img = _smooth(20, 20)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


def test_quality_monotone_size():
    img = _smooth(48, 48)
    lo = len(encode_jpeg(img, quality=30))
    hi = len(encode_jpeg(img, quality=95))
    assert hi > lo


@pytest.mark.parametrize(
    "size,sub",
    [((16, 16), "444"), ((17, 23), "444"), ((40, 56), "420"), ((33, 41), "420")],
)
def test_progressive_roundtrip_matches_baseline(size, sub):
    """The progressive scan script transmits every coefficient bit, so its
    decode must be pixel-IDENTICAL to the baseline decode — this pins the
    whole SOF2 entropy layer (DC/AC first + refinement, spectral bands)
    against the independently-tested sequential one. The 4:2:0 odd sizes
    hit the true-vs-MCU-padded block-grid distinction of non-interleaved
    scans."""
    img = _smooth(*size)
    base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
    prog_bytes = encode_jpeg(img, quality=85, subsampling=sub, progressive=True)
    assert b"\xff\xc2" in prog_bytes  # really SOF2
    assert np.array_equal(decode_jpeg(prog_bytes), base)


def test_progressive_grayscale_and_noise():
    g = _smooth(24, 31)[..., 0]
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quality=85, progressive=True)),
        decode_jpeg(encode_jpeg(g, quality=85)),
    )
    # dense coefficients stress ZRL and correction-bit buffering
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(noise, quality=95, progressive=True)),
        decode_jpeg(encode_jpeg(noise, quality=95)),
    )


def test_progressive_flat_image_eob_runs():
    """A flat image has all-zero AC bands everywhere, so the encoder folds
    whole scans into one EOBn symbol with extension bits — the decoder's
    cross-block EOB-run path."""
    img = np.full((64, 64, 3), 77, dtype=np.uint8)
    prog = encode_jpeg(img, quality=85, progressive=True)
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(encode_jpeg(img, quality=85)))


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_restart_markers_roundtrip(interval):
    """DRI + RSTn streams (the camera/web error-resilience layout) decode
    identically to the unsegmented stream in BOTH entropy modes — pins the
    decoder's resync + predictor/EOB-run reset path."""
    img = _smooth(41, 57)
    for sub in ("444", "420"):
        ref = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        for prog in (False, True):
            enc = encode_jpeg(
                img, quality=85, subsampling=sub,
                progressive=prog, restart_interval=interval,
            )
            assert b"\xff\xdd" in enc  # DRI present
            assert np.array_equal(decode_jpeg(enc), ref)


def test_fuzz_truncation_and_corruption_terminate():
    """Corrupt bytes must raise cleanly (quarantinable), never hang or
    allocate unboundedly — the contract extract_features' tag mode relies
    on. Covers truncations at every region, random byte flips, and an
    adversarial SOF declaring a 65535x65535 frame."""
    import struct

    img = _smooth(24, 24)
    for prog in (False, True):
        enc = encode_jpeg(img, quality=80, progressive=prog)
        for cut in (4, 20, len(enc) // 2, len(enc) - 3):
            with pytest.raises((ValueError, IndexError, NotImplementedError, KeyError)):
                decode_jpeg(enc[:cut])
        rng = np.random.default_rng(1)
        for _ in range(40):
            b = bytearray(enc)
            for _ in range(3):
                b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
            try:
                decode_jpeg(bytes(b))  # success is fine; hanging is not
            except Exception:
                pass
    # adversarial dims: SOF rewritten to 65535x65535 must fail fast,
    # before any coefficient allocation
    enc = bytearray(encode_jpeg(img, quality=80))
    i = enc.find(b"\xff\xc0")
    struct.pack_into(">HH", enc, i + 5, 65535, 65535)
    with pytest.raises(ValueError, match="decoder limit"):
        decode_jpeg(bytes(enc))


def test_arithmetic_coding_rejected():
    enc = bytearray(encode_jpeg(_smooth(16, 16)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="0xC9"):
        decode_jpeg(bytes(enc))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")


def test_multimodal_dispatch_jpeg():
    img = _smooth(18, 26)
    out = multimodal.decode_image(encode_jpeg(img, quality=92))
    assert out.shape == (18, 26, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0
