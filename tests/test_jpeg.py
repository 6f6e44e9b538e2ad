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


def test_progressive_rejected():
    enc = bytearray(encode_jpeg(_smooth(16, 16)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(enc))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")


def test_multimodal_dispatch_jpeg():
    img = _smooth(18, 26)
    out = multimodal.decode_image(encode_jpeg(img, quality=92))
    assert out.shape == (18, 26, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0
