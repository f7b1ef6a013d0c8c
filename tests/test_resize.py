"""Resize/letterbox parity + invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette, YUVClamping
from lives_tpu.layer import Layer, layer_from_bytes
from lives_tpu.ops import resize as rz


@pytest.mark.parametrize("method", ["nearest", "bilinear", "area", "smooth"])
@pytest.mark.parametrize("hw", [((64, 128), (32, 64)),   # 2x down
                                ((32, 64), (48, 96)),    # 1.5x up
                                ((64, 128), (64, 128)),  # identity
                                ((30, 50), (17, 23))])   # awkward
def test_resize_parity(rng, method, hw):
    (h0, w0), (h1, w1) = hw
    p = rng.integers(0, 256, (h0, w0), dtype=np.uint8)
    e = rz.ref_resize_plane(p, h1, w1, method)
    d = np.asarray(rz.resize_plane(jnp.asarray(p), h1, w1, method))
    assert d.shape == (h1, w1)
    assert np.abs(e.astype(int) - d.astype(int)).max() <= 1, method


def test_resize_constant_preserved(rng):
    p = np.full((40, 60), 137, np.uint8)
    for m in ["bilinear", "area", "nearest"]:
        out = np.asarray(rz.resize_plane(jnp.asarray(p), 25, 33, m))
        assert (out == 137).all(), m


def test_interp_rows_sum_to_one():
    for m in ["bilinear", "area", "nearest"]:
        a = rz.interp_matrix(100, 37, m)
        np.testing.assert_allclose(a.sum(1), 1.0, atol=1e-5)
        a = rz.interp_matrix(37, 100, m)
        np.testing.assert_allclose(a.sum(1), 1.0, atol=1e-5)


def test_resize_layer_yuv420(rng):
    buf = rng.integers(0, 256, 64 * 128 * 3 // 2, dtype=np.uint8).tobytes()
    lay = layer_from_bytes(buf, 128, 64, Palette.YUV420P)
    out = rz.resize_layer(lay, 64, 32)
    assert out.planes[0].shape == (32, 64)
    assert out.planes[1].shape == (16, 32)


def test_letterbox_roundtrip(rng):
    buf = rng.integers(0, 256, 36 * 64 * 3, dtype=np.uint8).tobytes()
    lay = layer_from_bytes(buf, 64, 36, Palette.RGB24)  # 16:9
    boxed = rz.letterbox_layer(lay, 64, 64)             # square target
    assert boxed.width == 64 and boxed.height == 64
    lw, lh, ox, oy = rz.letterbox_geometry(64, 36, 64, 64)
    assert (lw, lh) == (64, 36)
    # bars are black
    arr = np.asarray(boxed.planes[0])
    assert (arr[:, :oy, :] == 0).all() and (arr[:, oy + lh:, :] == 0).all()
    # crop back = inner resize
    crop = rz.unletterbox_layer(boxed, lw, lh, ox, oy)
    assert crop.width == lw and crop.height == lh


def test_letterbox_yuv_black_bars(rng):
    buf = rng.integers(17, 235, 32 * 64 * 3 // 2, dtype=np.uint8).tobytes()
    lay = layer_from_bytes(buf, 64, 32, Palette.YUV420P,
                           clamping=YUVClamping.CLAMPED)
    boxed = rz.letterbox_layer(lay, 64, 64)
    y = np.asarray(boxed.planes[0])
    u = np.asarray(boxed.planes[1])
    assert (y[:16, :] == 16).all()      # clamped luma black
    assert (u[:8, :] == 128).all()      # neutral chroma
