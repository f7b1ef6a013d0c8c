"""Byte-level golden tests: full convert_layer dispatcher vs a numpy twin
composed from colorspace_ref primitives, over reference byte layouts —
the test_palette_conversions analogue (diagnostics.c:2065), end to end."""

import numpy as np
import pytest

from lives_tpu.constants import (CHROMA_SUBSAMPLING, Palette, YUVClamping,
                                 YUVSubspace)
from lives_tpu.layer import layer_from_bytes, layer_to_bytes
from lives_tpu.ops import colorspace as cs
from lives_tpu.ops import colorspace_ref as ref

H, W = 32, 64


def make_bytes(rng, pal):
    sizes = {
        Palette.RGB24: 3, Palette.BGR24: 3, Palette.RGBA32: 4,
        Palette.BGRA32: 4, Palette.ARGB32: 4, Palette.YUV444P: 3,
        Palette.YUVA4444P: 4, Palette.YUV888: 3, Palette.YUVA8888: 4,
        Palette.UYVY: 2, Palette.YUYV: 2,
    }
    if pal in sizes:
        n = H * W * sizes[pal]
    elif pal == Palette.YUV420P or pal == Palette.YVU420P:
        n = H * W * 3 // 2
    elif pal == Palette.YUV422P:
        n = H * W * 2
    elif pal == Palette.YUV411:
        n = H * W * 6 // 4
    else:
        raise ValueError(pal)
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


def twin_yuv_to_rgb_bytes(buf, pal_in, subspace, clamping, want_alpha):
    lay = layer_from_bytes(buf, W, H, pal_in)
    y, u, v = (np.asarray(p) for p in lay.planes[:3])
    sh, sv = CHROMA_SUBSAMPLING[pal_in]
    u = ref.chroma_up(u, sh, sv)
    v = ref.chroma_up(v, sh, sv)
    r, g, b = ref.yuv_to_rgb_planes(y, u, v, subspace, clamping)
    chans = [r, g, b]
    if want_alpha:
        chans.append(np.asarray(lay.planes[3]) if len(lay.planes) > 3
                     else np.full((H, W), 255, np.uint8))
    return np.stack(chans, 0)


@pytest.mark.parametrize("pal_in", [Palette.YUV420P, Palette.YVU420P,
                                    Palette.YUV422P, Palette.YUV444P,
                                    Palette.UYVY, Palette.YUYV,
                                    Palette.YUV888, Palette.YUV411,
                                    Palette.YUVA4444P, Palette.YUVA8888])
@pytest.mark.parametrize("subspace", [YUVSubspace.YCBCR, YUVSubspace.BT709])
def test_yuv_to_rgb_golden(rng, pal_in, subspace):
    buf = make_bytes(rng, pal_in)
    lay = layer_from_bytes(buf, W, H, pal_in, subspace=int(subspace),
                           clamping=int(YUVClamping.CLAMPED))
    out = cs.convert_layer(lay, Palette.RGBA32)
    got = np.asarray(out.planes[0])
    want = twin_yuv_to_rgb_bytes(buf, pal_in, subspace,
                                 YUVClamping.CLAMPED, True)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, pal_in


@pytest.mark.parametrize("pal_out", [Palette.YUV420P, Palette.YUV422P,
                                     Palette.YUV444P, Palette.UYVY,
                                     Palette.YUYV, Palette.YUV411,
                                     Palette.YUVA8888])
def test_rgb_to_yuv_golden(rng, pal_out):
    buf = make_bytes(rng, Palette.RGB24)
    lay = layer_from_bytes(buf, W, H, Palette.RGB24)
    out = cs.convert_layer(lay, pal_out, clamping=int(YUVClamping.CLAMPED),
                           subspace=int(YUVSubspace.YCBCR))
    # twin
    img = np.frombuffer(buf, np.uint8).reshape(H, W, 3)
    ey, eu, ev = ref.rgb_to_yuv_planes(img[..., 0], img[..., 1],
                                       img[..., 2])
    sh, sv = CHROMA_SUBSAMPLING[pal_out]
    # device path: +/-1 on per-pixel values BEFORE box-average -> stays +/-1
    eu, ev = ref.chroma_down(eu, sh, sv), ref.chroma_down(ev, sh, sv)
    gy = np.asarray(out.planes[0])
    gu = np.asarray(out.planes[1])
    gv = np.asarray(out.planes[2])
    assert np.abs(gy.astype(int) - ey.astype(int)).max() <= 1
    assert np.abs(gu.astype(int) - eu.astype(int)).max() <= 1
    assert np.abs(gv.astype(int) - ev.astype(int)).max() <= 1
    # byte layout roundtrip stays consistent
    assert layer_to_bytes(layer_from_bytes(layer_to_bytes(out), W, H,
                                           pal_out)) == layer_to_bytes(out)


@pytest.mark.parametrize("pin,pout", [
    (Palette.RGB24, Palette.BGR24), (Palette.RGBA32, Palette.ARGB32),
    (Palette.BGRA32, Palette.RGB24)])
def test_rgb_family_byte_semantics(rng, pin, pout):
    """RGB-family converts only permute byte order at the host boundary."""
    buf = make_bytes(rng, pin)
    lay = layer_from_bytes(buf, W, H, pin)
    out = cs.convert_layer(lay, pout)
    data = layer_to_bytes(out)
    # red channel value preserved: decode both and compare canonical planes
    a = np.asarray(lay.planes[0])[:3]
    b = np.asarray(layer_from_bytes(data, W, H, pout).planes[0])[:3]
    np.testing.assert_array_equal(a, b)


def test_yuv_clamping_roundtrip_golden(rng):
    buf = make_bytes(rng, Palette.YUV420P)
    lay = layer_from_bytes(buf, W, H, Palette.YUV420P,
                           clamping=int(YUVClamping.CLAMPED))
    un = cs.convert_layer(lay, Palette.YUV420P,
                          clamping=int(YUVClamping.UNCLAMPED))
    ey, eu, ev = ref.yuv_clamp_convert(
        np.asarray(lay.planes[0]), np.asarray(lay.planes[1]),
        np.asarray(lay.planes[2]), YUVClamping.CLAMPED,
        YUVClamping.UNCLAMPED)
    assert np.abs(np.asarray(un.planes[0]).astype(int)
                  - ey.astype(int)).max() <= 1
    assert np.abs(np.asarray(un.planes[1]).astype(int)
                  - eu.astype(int)).max() <= 1
