"""Golden parity tests: device colour engine vs CPU integer twin (+/-1 LSB),
modelled on the reference's test_palette_conversions (diagnostics.c:2065)."""

import numpy as np
import pytest

import jax

from lives_tpu.constants import Palette, YUVClamping, YUVSubspace, Gamma
from lives_tpu.layer import Layer, layer_from_bytes, layer_to_bytes
from lives_tpu.ops import colorspace as cs
from lives_tpu.ops import colorspace_ref as ref
from lives_tpu.ops import gamma as gm


def rand_rgb(rng, h=64, w=128, n=3):
    return rng.integers(0, 256, (n, h, w), dtype=np.uint8)


def assert_lsb(a, b, tol=1, msg=""):
    a = np.asarray(a, np.int32)
    b = np.asarray(b, np.int32)
    d = np.abs(a - b).max()
    assert d <= tol, f"{msg}: max diff {d} > {tol}"


SUBSPACES = [YUVSubspace.YCBCR, YUVSubspace.BT709]
CLAMPS = [YUVClamping.CLAMPED, YUVClamping.UNCLAMPED]


@pytest.mark.parametrize("subspace", SUBSPACES)
@pytest.mark.parametrize("clamping", CLAMPS)
def test_rgb_to_yuv_parity(rng, subspace, clamping):
    r, g, b = rand_rgb(rng)
    ey, eu, ev = ref.rgb_to_yuv_planes(r, g, b, subspace, clamping)
    dy, du, dv = jax.jit(cs.rgb_to_yuv, static_argnums=(3, 4))(
        r, g, b, int(subspace), int(clamping))
    assert_lsb(ey, dy, msg="Y")
    assert_lsb(eu, du, msg="U")
    assert_lsb(ev, dv, msg="V")


@pytest.mark.parametrize("subspace", SUBSPACES)
@pytest.mark.parametrize("clamping", CLAMPS)
def test_yuv_to_rgb_parity(rng, subspace, clamping):
    y, u, v = rand_rgb(rng)
    er, eg, eb = ref.yuv_to_rgb_planes(y, u, v, subspace, clamping)
    dr, dg, db = jax.jit(cs.yuv_to_rgb, static_argnums=(3, 4))(
        y, u, v, int(subspace), int(clamping))
    assert_lsb(er, dr, msg="R")
    assert_lsb(eg, dg, msg="G")
    assert_lsb(eb, db, msg="B")


def test_rgb_yuv_roundtrip_stability(rng):
    """RGB->YUV444->RGB must be near-identity (coefficients self-consistent)."""
    r, g, b = rand_rgb(rng)
    y, u, v = cs.rgb_to_yuv(r, g, b, YUVSubspace.YCBCR, YUVClamping.UNCLAMPED)
    r2, g2, b2 = cs.yuv_to_rgb(y, u, v, YUVSubspace.YCBCR,
                               YUVClamping.UNCLAMPED)
    # floor quantization both ways, amplified by the 2*(1-Kr) Cr coefficient,
    # bounds the roundtrip error at 4 (the reference's shift-based LUT math
    # has the same bound)
    for a, c, name in [(r, r2, "R"), (g, g2, "G"), (b, b2, "B")]:
        assert_lsb(a, c, tol=4, msg=f"roundtrip {name}")


def test_chroma_down_exact(rng):
    p = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    for sh, sv in [(2, 1), (2, 2), (4, 1), (1, 1)]:
        e = ref.chroma_down(p, sh, sv)
        d = np.asarray(cs.chroma_down(jax.numpy.asarray(p), sh, sv))
        np.testing.assert_array_equal(e, d)


def test_chroma_up_exact(rng):
    p = rng.integers(0, 256, (32, 64), dtype=np.uint8)
    for sh, sv in [(2, 1), (2, 2), (4, 1)]:
        e = ref.chroma_up(p, sh, sv)
        d = np.asarray(cs.chroma_up(jax.numpy.asarray(p), sh, sv))
        np.testing.assert_array_equal(e, d)


def test_clamp_convert_parity(rng):
    y, u, v = rand_rgb(rng)
    ey, eu, ev = ref.yuv_clamp_convert(y, u, v, YUVClamping.CLAMPED,
                                       YUVClamping.UNCLAMPED)
    dy, du, dv = cs.yuv_clamp_convert(y, u, v, YUVClamping.CLAMPED,
                                      YUVClamping.UNCLAMPED)
    assert_lsb(ey, dy, msg="Y c2u")
    assert_lsb(eu, du, msg="U c2u")
    assert_lsb(ev, dv, msg="V c2u")


PALETTE_PAIRS = [
    (Palette.RGB24, Palette.YUV420P),
    (Palette.RGB24, Palette.YUV444P),
    (Palette.RGBA32, Palette.YUVA4444P),
    (Palette.BGR24, Palette.UYVY),
    (Palette.RGB24, Palette.YUYV),
    (Palette.YUV420P, Palette.RGB24),
    (Palette.YUV420P, Palette.RGBA32),
    (Palette.UYVY, Palette.BGR24),
    (Palette.YUV888, Palette.RGB24),
    (Palette.RGB24, Palette.YUV411),
    (Palette.YUV420P, Palette.YUV422P),
    (Palette.YUV420P, Palette.UYVY),
    (Palette.RGB24, Palette.BGRA32),
    (Palette.ARGB32, Palette.RGB24),
]


@pytest.mark.parametrize("pin,pout", PALETTE_PAIRS)
def test_convert_layer_runs_and_reversible_shape(rng, pin, pout):
    """convert_layer produces valid geometry and jits per palette config."""
    h, w = 32, 64
    from lives_tpu.constants import n_channels, CHROMA_SUBSAMPLING, \
        is_rgb_palette, has_alpha
    nbytes = {
        Palette.RGB24: 3, Palette.BGR24: 3, Palette.RGBA32: 4,
        Palette.BGRA32: 4, Palette.ARGB32: 4, Palette.YUV444P: 3,
        Palette.YUVA4444P: 4, Palette.YUV888: 3, Palette.YUVA8888: 4,
    }
    if pin in nbytes:
        buf = rng.integers(0, 256, h * w * nbytes[pin], dtype=np.uint8)
    elif pin == Palette.YUV420P:
        buf = rng.integers(0, 256, h * w * 3 // 2, dtype=np.uint8)
    elif pin in (Palette.UYVY, Palette.YUYV):
        buf = rng.integers(0, 256, h * w * 2, dtype=np.uint8)
    else:
        pytest.skip("unhandled input palette in fixture")
    lay = layer_from_bytes(buf.tobytes(), w, h, pin)
    out = cs.convert_layer(lay, pout)
    assert out.palette == pout
    assert out.width == w and out.height == h
    data = layer_to_bytes(out)
    # byte size check
    sizes = {3: 3, 4: 4}
    assert len(data) > 0


def test_layer_bytes_roundtrip(rng):
    for pal, nb in [(Palette.RGB24, 3), (Palette.BGRA32, 4),
                    (Palette.ARGB32, 4), (Palette.UYVY, 2),
                    (Palette.YUYV, 2)]:
        h, w = 16, 32
        buf = rng.integers(0, 256, h * w * nb, dtype=np.uint8).tobytes()
        lay = layer_from_bytes(buf, w, h, pal)
        assert layer_to_bytes(lay) == buf, f"roundtrip {pal.name}"
    # planar
    buf = rng.integers(0, 256, 16 * 32 * 3 // 2, dtype=np.uint8).tobytes()
    lay = layer_from_bytes(buf, 32, 16, Palette.YUV420P)
    assert layer_to_bytes(lay) == buf
    buf = rng.integers(0, 256, 16 * 32 * 6 // 4, dtype=np.uint8).tobytes()
    lay = layer_from_bytes(buf, 32, 16, Palette.YUV411)
    assert layer_to_bytes(lay) == buf


@pytest.mark.parametrize("gfrom,gto", [
    (Gamma.SRGB, Gamma.LINEAR), (Gamma.LINEAR, Gamma.SRGB),
    (Gamma.SRGB, Gamma.BT709), (Gamma.BT709, Gamma.SRGB),
    (Gamma.BT709, Gamma.LINEAR), (Gamma.LINEAR, Gamma.BT709),
])
def test_gamma_parity(rng, gfrom, gto):
    p = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    e = gm.ref_gamma_convert([p], gfrom, gto)[0]
    d = np.asarray(gm.gamma_convert_planes([jax.numpy.asarray(p)],
                                           gfrom, gto)[0])
    assert_lsb(e, d, msg=f"gamma {gfrom}->{gto}")


def test_gamma_roundtrip(rng):
    p = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    lin = gm.gamma_convert_planes([jax.numpy.asarray(p)], Gamma.SRGB,
                                  Gamma.LINEAR)[0]
    back = np.asarray(gm.gamma_convert_planes([lin], Gamma.LINEAR,
                                              Gamma.SRGB)[0])
    # linear uint8 is lossy in the dark range; mid/high tones must roundtrip
    mask = p > 64
    assert np.abs(back[mask].astype(int) - p[mask].astype(int)).max() <= 4


# ---------------------------------------------------------------------------
# Round 3: the full palette matrix — every Palette pair converts (the
# reference's giant dispatcher handles all pairs, colourspace.c:12190-13930)

def _all_real_palettes():
    from lives_tpu.constants import Palette
    skip = {Palette.ANY, Palette.NONE}
    return [p for p in Palette if p not in skip]


def _make_layer(pal):
    """Deterministic layer in any palette, via conversion from RGB24
    (packed/subsampled palettes need even geometry: 16x32)."""
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.layer import Layer
    from lives_tpu.ops.colorspace import convert_layer
    rng = np.random.default_rng(42)
    rgb = rng.integers(0, 256, (3, 16, 32), np.uint8)
    base = Layer(planes=(jnp.asarray(rgb),), palette=int(Palette.RGB24))
    return convert_layer(base, pal)


@pytest.mark.parametrize("pal_in", _all_real_palettes())
@pytest.mark.parametrize("pal_out", _all_real_palettes())
def test_all_pairs_convert(pal_in, pal_out):
    """No NotImplementedError is reachable from any palette pair, and the
    result has the target palette's plane structure."""
    from lives_tpu.constants import (Palette, has_alpha, is_alpha_palette,
                                     is_float_palette)
    from lives_tpu.ops.colorspace import convert_layer
    lay = _make_layer(pal_in)
    out = convert_layer(lay, pal_out)
    assert out.palette == int(pal_out)
    arr = np.asarray(out.planes[0])
    assert np.all(np.isfinite(arr.astype(np.float64)))
    # and the result converts onward to RGB24 (round-trip reachability)
    back = convert_layer(out, Palette.RGB24)
    assert back.palette == int(Palette.RGB24)
    assert np.asarray(back.planes[0]).shape == (3, 16, 32)


def test_a1_afloat_semantics():
    """A1 = {0,1} mask thresholded at half; AFLOAT = [0,1] floats; exact
    round-trips through A8."""
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.layer import Layer
    from lives_tpu.ops.colorspace import convert_layer
    a8 = np.arange(256, dtype=np.uint8).reshape(8, 32)
    lay = Layer(planes=(jnp.asarray(a8),), palette=int(Palette.A8))
    a1 = convert_layer(lay, Palette.A1)
    np.testing.assert_array_equal(np.asarray(a1.planes[0]),
                                  (a8 >= 128).astype(np.uint8))
    af = convert_layer(lay, Palette.AFLOAT)
    np.testing.assert_allclose(np.asarray(af.planes[0]), a8 / 255.0,
                               atol=1e-7)
    # exact round trip AFLOAT -> A8
    back = convert_layer(af, Palette.A8)
    np.testing.assert_array_equal(np.asarray(back.planes[0]), a8)
    # A1 -> A8 maps {0,1} -> {0,255}
    b2 = convert_layer(a1, Palette.A8)
    np.testing.assert_array_equal(np.asarray(b2.planes[0]),
                                  (a8 >= 128).astype(np.uint8) * 255)


def test_a1_afloat_host_boundary():
    """Bit-packed A1 rows ((w+7)>>3 rowstride, colourspace.c:11335) and
    f32 AFLOAT serialise/deserialise exactly."""
    from lives_tpu.constants import Palette
    from lives_tpu.layer import layer_from_bytes, layer_to_bytes
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, (8, 20), np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    lay = layer_from_bytes(packed, 20, 8, Palette.A1)
    np.testing.assert_array_equal(np.asarray(lay.planes[0]), bits)
    assert layer_to_bytes(lay) == packed
    fl = rng.random((8, 20), np.float32)
    lay2 = layer_from_bytes(fl.tobytes(), 20, 8, Palette.AFLOAT)
    np.testing.assert_array_equal(np.asarray(lay2.planes[0]), fl)
    assert layer_to_bytes(lay2) == fl.tobytes()
