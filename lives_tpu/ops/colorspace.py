"""Device (TPU) colour engine: palette conversions as fused jnp ops.

Replaces the reference's ~70 hand-written per-pair conversion kernels and the
`convert_layer_palette_full` dispatcher (`/root/reference/src/colourspace.c:
12190-13930,1985-2360`). Because device layers are always planar/canonical
(see layer.py), every palette pair decomposes into at most three composable
steps, each of which XLA fuses into neighbouring work:

  colour matrix (RGB<->YUV, float32, VPU)  o  chroma re-sample (integer,
  exact vs CPU twin)  o  alpha add/drop.

Matrix maths runs in float32 and is guaranteed within +/-1 LSB of the
integer-LUT CPU twin (colorspace_ref.py): the twin computes
floor((sum of rounded 16.16 fixed-point terms) / 2^16); each term deviates
from the exact product by <= 0.5/2^16 and float32 error at magnitude <=255*3
is of the same order, so the floored results differ by at most 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    CHROMA_SUBSAMPLING,
    CLAMP_FACTOR_UV,
    CLAMP_FACTOR_Y,
    Palette,
    UV_BIAS,
    UV_CLAMP_MAX,
    Y_CLAMP_MAX,
    YUV_CLAMP_MIN,
    YUVClamping,
    YUVSubspace,
    has_alpha,
    is_float_palette,
    is_rgb_palette,
    is_yuv_palette,
)
from ..layer import Layer
from . import colorspace_ref as ref


def _f32(x):
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# RGB <-> YUV matrix ops (per-plane, fully shape-polymorphic)
# ---------------------------------------------------------------------------

def rgb_to_yuv(r, g, b, subspace: int = YUVSubspace.YCBCR,
               clamping: int = YUVClamping.CLAMPED):
    """uint8 R,G,B -> uint8 Y,U,V (444). +/-1 LSB vs twin."""
    m = ref.rgb2yuv_coeffs(subspace).astype(np.float32)
    clamp = clamping == YUVClamping.CLAMPED
    cfy = np.float32(CLAMP_FACTOR_Y if clamp else 1.0)
    cfuv = np.float32(CLAMP_FACTOR_UV if clamp else 1.0)
    yoff = np.float32(YUV_CLAMP_MIN if clamp else 0.0)
    r, g, b = _f32(r), _f32(g), _f32(b)
    y = (m[0, 0] * r + m[0, 1] * g + m[0, 2] * b) * cfy + yoff
    u = (m[1, 0] * r + m[1, 1] * g + m[1, 2] * b) * cfuv + np.float32(UV_BIAS)
    v = (m[2, 0] * r + m[2, 1] * g + m[2, 2] * b) * cfuv + np.float32(UV_BIAS)
    if clamp:
        ymin, ymax, uvmax = 16.0, 235.0, 240.0
    else:
        ymin, ymax, uvmax = 0.0, 255.0, 255.0
    y = jnp.clip(jnp.floor(y), ymin, ymax).astype(jnp.uint8)
    u = jnp.clip(jnp.floor(u), ymin, uvmax).astype(jnp.uint8)
    v = jnp.clip(jnp.floor(v), ymin, uvmax).astype(jnp.uint8)
    return y, u, v


def yuv_to_rgb(y, u, v, subspace: int = YUVSubspace.YCBCR,
               clamping: int = YUVClamping.CLAMPED):
    """uint8 Y,U,V (444) -> uint8 R,G,B. +/-1 LSB vs twin."""
    cc = ref.yuv2rgb_coeffs(subspace).astype(np.float32)
    y, u, v = _f32(y), _f32(u), _f32(v)
    if clamping == YUVClamping.CLAMPED:
        yy = (jnp.clip(y, 16.0, 235.0) - 16.0) * np.float32(255.0 / 219.0)
        uu = (jnp.clip(u, 16.0, 240.0) - 16.0) * np.float32(255.0 / 224.0) - 128.0
        vv = (jnp.clip(v, 16.0, 240.0) - 16.0) * np.float32(255.0 / 224.0) - 128.0
    else:
        yy = y
        uu = u - 128.0
        vv = v - 128.0
    r = yy + cc[0, 1] * vv
    g = yy + cc[1, 0] * uu + cc[1, 1] * vv
    b = yy + cc[2, 0] * uu
    to8 = lambda x: jnp.clip(jnp.floor(x), 0.0, 255.0).astype(jnp.uint8)
    return to8(r), to8(g), to8(b)


def yuv_clamp_convert(y, u, v, from_clamping: int, to_clamping: int):
    """Clamped <-> unclamped range remap; matches twin tables within 1 LSB."""
    if from_clamping == to_clamping:
        return y, u, v
    y, u, v = _f32(y), _f32(u), _f32(v)
    half = np.float32(0.5)
    if from_clamping == YUVClamping.CLAMPED:
        yo = (y - np.float32(YUV_CLAMP_MIN)) / np.float32(CLAMP_FACTOR_Y)
        uvo = lambda c: (c - np.float32(UV_BIAS)) / np.float32(CLAMP_FACTOR_UV) + np.float32(UV_BIAS)
    else:
        yo = y * np.float32(CLAMP_FACTOR_Y) + np.float32(YUV_CLAMP_MIN)
        uvo = lambda c: (c - np.float32(UV_BIAS)) * np.float32(CLAMP_FACTOR_UV) + np.float32(UV_BIAS)
    to8 = lambda x: jnp.clip(jnp.floor(x + half), 0, 255).astype(jnp.uint8)
    return to8(yo), to8(uvo(u)), to8(uvo(v))


# ---------------------------------------------------------------------------
# Chroma resampling — integer-exact twin of colorspace_ref.chroma_down/up
# ---------------------------------------------------------------------------

def chroma_down(plane, sh: int, sv: int):
    if sh == 1 and sv == 1:
        return plane
    p = plane.astype(jnp.int32)
    h, w = p.shape[-2], p.shape[-1]
    p = p[..., : h - h % sv, : w - w % sh]
    p = p.reshape(*p.shape[:-2], h // sv, sv, w // sh, sh)
    s = p.sum(axis=(-3, -1))
    n = sh * sv
    return ((s + n // 2) // n).astype(jnp.uint8)


def chroma_up(plane, sh: int, sv: int):
    if sh == 1 and sv == 1:
        return plane
    p = jnp.repeat(plane, sv, axis=-2)
    return jnp.repeat(p, sh, axis=-1)


# ---------------------------------------------------------------------------
# Alpha
# ---------------------------------------------------------------------------

def alpha_premultiply(planes, alpha, un: bool = False):
    """(Un)premultiply colour planes by alpha (reference `alpha_premult`,
    colourspace.c:11968). uint8 in/out."""
    a = _f32(alpha) * np.float32(1.0 / 255.0)
    out = []
    for p in planes:
        f = _f32(p)
        if un:
            f = jnp.where(a > 0, f / jnp.maximum(a, 1e-6), f)
        else:
            f = f * a
        out.append(jnp.clip(jnp.floor(f + 0.5), 0, 255).astype(jnp.uint8))
    return out


# ---------------------------------------------------------------------------
# Layer-level palette conversion (the convert_layer_palette successor)
# ---------------------------------------------------------------------------

def _rgb_planes(layer: Layer):
    """Canonical (C,H,W) RGB(A) array of an RGB-family layer."""
    return layer.planes[0]


def convert_layer(layer: Layer, palette: int,
                  clamping: int | None = None,
                  subspace: int | None = None,
                  sampling: int | None = None) -> Layer:
    """Convert a layer to a target palette (+ optional clamping/subspace).

    Successor of `convert_layer_palette_full` (colourspace.c:12190). Pure,
    jittable (palette args static); no-op conversions return the input.
    """
    pal_in = Palette(layer.palette)
    pal_out = Palette(palette)
    clamping = layer.clamping if clamping is None else clamping
    subspace = layer.subspace if subspace is None else subspace
    sampling = layer.sampling if sampling is None else sampling

    if (pal_in == pal_out and clamping == layer.clamping
            and subspace == layer.subspace):
        return layer

    meta = dict(palette=int(pal_out), clamping=int(clamping),
                sampling=int(sampling), subspace=int(subspace),
                gamma=layer.gamma, premult=layer.premult)

    # --- RGB -> RGB: canonical planes identical; only alpha membership
    # and int<->float representation change ---
    if is_rgb_palette(pal_in) and is_rgb_palette(pal_out):
        arr = _rgb_planes(layer)
        fin, fout = is_float_palette(pal_in), is_float_palette(pal_out)
        if fin and not fout:
            arr = jnp.clip(jnp.floor(arr * 255.0 + 0.5), 0, 255
                           ).astype(jnp.uint8)
        elif fout and not fin:
            arr = arr.astype(jnp.float32) * np.float32(1.0 / 255.0)
        arr = _fix_alpha_chan(arr, has_alpha(pal_in), has_alpha(pal_out))
        return Layer(planes=(arr,), **meta)

    # --- RGB -> YUV ---
    if is_rgb_palette(pal_in) and is_yuv_palette(pal_out):
        arr = _rgb_planes(layer)
        r, g, b = arr[0], arr[1], arr[2]
        y, u, v = rgb_to_yuv(r, g, b, subspace, clamping)
        sh, sv = CHROMA_SUBSAMPLING[pal_out]
        u, v = chroma_down(u, sh, sv), chroma_down(v, sh, sv)
        planes = [y, u, v]
        if has_alpha(pal_out):
            planes.append(arr[3] if has_alpha(pal_in)
                          else jnp.full_like(y, 255))
        return Layer(planes=tuple(planes), **meta)

    # --- YUV -> RGB ---
    if is_yuv_palette(pal_in) and is_rgb_palette(pal_out):
        y, u, v = layer.planes[0], layer.planes[1], layer.planes[2]
        sh, sv = CHROMA_SUBSAMPLING[pal_in]
        u, v = chroma_up(u, sh, sv), chroma_up(v, sh, sv)
        r, g, b = yuv_to_rgb(y, u, v, layer.subspace, layer.clamping)
        chans = [r, g, b]
        if has_alpha(pal_out):
            chans.append(layer.planes[3] if has_alpha(pal_in)
                         else jnp.full_like(r, 255))
        return Layer(planes=(jnp.stack(chans, 0),), **meta)

    # --- YUV -> YUV: clamp remap + chroma re-sample + alpha ---
    if is_yuv_palette(pal_in) and is_yuv_palette(pal_out):
        y, u, v = layer.planes[0], layer.planes[1], layer.planes[2]
        if subspace != layer.subspace:
            # route through RGB-exact matrix math (rare; reference warns too)
            shi, svi = CHROMA_SUBSAMPLING[pal_in]
            u4, v4 = chroma_up(u, shi, svi), chroma_up(v, shi, svi)
            r, g, b = yuv_to_rgb(y, u4, v4, layer.subspace, layer.clamping)
            y, u, v = rgb_to_yuv(r, g, b, subspace, clamping)
        else:
            y, u, v = yuv_clamp_convert(y, u, v, layer.clamping, clamping)
            shi, svi = CHROMA_SUBSAMPLING[pal_in]
            sho, svo = CHROMA_SUBSAMPLING[pal_out]
            if (shi, svi) != (sho, svo):
                u = chroma_up(u, shi, svi)
                v = chroma_up(v, shi, svi)
                u, v = chroma_down(u, sho, svo), chroma_down(v, sho, svo)
        planes = [y, u, v]
        if has_alpha(pal_out):
            planes.append(layer.planes[3] if has_alpha(pal_in)
                          else jnp.full_like(y, 255))
        return Layer(planes=tuple(planes), **meta)

    # --- alpha palettes (A8 / A1 / AFLOAT) ---
    # Device representations: A8 = (H,W) u8, A1 = (H,W) u8 in {0,1}
    # (bit-packing happens at the host boundary, layer.py — the reference
    # packs rows at (width+7)>>3, colourspace.c:11335), AFLOAT = (H,W) f32
    # in [0,1]. These are the negotiation options for alpha channels
    # (effects-weed.c:1118); colour <-> alpha goes through luma, like the
    # reference's A8-from-Y convention.
    _ALPHA = (Palette.A8, Palette.A1, Palette.AFLOAT)

    def _encode_alpha(a8):
        """u8 alpha plane -> target alpha palette representation."""
        if pal_out == Palette.A8:
            return a8
        if pal_out == Palette.A1:
            # threshold at half (round-to-nearest of a8/255)
            return (a8 >= 128).astype(jnp.uint8)
        return a8.astype(jnp.float32) * (1.0 / 255.0)        # AFLOAT

    if pal_in in _ALPHA:
        a = layer.planes[0]
        if pal_in == Palette.A1:
            a8 = (a.astype(jnp.uint8) & 1) * jnp.uint8(255)
        elif pal_in == Palette.AFLOAT:
            a8 = jnp.clip(jnp.floor(a * 255.0 + 0.5), 0, 255
                          ).astype(jnp.uint8)
        else:
            a8 = a
        if pal_out in _ALPHA:
            return Layer(planes=(_encode_alpha(a8),), **meta)
        # alpha -> colour: expand to grey RGB, then recurse for YUV/packed
        grey = Layer(planes=(jnp.stack([a8, a8, a8], 0),),
                     palette=int(Palette.RGB24), clamping=layer.clamping,
                     sampling=layer.sampling, subspace=layer.subspace,
                     gamma=layer.gamma, premult=layer.premult)
        if pal_out == Palette.RGB24:
            return Layer(planes=grey.planes, **meta)
        return convert_layer(grey, pal_out, clamping, subspace, sampling)
    if pal_out in _ALPHA:
        if is_rgb_palette(pal_in):
            arr = _rgb_planes(layer)
            if is_float_palette(pal_in):
                arr = jnp.clip(jnp.floor(arr * 255.0 + 0.5), 0, 255
                               ).astype(jnp.uint8)
            y, _, _ = rgb_to_yuv(arr[0], arr[1], arr[2], subspace,
                                 YUVClamping.UNCLAMPED)
            return Layer(planes=(_encode_alpha(y),), **meta)
        if is_yuv_palette(pal_in):
            return Layer(planes=(_encode_alpha(layer.planes[0]),), **meta)

    raise NotImplementedError(
        f"convert_layer: {pal_in.name} -> {pal_out.name}")


def _fix_alpha_chan(arr, had: bool, want: bool):
    if had == want:
        return arr
    if want:
        opaque = 1.0 if jnp.issubdtype(arr.dtype, jnp.floating) else 255
        return jnp.concatenate(
            [arr, jnp.full((1,) + arr.shape[1:], opaque, arr.dtype)], 0)
    return arr[:3]
