"""Pallas TPU kernels for the pixel-engine colour core (alternate backend).

These kernels fuse the YUV<->RGB matrix maths with the *vertical* half of
chroma re-sampling inside one VMEM pass per row-tile (W rides the lane
axis). Mosaic constraints discovered on real hardware shape the design:

- lane-axis (horizontal) interleave is not lowerable (`pltpu.repeat` tiles,
  strided lane stores and minor-dim reshapes fail to compile), so the
  horizontal 2x chroma repeat happens in XLA at the kernel boundary;
- vertical 2x interleave lowers cleanly as `stack(axis=1) + reshape`;
- u8 <-> f32 casts must route through int32.

Measured on v5e, the XLA path (ops/colorspace.py) is already at the HBM
roofline for this workload, so the pallas backend is parity-not-speedup for
plain conversion; it exists as the substrate for ops XLA fuses poorly
(packed-pixel codecs, windowed scans) and is validated to the same +/-1 LSB
contract (tests/test_pallas.py; perf: benchmarks/pallas_bench.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import YUVClamping, YUVSubspace
from . import colorspace_ref as ref

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _vert_x2(v):
    """Vertical 2x interleaved upsample (Mosaic-lowerable)."""
    return jnp.stack([v, v], axis=1).reshape(v.shape[0] * 2, v.shape[1])


def _u8f(x):
    return x.astype(jnp.int32).astype(jnp.float32)


def _f8u(x, lo=0.0, hi=255.0):
    return jnp.clip(jnp.floor(x), lo, hi).astype(jnp.int32).astype(jnp.uint8)


def _pick_tile(h, multiple: int = 8):
    """Largest row-tile that divides h and is a multiple of `multiple`
    (Mosaic requires block rows % 8 == 0 unless the block spans the array).
    Returns 0 if none exists."""
    for cand in (64, 48, 40, 32, 24, 16, 8):
        if cand % multiple == 0 and h % cand == 0:
            return cand
    return 0


# ---------------------------------------------------------------------------
# YUV420 -> RGB
# ---------------------------------------------------------------------------

def _yuv420_rgb_kernel(y_ref, u_ref, v_ref, r_ref, g_ref, b_ref,
                       *, cc, clamped):
    yf = _u8f(y_ref[...])
    # chroma arrives horizontally pre-doubled (XLA side); vertical 2x here
    uf = _vert_x2(_u8f(u_ref[...]))
    vf = _vert_x2(_u8f(v_ref[...]))
    if clamped:
        yy = (jnp.clip(yf, 16.0, 235.0) - 16.0) * np.float32(255.0 / 219.0)
        uu = (jnp.clip(uf, 16.0, 240.0) - 16.0) * np.float32(255.0 / 224.0) \
            - 128.0
        vv = (jnp.clip(vf, 16.0, 240.0) - 16.0) * np.float32(255.0 / 224.0) \
            - 128.0
    else:
        yy = yf
        uu = uf - 128.0
        vv = vf - 128.0
    r_ref[...] = _f8u(yy + np.float32(cc[0, 1]) * vv)
    g_ref[...] = _f8u(yy + np.float32(cc[1, 0]) * uu
                      + np.float32(cc[1, 1]) * vv)
    b_ref[...] = _f8u(yy + np.float32(cc[2, 0]) * uu)


def yuv420_to_rgb_supported(h: int, w: int) -> bool:
    return (HAVE_PALLAS and h % 8 == 0 and w % 128 == 0
            and h >= 32 and w >= 256)


def _yuv_rgb_full_kernel(y_ref, u_ref, v_ref, r_ref, g_ref, b_ref,
                         *, cc, clamped):
    """Matrix-only variant: chroma arrives fully upsampled."""
    yf = _u8f(y_ref[...])
    uf = _u8f(u_ref[...])
    vf = _u8f(v_ref[...])
    if clamped:
        yy = (jnp.clip(yf, 16.0, 235.0) - 16.0) * np.float32(255.0 / 219.0)
        uu = (jnp.clip(uf, 16.0, 240.0) - 16.0) * np.float32(255.0 / 224.0) \
            - 128.0
        vv = (jnp.clip(vf, 16.0, 240.0) - 16.0) * np.float32(255.0 / 224.0) \
            - 128.0
    else:
        yy, uu, vv = yf, uf - 128.0, vf - 128.0
    r_ref[...] = _f8u(yy + np.float32(cc[0, 1]) * vv)
    g_ref[...] = _f8u(yy + np.float32(cc[1, 0]) * uu
                      + np.float32(cc[1, 1]) * vv)
    b_ref[...] = _f8u(yy + np.float32(cc[2, 0]) * uu)


@functools.partial(jax.jit, static_argnames=("subspace", "clamping"))
def yuv420_to_rgb(y, u, v, subspace: int = YUVSubspace.YCBCR,
                  clamping: int = YUVClamping.CLAMPED):
    """Fused YUV420P -> (R, G, B) u8 planes. Needs H%8==0, W%128==0.

    When H admits a 16-multiple row tile (e.g. 2160, 1088), the vertical
    chroma upsample fuses into the kernel; otherwise (1080) chroma is
    pre-upsampled in XLA and the kernel does the matrix pass."""
    h, w = y.shape
    cc = ref.yuv2rgb_coeffs(subspace).astype(np.float32)
    clamped = clamping == YUVClamping.CLAMPED
    u2 = jnp.repeat(u, 2, axis=1)  # horizontal double in XLA (lane
    v2 = jnp.repeat(v, 2, axis=1)  # interleave is not Mosaic-lowerable)
    tile_h = _pick_tile(h, multiple=16)
    if tile_h:
        kernel = functools.partial(_yuv420_rgb_kernel, cc=cc,
                                   clamped=clamped)
        in_specs = [
            pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h // 2, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h // 2, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = (y, u2, v2)
    else:
        tile_h = _pick_tile(h, multiple=8) or h
        kernel = functools.partial(_yuv_rgb_full_kernel, cc=cc,
                                   clamped=clamped)
        in_specs = [pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)] * 3
        args = (y, jnp.repeat(u2, 2, axis=0), jnp.repeat(v2, 2, axis=0))
    r, g, b = pl.pallas_call(
        kernel,
        grid=(h // tile_h,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.uint8)] * 3,
    )(*args)
    return r, g, b


# ---------------------------------------------------------------------------
# RGB -> YUV (full-res matrix in-kernel; exact integer chroma_down outside)
# ---------------------------------------------------------------------------

def _rgb_yuv_kernel(r_ref, g_ref, b_ref, y_ref, u_ref, v_ref,
                    *, m, clamped):
    rf = _u8f(r_ref[...])
    gf = _u8f(g_ref[...])
    bf = _u8f(b_ref[...])
    cfy = np.float32(219.0 / 255.0) if clamped else np.float32(1.0)
    cfuv = np.float32(224.0 / 255.0) if clamped else np.float32(1.0)
    yoff = np.float32(16.0) if clamped else np.float32(0.0)
    yy = (np.float32(m[0, 0]) * rf + np.float32(m[0, 1]) * gf
          + np.float32(m[0, 2]) * bf) * cfy + yoff
    uu = (np.float32(m[1, 0]) * rf + np.float32(m[1, 1]) * gf
          + np.float32(m[1, 2]) * bf) * cfuv + 128.0
    vv = (np.float32(m[2, 0]) * rf + np.float32(m[2, 1]) * gf
          + np.float32(m[2, 2]) * bf) * cfuv + 128.0
    if clamped:
        ymin, ymax, uvmin, uvmax = 16.0, 235.0, 16.0, 240.0
    else:
        ymin, ymax, uvmin, uvmax = 0.0, 255.0, 0.0, 255.0
    y_ref[...] = _f8u(yy, ymin, ymax)
    u_ref[...] = _f8u(uu, uvmin, uvmax)
    v_ref[...] = _f8u(vv, uvmin, uvmax)


@functools.partial(jax.jit, static_argnames=("subspace", "clamping"))
def rgb_to_yuv420(r, g, b, subspace: int = YUVSubspace.YCBCR,
                  clamping: int = YUVClamping.CLAMPED):
    """Fused RGB -> YUV420P u8 planes (matrix in pallas, exact 2x2 integer
    box subsample at the boundary, matching chroma_down bit-for-bit)."""
    from .colorspace import chroma_down
    h, w = r.shape
    m = ref.rgb2yuv_coeffs(subspace).astype(np.float32)
    clamped = clamping == YUVClamping.CLAMPED
    tile_h = _pick_tile(h, multiple=8) or h
    kernel = functools.partial(_rgb_yuv_kernel, m=m, clamped=clamped)
    y, u, v = pl.pallas_call(
        kernel,
        grid=(h // tile_h,),
        in_specs=[pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.uint8)] * 3,
    )(r, g, b)
    return y, chroma_down(u, 2, 2), chroma_down(v, 2, 2)
