"""Blur / sharpen filters.

TPU-first: separable convolutions expressed as banded dense matrices applied
via MXU matmuls (`K_h @ img @ K_w^T`) — the same machinery as resize
(ops/resize.py), so a blur costs two matmuls regardless of radius. Replaces
per-pixel loops of the reference's blur RFX scripts and EffecTV blurzoom.

Radii are static (jit retraces per radius bucket, like nodemodel plan
templates); `amount`-style mix params stay traced.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import Palette
from ..host import ChannelTemplate, Filter, Param, register_filter
from ..util import from_f01, join_alpha, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)
_ONE_IN = (ChannelTemplate("in", _RGBX),)


@lru_cache(maxsize=128)
def _band_matrix(n: int, kernel: tuple[float, ...]) -> np.ndarray:
    """(n,n) banded convolution matrix with edge renormalisation."""
    k = np.asarray(kernel, np.float64)
    r = len(k) // 2
    m = np.zeros((n, n), np.float64)
    for o in range(n):
        lo = max(0, o - r)
        hi = min(n, o + r + 1)
        seg = k[lo - (o - r): hi - (o - r)]
        m[o, lo:hi] = seg / seg.sum()
    return m.astype(np.float32)


def _box_kernel(radius: int) -> tuple[float, ...]:
    return tuple([1.0] * (2 * radius + 1))


@lru_cache(maxsize=64)
def _gauss_kernel(radius: int) -> tuple[float, ...]:
    sigma = max(radius / 2.0, 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return tuple(k / k.sum())


def sep_conv(planes, kernel: tuple[float, ...]):
    """Separable 2D convolution of (...,H,W).

    Small radii (the realtime norm) run as shifted adds over edge-padded
    planes — pure bandwidth, fused by XLA into one pass per axis; a dense
    NxN band matmul would burn H/k times the FLOPs for a mostly-zero
    matrix. Large radii fall back to banded MXU matmuls (bf16 in, f32
    accumulate) where the systolic array wins."""
    if len(kernel) <= 33:
        return _sep_conv_shifts(planes, kernel)
    h, w = planes.shape[-2], planes.shape[-1]
    kh = jnp.asarray(_band_matrix(h, kernel), jnp.bfloat16)
    kw = jnp.asarray(_band_matrix(w, kernel), jnp.bfloat16)
    p16 = planes.astype(jnp.bfloat16)
    out = jnp.einsum("oh,...hw->...ow", kh, p16,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("...ow,xw->...ox", out.astype(jnp.bfloat16), kw,
                      preferred_element_type=jnp.float32)


def _sep_conv_shifts(planes, kernel: tuple[float, ...]):
    k = np.asarray(kernel, np.float32)
    k = k / k.sum()
    r = len(k) // 2
    nd = planes.ndim
    x = planes.astype(jnp.float32)
    pad = [(0, 0)] * (nd - 2) + [(r, r), (0, 0)]
    xp = jnp.pad(x, pad, mode="edge")
    h = x.shape[-2]
    x = sum(np.float32(k[i]) * jax.lax.slice_in_dim(xp, i, i + h, axis=-2)
            for i in range(len(k)))
    pad = [(0, 0)] * (nd - 2) + [(0, 0), (r, r)]
    xp = jnp.pad(x, pad, mode="edge")
    w = x.shape[-1]
    return sum(np.float32(k[i]) * jax.lax.slice_in_dim(xp, i, i + w, axis=-1)
               for i in range(len(k)))


def _mk_blur(name, kernel_fn, desc):
    def process(ins, p, ctx):
        lay = ins[0]
        a = to_f01(lay)
        rgb, al = split_alpha(a)
        radius = max(1, int(p["radius"]))
        blurred = sep_conv(rgb, kernel_fn(radius))
        out = rgb + (blurred - rgb) * p["amount"]
        return from_f01(join_alpha(jnp.clip(out, 0.0, 1.0), al), lay)

    return register_filter(Filter(
        name=name, process=process, in_channels=_ONE_IN,
        params=(Param("radius", "int", 4, 1, 64),
                Param("amount", "num", 1.0, 0.0, 1.0)),
        description=desc))


_mk_blur("box_blur", _box_kernel, "box blur (MXU separable)")
_mk_blur("gaussian_blur", _gauss_kernel, "gaussian blur (MXU separable)")


def _unsharp_process(ins, p, ctx):
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    radius = max(1, int(p["radius"]))
    blurred = sep_conv(rgb, _gauss_kernel(radius))
    out = rgb + (rgb - blurred) * p["amount"]
    return from_f01(join_alpha(jnp.clip(out, 0.0, 1.0), al), lay)


register_filter(Filter(
    name="sharpen", process=_unsharp_process, in_channels=_ONE_IN,
    params=(Param("radius", "int", 2, 1, 16),
            Param("amount", "num", 0.8, 0.0, 4.0)),
    description="unsharp-mask sharpen"))


def _motion_blur_h(ins, p, ctx):
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    radius = max(1, int(p["radius"]))
    w = rgb.shape[-1]
    kw = jnp.asarray(_band_matrix(w, _box_kernel(radius)))
    out = jnp.einsum("...ow,xw->...ox", rgb, kw,
                     preferred_element_type=jnp.float32)
    out = rgb + (out - rgb) * p["amount"]
    return from_f01(join_alpha(jnp.clip(out, 0.0, 1.0), al), lay)


register_filter(Filter(
    name="motion_blur", process=_motion_blur_h, in_channels=_ONE_IN,
    params=(Param("radius", "int", 8, 1, 128),
            Param("amount", "num", 1.0, 0.0, 1.0)),
    description="horizontal motion blur"))
