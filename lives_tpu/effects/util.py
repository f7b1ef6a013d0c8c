"""Shared helpers for builtin effects: normalized-float RGB views."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import Palette
from ..layer import Layer

RGB_PALS = (Palette.RGB24, Palette.BGR24, Palette.RGBA32, Palette.BGRA32,
            Palette.ARGB32)


def to_f01(layer: Layer) -> jnp.ndarray:
    """Canonical (C,H,W) float32 view in [0,1] of an RGB-family layer."""
    arr = layer.planes[0]
    if jnp.issubdtype(arr.dtype, jnp.floating):
        return arr.astype(jnp.float32)
    # u8 -> i32 -> f32: Mosaic (pallas) has no direct u8->f32 cast, and XLA
    # folds the intermediate step away
    return arr.astype(jnp.int32).astype(jnp.float32) * np.float32(1.0 / 255.0)


def from_f01(arr: jnp.ndarray, like: Layer) -> Layer:
    """Back to the layer's storage dtype (round-half-up for uint8).

    Float layers store in the layer's own float dtype — the chain compiler
    uses bf16 comps between effects (math still runs f32 via to_f01), which
    halves inter-stage HBM traffic."""
    ref = like.planes[0]
    if jnp.issubdtype(ref.dtype, jnp.floating):
        return like.replace(planes=(arr.astype(ref.dtype),))
    out = jnp.clip(jnp.floor(arr * 255.0 + 0.5), 0, 255).astype(
        jnp.int32).astype(jnp.uint8)
    return like.replace(planes=(out,))


def split_alpha(arr):
    """(C,H,W) -> (rgb (3,H,W), alpha (H,W) or None)."""
    if arr.shape[0] == 4:
        return arr[:3], arr[3]
    return arr, None


def join_alpha(rgb, alpha):
    if alpha is None:
        return rgb
    return jnp.concatenate([rgb, alpha[None]], 0)


def luma(rgb_f01):
    """BT.601 luma of a (3,H,W) [0,1] array."""
    return (0.299 * rgb_f01[0] + 0.587 * rgb_f01[1] + 0.114 * rgb_f01[2])


def lazy_grid(h: int, w: int, centered: bool = False):
    """(x, y) coordinate grids of shape (h, w) built from broadcasted_iota.

    ALWAYS use this (not linspace/arange + broadcast) for full-resolution
    grids inside traced code: a materialised grid becomes a trace-time
    constant that XLA constant-folds — at 4K that is a 33 MB literal and
    minutes of compile time per effect.

    Integer iota + cast (not float iota): Mosaic's tpu.iota only supports
    integer results, and XLA folds the cast — so the same effect body
    traces both inside pallas kernels and in plain jit.
    """
    import jax
    x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    if centered:
        # -1..1 range, aspect preserved on x
        y = y * np.float32(2.0 / max(h - 1, 1)) - 1.0
        x = x * np.float32(2.0 / max(w - 1, 1)) - 1.0
    else:
        x = x * np.float32(1.0 / max(w - 1, 1))
        y = y * np.float32(1.0 / max(h - 1, 1))
    return x, y


def ctx_grid(ctx, h: int, w: int, centered: bool = False):
    """Frame-coordinate grids for the current (sub)tile.

    Like `lazy_grid`, but honours tile execution (the fused pallas sweep,
    graph/pallas_composite.py): when ctx carries a tile origin (ctx.y0,
    ctx.x0) and full-frame dims (ctx.height, ctx.width), the returned grids
    are the FULL-FRAME normalized coordinates of this tile's pixels —
    clamped to the frame (halo pixels replicate the edge, matching the
    XLA path's edge padding). For whole-frame execution (y0 == x0 == 0,
    ctx dims == shape) this is identical to lazy_grid(h, w, centered).

    Coordinate-dependent effects (vignette, wipes, iris) MUST use this so
    they are correct under both full-frame jit and tiled pallas execution.
    """
    import jax
    H = int(getattr(ctx, "height", 0) or h)
    W = int(getattr(ctx, "width", 0) or w)
    y0 = getattr(ctx, "y0", 0)
    x0 = getattr(ctx, "x0", 0)
    y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + y0
    x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + x0
    y = jnp.clip(y, 0, H - 1).astype(jnp.float32)
    x = jnp.clip(x, 0, W - 1).astype(jnp.float32)
    if centered:
        y = y * np.float32(2.0 / max(H - 1, 1)) - 1.0
        x = x * np.float32(2.0 / max(W - 1, 1)) - 1.0
    else:
        x = x * np.float32(1.0 / max(W - 1, 1))
        y = y * np.float32(1.0 / max(H - 1, 1))
    return x, y
