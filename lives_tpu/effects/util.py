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
    return arr.astype(jnp.float32) * np.float32(1.0 / 255.0)


def from_f01(arr: jnp.ndarray, like: Layer) -> Layer:
    """Back to the layer's storage dtype (round-half-up for uint8)."""
    ref = like.planes[0]
    if jnp.issubdtype(ref.dtype, jnp.floating):
        return like.replace(planes=(arr,))
    out = jnp.clip(jnp.floor(arr * 255.0 + 0.5), 0, 255).astype(jnp.uint8)
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
