"""Keying / matte filters (reference `colorkey.c`, `fg_bg_removal.c`,
chroma-key usage in the VJ overlay path)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...constants import Palette
from ..host import (ChannelTemplate, FILTER_IS_TRANSITION, Filter, Param,
                    register_filter)
from ..util import from_f01, join_alpha, luma, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)


def _chroma_dist(rgb, key_r, key_g, key_b):
    """Chromaticity distance to the key colour (brightness-invariant-ish)."""
    eps = 1e-4
    s = rgb[0] + rgb[1] + rgb[2] + eps
    r, g = rgb[0] / s, rgb[1] / s
    ks = key_r + key_g + key_b + eps
    kr, kg = key_r / ks, key_g / ks
    return jnp.sqrt((r - kr) ** 2 + (g - kg) ** 2)


def _chroma_key_process(ins, p, ctx):
    """fg keyed over bg where fg matches key colour."""
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, _ = split_alpha(a)
    brgb, bal = split_alpha(b)
    d = _chroma_dist(argb, p["red"], p["green"], p["blue"])
    # alpha: 0 where close to key colour, ramp over softness
    alpha = jnp.clip((d - p["tolerance"]) / (p["softness"] + 1e-4), 0.0, 1.0)
    out = argb * alpha[None] + brgb * (1.0 - alpha[None])
    return from_f01(join_alpha(out, bal), bg)


register_filter(Filter(
    name="chroma_key", process=_chroma_key_process,
    in_channels=(ChannelTemplate("fg", _RGBX), ChannelTemplate("bg", _RGBX)),
    params=(Param("red", "num", 0.0, 0.0, 1.0),
            Param("green", "num", 1.0, 0.0, 1.0),
            Param("blue", "num", 0.0, 0.0, 1.0),
            Param("tolerance", "num", 0.15, 0.0, 1.0),
            Param("softness", "num", 0.1, 0.0, 1.0)),
    flags=FILTER_IS_TRANSITION,
    description="green-screen style chroma key of fg over bg"))


def _luma_key_process(ins, p, ctx):
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, _ = split_alpha(a)
    brgb, bal = split_alpha(b)
    g = luma(argb)
    alpha = jnp.clip((g - p["threshold"]) / (p["softness"] + 1e-4), 0.0, 1.0)
    if_inv = p.get("invert", 0.0)
    alpha = alpha * (1.0 - if_inv) + (1.0 - alpha) * if_inv
    out = argb * alpha[None] + brgb * (1.0 - alpha[None])
    return from_f01(join_alpha(out, bal), bg)


register_filter(Filter(
    name="luma_key", process=_luma_key_process,
    in_channels=(ChannelTemplate("fg", _RGBX), ChannelTemplate("bg", _RGBX)),
    params=(Param("threshold", "num", 0.3, 0.0, 1.0),
            Param("softness", "num", 0.1, 0.0, 1.0),
            Param("invert", "num", 0.0, 0.0, 1.0)),
    flags=FILTER_IS_TRANSITION,
    description="key fg over bg by fg luma"))


def _alpha_over_process(ins, p, ctx):
    """Composite fg over bg using fg's own alpha channel."""
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, aal = split_alpha(a)
    brgb, bal = split_alpha(b)
    alpha = aal if aal is not None else jnp.ones(argb.shape[-2:], jnp.float32)
    alpha = alpha * p["opacity"]
    out = argb * alpha[None] + brgb * (1.0 - alpha[None])
    return from_f01(join_alpha(out, bal), bg)


register_filter(Filter(
    name="alpha_over", process=_alpha_over_process,
    in_channels=(ChannelTemplate("fg", (Palette.RGBA32,)),
                 ChannelTemplate("bg", _RGBX)),
    params=(Param("opacity", "num", 1.0, 0.0, 1.0),),
    flags=FILTER_IS_TRANSITION,
    description="alpha composite fg over bg (fg alpha)"))
