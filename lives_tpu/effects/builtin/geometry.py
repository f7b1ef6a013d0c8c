"""Geometric filters (reference `mirrors.c`, `kaleidoscope.c`, `tvpic.c`,
rotozoom, flips). Coordinate-warp effects use bilinear sampling via
`jax.scipy.ndimage.map_coordinates`; axis flips/pixelate stay gather-free."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.ndimage import map_coordinates

from ...constants import Palette
from ..host import ChannelTemplate, Filter, Param, register_filter
from ..util import from_f01, join_alpha, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)
_ONE_IN = (ChannelTemplate("in", _RGBX),)


def _chan_filter(name, fn, params=(), desc=""):
    def process(ins, p, ctx):
        lay = ins[0]
        a = to_f01(lay)
        out = jnp.clip(fn(a, p, ctx), 0.0, 1.0)
        return from_f01(out, lay)
    return register_filter(Filter(name=name, process=process,
                                  in_channels=_ONE_IN, params=tuple(params),
                                  description=desc))


_chan_filter("flip_horizontal", lambda a, p, c: a[..., ::-1],
             desc="mirror left-right")
_chan_filter("flip_vertical", lambda a, p, c: a[..., ::-1, :],
             desc="mirror top-bottom")
_chan_filter("rotate180", lambda a, p, c: a[..., ::-1, ::-1],
             desc="rotate 180 degrees")


def _mirror(a, p, c):
    """mirrors.c: reflect one half onto the other."""
    w = a.shape[-1]
    half = a[..., : w // 2]
    return jnp.concatenate([half, half[..., ::-1]], -1) if w % 2 == 0 else a


_chan_filter("mirror", _mirror, desc="reflect left half onto right")


def _pixelate(a, p, c):
    """tvpic.c-style blockiness: box down + nearest up via resize matrices."""
    from ...ops.resize import resize_plane
    h, w = a.shape[-2:]
    n = max(2, int(p["block"]))
    small = resize_plane(a, max(1, h // n), max(1, w // n), "area")
    return resize_plane(small, h, w, "nearest")


_chan_filter("pixelate", _pixelate,
             params=(Param("block", "int", 8, 2, 64),),
             desc="mosaic pixelation")


def _warp_sample(a, yy, xx):
    """Bilinear-sample each channel of (C,H,W) at float coords (H,W)."""
    def samp(ch):
        return map_coordinates(ch, [yy, xx], order=1, mode="nearest")
    return jax.vmap(samp)(a)


def _rotozoom(a, p, c):
    h, w = a.shape[-2:]
    th = p["angle"] * np.float32(2.0 * np.pi)
    z = jnp.maximum(p["zoom"], 0.05)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    y = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    x = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cs, sn = jnp.cos(th) / z, jnp.sin(th) / z
    yy = cy + y * cs - x * sn
    xx = cx + y * sn + x * cs
    return _warp_sample(a, yy, xx)


_chan_filter("rotozoom", _rotozoom,
             params=(Param("angle", "num", 0.0, 0.0, 1.0),
                     Param("zoom", "num", 1.0, 0.05, 8.0)),
             desc="rotate + zoom about centre")


def _kaleidoscope(a, p, c):
    """kaleidoscope.c: fold the plane into N mirrored sectors."""
    h, w = a.shape[-2:]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    r = jnp.sqrt(y * y + x * x)
    theta = jnp.arctan2(y, x) + p["angle"] * np.float32(2.0 * np.pi)
    n = jnp.maximum(p["sectors"], 2.0)
    sector = np.float32(2.0 * np.pi) / n
    th = jnp.mod(theta, sector)
    th = jnp.minimum(th, sector - th) * 2.0  # mirror within sector
    yy = jnp.clip(cy + r * jnp.sin(th), 0, h - 1)
    xx = jnp.clip(cx + r * jnp.cos(th), 0, w - 1)
    return _warp_sample(a, yy, xx)


_chan_filter("kaleidoscope", _kaleidoscope,
             params=(Param("sectors", "num", 6.0, 2.0, 32.0),
                     Param("angle", "num", 0.0, 0.0, 1.0)),
             desc="N-fold kaleidoscope")


def _ripple(a, p, c):
    """rippleTV-style travelling sine displacement (stateless form)."""
    h, w = a.shape[-2:]
    t = c.tc * p["speed"] * 10.0
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    amp = p["amplitude"] * 20.0
    freq = p["frequency"] * 0.2
    yy = jnp.clip(y + amp * jnp.sin(freq * x + t), 0, h - 1)
    xx = jnp.clip(x + amp * jnp.sin(freq * y + t * 1.1), 0, w - 1)
    return _warp_sample(a, jnp.broadcast_to(yy, (h, w)),
                        jnp.broadcast_to(xx, (h, w)))


_chan_filter("ripple", _ripple,
             params=(Param("amplitude", "num", 0.3, 0.0, 1.0),
                     Param("frequency", "num", 0.5, 0.0, 1.0),
                     Param("speed", "num", 0.5, 0.0, 1.0)),
             desc="travelling sine-wave warp")


def _lens(a, p, c):
    """bump2d/fisheye-style radial lens distortion."""
    h, w = a.shape[-2:]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    x = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx) / cx
    y = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy) / cy
    r = jnp.sqrt(y * y + x * x)
    k = (p["strength"] - 0.5) * 2.0  # -1..1: pincushion..barrel
    scale = 1.0 + k * (r * r)
    yy = jnp.clip(cy + y * scale * cy, 0, h - 1)
    xx = jnp.clip(cx + x * scale * cx, 0, w - 1)
    return _warp_sample(a, jnp.broadcast_to(yy, (h, w)),
                        jnp.broadcast_to(xx, (h, w)))


_chan_filter("lens", _lens,
             params=(Param("strength", "num", 0.75, 0.0, 1.0),),
             desc="barrel/pincushion lens warp")
