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


# -- RFX-script / missing-family geometry (round 2) --------------------------
# Successors of RFXscripts/{rotate,wave,swirl,spread,shift_*}.script,
# weed-plugins/{slide_over.c, tvpic.c, bump2d.c} and the emboss/charcoal
# ImageMagick ops the scripts shell out to.

def _rotate(a, p, c):
    """rotate.script: arbitrary-angle rotation (degrees), edge-clamped."""
    h, w = a.shape[-2:]
    th = p["degrees"] * np.float32(np.pi / 180.0)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    y = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    x = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cs, sn = jnp.cos(th), jnp.sin(th)
    yy = cy + y * cs - x * sn
    xx = cx + y * sn + x * cs
    return _warp_sample(a, yy, xx)


_chan_filter("rotate", _rotate,
             params=(Param("degrees", "num", 0.0, -360.0, 360.0),),
             desc="arbitrary-angle rotation")


def _wave(a, p, c):
    """wave.script: sinusoidal row displacement."""
    h, w = a.shape[-2:]
    amp = p["amplitude"] * h * 0.1
    wl = jnp.maximum(p["wavelength"], 0.01) * w
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    ph = getattr(c, "tc", 0.0) * p["speed"] * np.float32(2 * np.pi)
    yy = y + amp * jnp.sin(x * np.float32(2 * np.pi) / wl + ph)
    xx = jnp.broadcast_to(x, (h, w))
    return _warp_sample(a, yy, xx)


_chan_filter("wave", _wave,
             params=(Param("amplitude", "num", 0.3, 0.0, 1.0),
                     Param("wavelength", "num", 0.25, 0.01, 1.0),
                     Param("speed", "num", 1.0, 0.0, 10.0)),
             desc="sinusoidal wave displacement")


def _swirl(a, p, c):
    """swirl.script: angular twist growing toward the centre."""
    h, w = a.shape[-2:]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    y = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    x = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    r = jnp.sqrt(y * y + x * x)
    rmax = np.float32(np.hypot(cy, cx))
    th = p["degrees"] * np.float32(np.pi / 180.0) \
        * jnp.maximum(1.0 - r / rmax, 0.0) ** 2
    cs, sn = jnp.cos(th), jnp.sin(th)
    yy = cy + y * cs - x * sn
    xx = cx + y * sn + x * cs
    return _warp_sample(a, yy, xx)


_chan_filter("swirl", _swirl,
             params=(Param("degrees", "num", 90.0, -720.0, 720.0),),
             desc="centre swirl/twist")


def _spread(a, p, c):
    """spread.script: random local pixel displacement (hash-noise based,
    deterministic per frame)."""
    h, w = a.shape[-2:]
    amt = p["amount"] * 8.0
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    seed = jnp.asarray(getattr(c, "frame", 0), jnp.float32)
    # cheap 2D hash noise in [-1,1)
    def hash2(u, v, k):
        s = jnp.sin(u * 12.9898 + v * 78.233 + k * 0.317 + seed) * 43758.5453
        return (s - jnp.floor(s)) * 2.0 - 1.0
    yy = y + amt * hash2(x, y, 1.0)
    xx = x + amt * hash2(x, y, 2.0)
    return _warp_sample(a, yy, xx)


_chan_filter("spread", _spread,
             params=(Param("amount", "num", 0.3, 0.0, 1.0),),
             desc="random pixel spread")


def _shift(a, p, c):
    """shift_horizontal/vertical.script: wrap-around roll."""
    h, w = a.shape[-2:]
    dy = jnp.round(p["dy"] * h).astype(jnp.int32)
    dx = jnp.round(p["dx"] * w).astype(jnp.int32)
    out = jnp.roll(a, dy, axis=-2)
    return jnp.roll(out, dx, axis=-1)


_chan_filter("shift", _shift,
             params=(Param("dx", "num", 0.0, -1.0, 1.0),
                     Param("dy", "num", 0.0, -1.0, 1.0)),
             desc="wrap-around shift")


def _bump2d(a, p, c):
    """bump2d.c: bump-map lighting — luma gradient dotted with a light
    direction, modulating the image."""
    from ..util import luma
    g = luma(a[:3])
    gy = jnp.gradient(g, axis=0)
    gx = jnp.gradient(g, axis=1)
    th = p["light_angle"] * np.float32(2 * np.pi)
    lx, ly = jnp.cos(th), jnp.sin(th)
    shade = 0.5 + p["depth"] * 4.0 * (gx * lx + gy * ly)
    shade = jnp.clip(shade, 0.0, 1.5)
    return a * shade[None]


_chan_filter("bump2d", _bump2d,
             params=(Param("light_angle", "num", 0.125, 0.0, 1.0),
                     Param("depth", "num", 0.5, 0.0, 1.0)),
             desc="bump-map relief lighting (bump2d.c)")


def _tvpic(a, p, c):
    """tvpic.c: CRT TV look — scanlines, RGB phosphor mask, slight
    barrel vignette."""
    h, w = a.shape[-2:]
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    scan = 1.0 - p["scanlines"] * 0.5 * (1.0 + jnp.sin(
        y * np.float32(np.pi)))
    # phosphor triads: attenuate channels by column phase
    phase = (x.astype(jnp.int32) % 3)
    mask = jnp.stack([(phase == k).astype(jnp.float32) for k in range(3)], 0)
    ph = 1.0 - p["mask"] * (1.0 - (mask * 3.0).clip(0.0, 1.0))
    rgb = a[:3] * scan[None] * (ph * (1.0 / (1.0 + p["mask"] * 0.0)))
    nx = (x / (w - 1) - 0.5) * 2.0
    ny = (y / (h - 1) - 0.5) * 2.0
    vig = 1.0 - p["corner"] * (nx * nx + ny * ny) * 0.5
    out = rgb * jnp.clip(vig, 0.0, 1.0)[None]
    if a.shape[0] == 4:
        out = jnp.concatenate([out, a[3:4]], 0)
    return out


_chan_filter("tvpic", _tvpic,
             params=(Param("scanlines", "num", 0.4, 0.0, 1.0),
                     Param("mask", "num", 0.3, 0.0, 1.0),
                     Param("corner", "num", 0.3, 0.0, 1.0)),
             desc="CRT TV picture (tvpic.c)")


def _emboss(a, p, c):
    """emboss.script (ImageMagick -emboss): diagonal gradient relief."""
    from ..util import luma
    g = luma(a[:3])
    d = jnp.pad(g, ((1, 0), (1, 0)), mode="edge")[:-1, :-1] - g
    out = jnp.clip(0.5 + d * p["strength"] * 8.0, 0.0, 1.0)
    out3 = jnp.stack([out, out, out], 0)
    mixed = a[:3] + (out3 - a[:3]) * p["amount"]
    if a.shape[0] == 4:
        mixed = jnp.concatenate([mixed, a[3:4]], 0)
    return mixed


_chan_filter("emboss", _emboss,
             params=(Param("strength", "num", 0.5, 0.0, 2.0),
                     Param("amount", "num", 1.0, 0.0, 1.0)),
             desc="relief emboss")


def _charcoal(a, p, c):
    """charcoal.script (ImageMagick -charcoal): inverted edge sketch."""
    from ..util import luma
    g = luma(a[:3])
    gy = jnp.gradient(g, axis=0)
    gx = jnp.gradient(g, axis=1)
    mag = jnp.sqrt(gx * gx + gy * gy) * p["strength"] * 12.0
    sketch = jnp.clip(1.0 - mag, 0.0, 1.0)
    out3 = jnp.stack([sketch] * 3, 0)
    if a.shape[0] == 4:
        out3 = jnp.concatenate([out3, a[3:4]], 0)
    return out3


_chan_filter("charcoal", _charcoal,
             params=(Param("strength", "num", 0.5, 0.0, 2.0),),
             desc="charcoal sketch")


def _warptv(a, p, c):
    """warpTV.c: animated rubber-sheet distortion — the whole frame
    wobbles on a slow 2-D sine displacement field driven by per-frame
    phase (the reference precomputes a sin table and advances tval)."""
    h, w = a.shape[-2:]
    t = c.tc * (0.5 + p["speed"] * 4.0)
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    amp = p["amplitude"] * 0.05 * np.float32(min(h, w))
    nx = x * np.float32(2.0 * np.pi / 320.0)
    ny = y * np.float32(2.0 * np.pi / 240.0)
    dx = amp * (jnp.sin(nx * 0.9 + t) * jnp.cos(ny * 0.7 - t * 0.83)
                + 0.5 * jnp.sin(ny * 1.3 + t * 1.19))
    dy = amp * (jnp.cos(nx * 1.1 - t * 0.79) * jnp.sin(ny * 0.8 + t)
                + 0.5 * jnp.cos(nx * 1.7 - t * 1.07))
    yy = jnp.clip(y + dy, 0, h - 1)
    xx = jnp.clip(x + dx, 0, w - 1)
    return _warp_sample(a, jnp.broadcast_to(yy, (h, w)),
                        jnp.broadcast_to(xx, (h, w)))


_chan_filter("warptv", _warptv,
             params=(Param("amplitude", "num", 0.5, 0.0, 1.0),
                     Param("speed", "num", 0.5, 0.0, 1.0)),
             desc="rubber-sheet wobble (warpTV.c)")


def _targeted_zoom(a, p, c):
    """targeted_zoom.script: zoom about an arbitrary (x, y) point — the
    framedraw-driven zoom (click the preview to set the target)."""
    h, w = a.shape[-2:]
    z = jnp.maximum(p["zoom"], 1.0)
    cy = p["y"] * (h - 1)
    cx = p["x"] * (w - 1)
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    yy = jnp.clip(cy + (y - cy) / z, 0, h - 1)
    xx = jnp.clip(cx + (x - cx) / z, 0, w - 1)
    return _warp_sample(a, jnp.broadcast_to(yy, (h, w)),
                        jnp.broadcast_to(xx, (h, w)))


_chan_filter("targeted_zoom", _targeted_zoom,
             params=(Param("zoom", "num", 2.0, 1.0, 16.0),
                     Param("x", "num", 0.5, 0.0, 1.0),
                     Param("y", "num", 0.5, 0.0, 1.0)),
             desc="zoom about a point (targeted_zoom.script)")


def _revtv(a, p, c):
    """revTV (scripts/revTV.script, the EffecTV Rutt-Etra look): the frame
    becomes rows of waveforms — each scan band draws its centre row's luma
    as a vertical displacement trace. Gather-once per band, pointwise
    compare per pixel (no scatter)."""
    from ..util import luma as _luma
    h, w = a.shape[-2:]
    lum = _luma(a[:3])
    band_px = max(int(p["linespace"]) * 2, 2)  # static: rows per band x2
    y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    band_base = jnp.clip((y // band_px) * band_px + band_px // 2,
                         0, h - 1)
    l_band = jnp.take_along_axis(lum, band_base, axis=0)  # luma at centre
    trace_y = band_base.astype(jnp.float32) \
        - l_band * p["gain"] * np.float32(band_px)
    lit = (jnp.abs(y.astype(jnp.float32) - trace_y) <= 1.0) \
        .astype(jnp.float32)
    v = lit * (0.3 + 0.7 * l_band)
    out = jnp.stack([v, v, v])
    if a.shape[0] == 4:  # preserve the input's alpha channel count
        out = jnp.concatenate([out, a[3:4]], 0)
    return out


_chan_filter("revtv", _revtv,
             params=(Param("linespace", "int", 4, 2, 16),
                     Param("gain", "num", 0.9, 0.0, 2.0)),
             desc="waveform scan rows (revTV.script, Rutt-Etra)")
