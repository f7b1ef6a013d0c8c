"""Generator filters — zero-input sources (reference `plasma.c`, `noise`,
solid/gradient RFX generators; generator lifecycle effects-weed.c:7739).

Generators are pure functions of (ctx.tc, params, geometry); randomness uses
counter-based PRNG keyed by frame number so batch rendering stays
deterministic and vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import Gamma, Palette
from ...layer import Layer
from ..host import FILTER_IS_GENERATOR, Filter, Param, register_filter


def _out_layer(rgb01, alpha=None) -> Layer:
    arr = rgb01
    if alpha is not None:
        arr = jnp.concatenate([rgb01, alpha[None]], 0)
    u8 = jnp.clip(jnp.floor(arr * 255.0 + 0.5), 0, 255).astype(jnp.uint8)
    pal = Palette.RGBA32 if alpha is not None else Palette.RGB24
    return Layer(planes=(u8,), palette=int(pal), gamma=int(Gamma.SRGB))


def _mk_generator(name, fn, params=(), desc=""):
    def process(ins, p, ctx):
        return fn(p, ctx)
    return register_filter(Filter(
        name=name, process=process, in_channels=(),
        params=tuple(params), flags=FILTER_IS_GENERATOR, description=desc))


def _grid(ctx):
    # broadcasted_iota keeps grids lazy: no giant trace-time constants for
    # XLA to fold (a materialised 4K f32 grid is an 8.3M-element literal
    # that inflates compile time by minutes)
    h, w = ctx.height, ctx.width
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) \
        * np.float32(1.0 / max(w - 1, 1))
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) \
        * np.float32(1.0 / max(h - 1, 1))
    return x, y


def _solid(p, ctx):
    h, w = ctx.height, ctx.width
    rgb = jnp.stack([jnp.full((h, w), p["red"], jnp.float32),
                     jnp.full((h, w), p["green"], jnp.float32),
                     jnp.full((h, w), p["blue"], jnp.float32)])
    return _out_layer(rgb)


_mk_generator("solid_colour", _solid,
              params=(Param("red", "num", 0.0, 0.0, 1.0),
                      Param("green", "num", 0.0, 0.0, 1.0),
                      Param("blue", "num", 0.0, 0.0, 1.0)),
              desc="constant colour frame")


def _plasma(p, ctx):
    """plasma.c-style interference of travelling sine fields."""
    x, y = _grid(ctx)
    t = ctx.tc * p["speed"] * 3.0
    s = p["scale"] * 10.0 + 1.0
    v = (jnp.sin(x * s + t)
         + jnp.sin((y * s + t) * 0.7)
         + jnp.sin((x * s + y * s + t) * 0.5)
         + jnp.sin(jnp.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) * s * 2.0 + t))
    v = v * 0.25  # -1..1
    # sin(v*pi + phi) expanded via angle addition: two transcendentals
    # instead of three with shared fan-in (deep transcendental DAGs blow up
    # Mosaic compile time superlinearly at 4K)
    s, c = jnp.sin(v * np.pi), jnp.cos(v * np.pi)
    ph = 2.0 * np.pi / 3.0
    r = 0.5 + 0.5 * s
    g = 0.5 + 0.5 * (s * np.float32(np.cos(ph)) + c * np.float32(np.sin(ph)))
    b = 0.5 + 0.5 * (s * np.float32(np.cos(2 * ph)) + c * np.float32(np.sin(2 * ph)))
    return _out_layer(jnp.stack([r, g, b]))


_mk_generator("plasma", _plasma,
              params=(Param("speed", "num", 0.5, 0.0, 2.0),
                      Param("scale", "num", 0.5, 0.0, 2.0)),
              desc="classic plasma field")


def _noise(p, ctx):
    key = jax.random.fold_in(jax.random.PRNGKey(42),
                             jnp.asarray(ctx.frame, jnp.int32))
    h, w = ctx.height, ctx.width
    if_mono = p["mono"]
    n = jax.random.uniform(key, (3, h, w))
    mono = jnp.broadcast_to(n[0:1], (3, h, w))
    return _out_layer(n * (1.0 - if_mono) + mono * if_mono)


_mk_generator("noise", _noise,
              params=(Param("mono", "num", 1.0, 0.0, 1.0),),
              desc="white noise (static per frame number)")


def _gradient(p, ctx):
    x, y = _grid(ctx)
    th = p["angle"] * np.float32(2.0 * np.pi)
    g = jnp.clip(x * jnp.cos(th) + y * jnp.sin(th), 0.0, 1.0)
    c0 = jnp.stack([p["red0"], p["green0"], p["blue0"]])[:, None, None]
    c1 = jnp.stack([p["red1"], p["green1"], p["blue1"]])[:, None, None]
    return _out_layer(c0 + (c1 - c0) * g[None])


_mk_generator("gradient", _gradient,
              params=(Param("angle", "num", 0.0, 0.0, 1.0),
                      Param("red0", "num", 0.0, 0.0, 1.0),
                      Param("green0", "num", 0.0, 0.0, 1.0),
                      Param("blue0", "num", 0.0, 0.0, 1.0),
                      Param("red1", "num", 1.0, 0.0, 1.0),
                      Param("green1", "num", 1.0, 0.0, 1.0),
                      Param("blue1", "num", 1.0, 0.0, 1.0)),
              desc="linear two-colour gradient")


def _checker(p, ctx):
    x, y = _grid(ctx)
    n = jnp.maximum(p["tiles"], 1.0)
    phase = ctx.tc * p["speed"]
    cx = jnp.floor(x * n + phase)
    cy = jnp.floor(y * n)
    v = jnp.mod(cx + cy, 2.0)
    return _out_layer(jnp.broadcast_to(v[None], (3,) + v.shape))


_mk_generator("checkerboard", _checker,
              params=(Param("tiles", "num", 8.0, 1.0, 64.0),
                      Param("speed", "num", 0.0, 0.0, 4.0)),
              desc="scrolling checkerboard")


def _colour_bars(p, ctx):
    """SMPTE-ish bars — also the self-test pattern."""
    h, w = ctx.height, ctx.width
    cols = np.array([[1, 1, 1], [1, 1, 0], [0, 1, 1], [0, 1, 0],
                     [1, 0, 1], [1, 0, 0], [0, 0, 1], [0, 0, 0]],
                    np.float32).T  # (3, 8)
    x, _ = _grid(ctx)
    bar = jnp.minimum(x * 8.0, 7.0)  # lazy bar index per pixel
    rgb = jnp.stack([jnp.asarray(cols[c])[
        bar.astype(jnp.int32)] for c in range(3)])
    return _out_layer(rgb)


_mk_generator("colour_bars", _colour_bars, desc="SMPTE-style colour bars")


# -- audio-reactive visualiser generators (libvis.c / projectM.cpp role) -----
# Scalar drive params (level/bass/mid/treble/beat) are wired from the audio
# analysers (audio/analysers.py audio_fft + beat_detector) through data
# connections — the reference's music-visualiser capability without gl.

def _vu_bars(p, ctx):
    """libvis-style VU meter: four frequency-band bars."""
    x, y = _grid(ctx)
    heights = jnp.stack([p["bass"], p["mid"], p["treble"], p["level"]])
    heights = jnp.clip(heights, 0.0, 1.0)
    band = jnp.clip((x * 4.0).astype(jnp.int32), 0, 3)
    h_here = heights[band]
    lit = ((1.0 - y) < h_here).astype(jnp.float32)
    # in-bar gradient green->red with height
    r = lit * (1.0 - y)
    g = lit * y
    b = lit * 0.15
    gap = ((x * 4.0) % 1.0 > 0.08).astype(jnp.float32)
    return _out_layer(jnp.stack([r, g, b], 0) * gap[None])


_mk_generator("vu_bars", _vu_bars,
              params=(Param("level", "num", 0.5, 0.0, 1.0),
                      Param("bass", "num", 0.5, 0.0, 1.0),
                      Param("mid", "num", 0.5, 0.0, 1.0),
                      Param("treble", "num", 0.5, 0.0, 1.0)),
              desc="4-band VU bars (libvis.c role; drive via pconx)")


def _spectrascope(p, ctx):
    """Radial audio-reactive pattern: rings pulse with bass, spokes spin
    with tc, hue with treble — the projectM-preset capability class."""
    x, y = _grid(ctx)
    cx, cy = x - 0.5, (y - 0.5) * (ctx.height / max(ctx.width, 1))
    r = jnp.sqrt(cx * cx + cy * cy) * 2.0
    th = jnp.arctan2(cy, cx)
    t = ctx.tc
    rings = jnp.sin(r * (8.0 + p["bass"] * 24.0) - t * 4.0)
    spokes = jnp.sin(th * jnp.floor(3.0 + p["mid"] * 9.0) + t * 2.0)
    v = jnp.clip(rings * 0.5 + spokes * 0.5 + p["level"], -1.0, 1.0)
    v = (v + 1.0) * 0.5 * jnp.exp(-r * (1.5 - p["level"]))
    hue = p["treble"] * 4.0 + t * 0.3
    rch = v * (0.5 + 0.5 * jnp.sin(hue))
    gch = v * (0.5 + 0.5 * jnp.sin(hue + 2.094))
    bch = v * (0.5 + 0.5 * jnp.sin(hue + 4.189))
    return _out_layer(jnp.stack([rch, gch, bch], 0))


_mk_generator("spectrascope", _spectrascope,
              params=(Param("level", "num", 0.5, 0.0, 1.0),
                      Param("bass", "num", 0.3, 0.0, 1.0),
                      Param("mid", "num", 0.3, 0.0, 1.0),
                      Param("treble", "num", 0.3, 0.0, 1.0)),
              desc="radial audio-reactive visualiser (projectM role)")


def _beat_rings_init(w, h, pal):
    # ages of up to 6 live rings (<0 = free slot), next-slot cursor
    return (jnp.full((6,), -1.0, jnp.float32), jnp.int32(0))


def _beat_rings(ins, p, ctx, state):
    """Beat-triggered expanding rings (stateful): a beat pulse >0.5 spawns
    a ring; rings expand and fade. Drive `beat` from beat_detector."""
    ages, cur = state
    dt = 1.0 / max(ctx.fps, 1.0)
    ages = jnp.where(ages >= 0.0, ages + dt, ages)
    ages = jnp.where(ages > 2.0, -1.0, ages)       # expire after 2 s
    spawn = p["beat"] > 0.5
    ages = jnp.where(spawn, ages.at[cur].set(0.0), ages)
    cur = jnp.where(spawn, (cur + 1) % 6, cur)
    x, y = _grid(ctx)
    cx, cy = x - 0.5, (y - 0.5) * (ctx.height / max(ctx.width, 1))
    r = jnp.sqrt(cx * cx + cy * cy) * 2.0
    v = jnp.zeros_like(r)
    for k in range(6):
        a = ages[k]
        live = (a >= 0.0).astype(jnp.float32)
        radius = a * p["speed"]
        ring = jnp.exp(-((r - radius) ** 2) * 400.0) * jnp.exp(-a * 2.0)
        v = v + ring * live
    v = jnp.clip(v, 0.0, 1.0)
    rgb = jnp.stack([v * p["red"], v * p["green"], v * p["blue"]], 0)
    return _out_layer(rgb), (ages, cur)


from ..host import FILTER_STATEFUL as _FS

register_filter(Filter(
    name="beat_rings", process=_beat_rings, in_channels=(),
    params=(Param("beat", "num", 0.0, 0.0, 1.0),
            Param("speed", "num", 1.0, 0.1, 4.0),
            Param("red", "num", 0.3, 0.0, 1.0),
            Param("green", "num", 0.8, 0.0, 1.0),
            Param("blue", "num", 1.0, 0.0, 1.0)),
    flags=FILTER_IS_GENERATOR | _FS, init_state=_beat_rings_init,
    description="beat-triggered expanding rings (audio-reactive)"))
