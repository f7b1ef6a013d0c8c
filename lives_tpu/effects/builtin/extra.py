"""Additional effects rounding out the reference plugin families:
`gdk/scribbler.c`/`livetext.c` (text), `gdk/videowall.c`,
`gdk/mask_overlay.c`, `slide_over.c` push mode, `data_processor.c`,
`randomiser.c`."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import Gamma, Palette
from ...layer import Layer
from ..host import (ChannelTemplate, FILTER_IS_GENERATOR,
                    FILTER_IS_TRANSITION, Filter, Param, register_filter)
from ..util import from_f01, join_alpha, luma, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)
_ONE_IN = (ChannelTemplate("in", _RGBX),)
_TWO_IN = (ChannelTemplate("fg", _RGBX), ChannelTemplate("bg", _RGBX))


# -- text generator (livetext.c / scribbler.c) -------------------------------

@functools.lru_cache(maxsize=64)
def _text_mask_cached(text: str, w: int, h: int, size: int):
    from ...text import render_text_mask
    return render_text_mask(text, w, h, size=size, valign="middle")


def _livetext_process(ins, p, ctx):
    mask = _text_mask_cached(str(p["text"]), ctx.width, ctx.height,
                             max(8, int(p["size"])))
    m = jnp.asarray(mask).astype(jnp.float32) / 255.0
    colour = jnp.stack([p["red"], p["green"], p["blue"]])[:, None, None]
    rgb = m[:3] * colour * m[3:4]
    a = m[3]
    arr = jnp.concatenate([jnp.clip(rgb * 255.0 + 0.5, 0, 255)
                           .astype(jnp.uint8),
                           (a * 255.0 + 0.5).astype(jnp.uint8)[None]], 0)
    return Layer(planes=(arr,), palette=int(Palette.RGBA32),
                 gamma=int(Gamma.SRGB))


register_filter(Filter(
    name="livetext", process=_livetext_process, in_channels=(),
    params=(Param("text", "string", "lives_tpu"),
            Param("size", "int", 48, 8, 256),
            Param("red", "num", 1.0, 0.0, 1.0),
            Param("green", "num", 1.0, 0.0, 1.0),
            Param("blue", "num", 1.0, 0.0, 1.0)),
    flags=FILTER_IS_GENERATOR,
    description="text generator with alpha (livetext.c)"))


# -- videowall ---------------------------------------------------------------

def _videowall_process(ins, p, ctx):
    from ...ops.resize import resize_plane
    lay = ins[0]
    a = to_f01(lay)
    h, w = a.shape[-2:]
    n = max(1, int(p["tiles"]))
    small = resize_plane(a, max(1, h // n), max(1, w // n), "area")
    tiled = jnp.tile(small, (1, n, n))
    tiled = tiled[:, :h, :w]
    pad_h, pad_w = h - tiled.shape[-2], w - tiled.shape[-1]
    if pad_h or pad_w:
        tiled = jnp.pad(tiled, ((0, 0), (0, pad_h), (0, pad_w)),
                        mode="edge")
    return from_f01(tiled, lay)


register_filter(Filter(
    name="videowall", process=_videowall_process, in_channels=_ONE_IN,
    params=(Param("tiles", "int", 3, 1, 16),),
    description="NxN repeated tiles (gdk/videowall.c)"))


# -- mask overlay ------------------------------------------------------------

def _mask_overlay_process(ins, p, ctx):
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, aal = split_alpha(a)
    brgb, bal = split_alpha(b)
    g = luma(brgb)  # mask from bg luma (mask clip on track 1)
    m = jnp.clip((g - p["threshold"]) / (p["softness"] + 1e-4), 0.0, 1.0)
    inv = p["invert"]
    m = m * (1.0 - inv) + (1.0 - m) * inv
    out = argb * m[None]
    return from_f01(join_alpha(out, aal), fg)


register_filter(Filter(
    name="mask_overlay", process=_mask_overlay_process, in_channels=_TWO_IN,
    params=(Param("threshold", "num", 0.5, 0.0, 1.0),
            Param("softness", "num", 0.05, 0.0, 1.0),
            Param("invert", "num", 0.0, 0.0, 1.0)),
    flags=FILTER_IS_TRANSITION,
    description="mask fg by bg luma (gdk/mask_overlay.c)"))


# -- push transition (true slide: fg pushes bg out) --------------------------

def _push_process(ins, p, ctx):
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, aal = split_alpha(a)
    brgb, _ = split_alpha(b)
    w = argb.shape[-1]
    # shift amount in pixels (traced); roll both and select by column index
    shift = jnp.asarray(p["amount"] * w, jnp.float32).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, argb.shape[-2:], 1)
    fg_roll = _roll_lanes(argb, w - shift)
    bg_roll = _roll_lanes(brgb, -shift)
    m = (col < shift)[None]
    out = jnp.where(m, fg_roll, bg_roll)
    return from_f01(join_alpha(out, aal), fg)


def _roll_lanes(x, shift):
    # dynamic roll along the last axis (shift may be traced)
    w = x.shape[-1]
    idx = (jax.lax.broadcasted_iota(jnp.int32, x.shape[-2:], 1)
           - shift) % w
    return jnp.take_along_axis(
        x, jnp.broadcast_to(idx[None], x.shape), axis=-1)


register_filter(Filter(
    name="push", process=_push_process, in_channels=_TWO_IN,
    params=(Param("amount", "num", 0.0, 0.0, 1.0),),
    flags=FILTER_IS_TRANSITION,
    description="fg pushes bg out horizontally (slide_over.c push mode)"))


# -- data plugins ------------------------------------------------------------

_SAFE_FUNCS = {"sin": np.sin, "cos": np.cos, "abs": abs, "min": min,
               "max": max, "sqrt": np.sqrt, "pi": np.pi}


def _data_processor_analyse(ins, p, ctx):
    """data_processor.c: evaluate expressions over scalar inputs a..d.
    Expressions are static strings; evaluation uses jnp so connected traced
    values stay traced."""
    env = {"a": p["a"], "b": p["b"], "c": p["c"], "d": p["d"],
           "t": ctx.tc, "sin": jnp.sin, "cos": jnp.cos, "abs": jnp.abs,
           "sqrt": jnp.sqrt, "pi": np.pi, "min": jnp.minimum,
           "max": jnp.maximum}
    out = {}
    for slot in ("o0", "o1"):
        expr = str(p[f"expr_{slot}"]).strip()
        if not expr:
            continue
        try:
            out[slot] = eval(compile(expr, "<data_processor>", "eval"),
                             {"__builtins__": {}}, env)
        except Exception:
            out[slot] = 0.0
    return out


register_filter(Filter(
    name="data_processor",
    process=lambda ins, p, ctx: ins[0] if ins else None,
    in_channels=_ONE_IN,
    params=(Param("a", "num", 0.0, -1e6, 1e6),
            Param("b", "num", 0.0, -1e6, 1e6),
            Param("c", "num", 0.0, -1e6, 1e6),
            Param("d", "num", 0.0, -1e6, 1e6),
            Param("expr_o0", "string", "a + b"),
            Param("expr_o1", "string", "")),
    out_params=(Param("o0", "num", 0.0, -1e6, 1e6),
                Param("o1", "num", 0.0, -1e6, 1e6)),
    analyse=_data_processor_analyse,
    description="scalar expression evaluator (data_processor.c)"))


def _randomiser_analyse(ins, p, ctx):
    key = jax.random.fold_in(jax.random.PRNGKey(777),
                             jnp.asarray(ctx.frame, jnp.int32))
    vals = jax.random.uniform(key, (4,))
    return {f"rand{i}": vals[i] for i in range(4)}


register_filter(Filter(
    name="randomiser",
    process=lambda ins, p, ctx: ins[0] if ins else None,
    in_channels=_ONE_IN,
    out_params=tuple(Param(f"rand{i}", "num", 0.0, 0.0, 1.0)
                     for i in range(4)),
    analyse=_randomiser_analyse,
    description="per-frame random out-params (randomiser.c)"))
