"""Blend & transition filters.

Re-expressions of the reference plugins `simple_blend.c`, `multi_blends.c`,
`slide_over.c`, `layout_blends.c` (lives-plugins/weed-plugins/) as fused
jnp ops. Each is pure; blend amount may be traced (per-frame interpolated).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...constants import Palette
from ..host import (ChannelTemplate, FILTER_IS_TRANSITION, Filter, Param,
                    register_filter)
from ..util import from_f01, join_alpha, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)
_TWO_IN = (ChannelTemplate("fg", _RGBX), ChannelTemplate("bg", _RGBX))


def _mk_transition(name, fn, extra_params=(), desc=""):
    def process(ins, params, ctx):
        fg, bg = ins[0], ins[1]
        a = to_f01(fg)
        b = to_f01(bg)
        argb, aal = split_alpha(a)
        brgb, bal = split_alpha(b)
        out = fn(argb, brgb, params)
        out = jnp.clip(out, 0.0, 1.0)
        al = aal if aal is not None else bal
        return from_f01(join_alpha(out, al), fg)

    return register_filter(Filter(
        name=name, process=process, in_channels=_TWO_IN,
        params=(Param("amount", "num", 0.5, 0.0, 1.0),) + tuple(extra_params),
        flags=FILTER_IS_TRANSITION, description=desc))


# -- crossfade (simple_blend.c "blend") -------------------------------------
_mk_transition("crossfade",
               lambda a, b, p: a * p["amount"] + b * (1.0 - p["amount"]),
               desc="linear alpha crossfade of fg over bg")

# -- multi_blends modes ------------------------------------------------------

def _mix(expr):
    """amount-weighted mix of blend result with bg."""
    def fn(a, b, p):
        return expr(a, b) * p["amount"] + b * (1.0 - p["amount"])
    return fn


_BLEND_MODES = {
    "blend_add": lambda a, b: a + b,
    "blend_subtract": lambda a, b: b - a,
    "blend_multiply": lambda a, b: a * b,
    "blend_screen": lambda a, b: 1.0 - (1.0 - a) * (1.0 - b),
    "blend_darken": jnp.minimum,
    "blend_lighten": jnp.maximum,
    "blend_difference": lambda a, b: jnp.abs(a - b),
    "blend_exclusion": lambda a, b: a + b - 2.0 * a * b,
    "blend_overlay": lambda a, b: jnp.where(
        b <= 0.5, 2.0 * a * b, 1.0 - 2.0 * (1.0 - a) * (1.0 - b)),
    "blend_hardlight": lambda a, b: jnp.where(
        a <= 0.5, 2.0 * a * b, 1.0 - 2.0 * (1.0 - a) * (1.0 - b)),
    "blend_dodge": lambda a, b: b / jnp.maximum(1.0 - a, 1e-3),
    "blend_burn": lambda a, b: 1.0 - (1.0 - b) / jnp.maximum(a, 1e-3),
    "blend_grain_extract": lambda a, b: b - a + 0.5,
    "blend_grain_merge": lambda a, b: b + a - 0.5,
}

for _name, _expr in _BLEND_MODES.items():
    _mk_transition(_name, _mix(_expr), desc=f"{_name} of fg into bg")


# -- slide / wipe transitions (slide_over.c) ---------------------------------

def _edge_mask(ctx, w, h, direction, pos):
    """Soft-less (hard) wipe mask: 1 where fg shows."""
    from ..util import ctx_grid
    xx, yy = ctx_grid(ctx, h, w)
    masks = {
        0: xx < pos,          # left -> right
        1: (1.0 - xx) < pos,  # right -> left
        2: yy < pos,          # top -> bottom
        3: (1.0 - yy) < pos,  # bottom -> top
    }
    return masks[direction].astype(jnp.float32)


def _wipe_process(ins, params, ctx):
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, aal = split_alpha(a)
    brgb, _ = split_alpha(b)
    # direction is a static (non-interpolated) choice param
    m = _edge_mask(ctx, fg.width, fg.height, int(params.get("direction", 0)),
                   params["amount"])
    out = argb * m + brgb * (1.0 - m)
    return from_f01(join_alpha(out, aal), fg)


register_filter(Filter(
    name="wipe", process=_wipe_process, in_channels=_TWO_IN,
    params=(Param("amount", "num", 0.0, 0.0, 1.0),
            Param("direction", "string_list", 0,
                  choices=("left", "right", "top", "bottom"))),
    flags=FILTER_IS_TRANSITION, description="hard-edged directional wipe"))


def _iris_process(ins, params, ctx):
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, aal = split_alpha(a)
    brgb, _ = split_alpha(b)
    h, w = argb.shape[-2:]
    from ..util import ctx_grid
    fh, fw = (ctx.height or h), (ctx.width or w)
    x, y = ctx_grid(ctx, h, w, centered=True)
    x = x * (fw / fh)
    r = jnp.sqrt(x * x + y * y)
    rmax = np.sqrt(1.0 + (fw / fh) ** 2)
    soft = params["softness"] + 1e-4
    m = jnp.clip((params["amount"] * rmax - r) / soft + 0.5, 0.0, 1.0)
    out = argb * m + brgb * (1.0 - m)
    return from_f01(join_alpha(out, aal), fg)


register_filter(Filter(
    name="iris_circle", process=_iris_process, in_channels=_TWO_IN,
    params=(Param("amount", "num", 0.0, 0.0, 1.0),
            Param("softness", "num", 0.05, 0.0, 0.5)),
    flags=FILTER_IS_TRANSITION, description="circular iris wipe"))


# -- picture-in-picture compositor (gdk/compositor.c essence) ---------------

def _pip_process(ins, params, ctx):
    fg, bg = ins[0], ins[1]
    from ...ops.resize import resize_layer
    b = to_f01(bg)
    brgb, bal = split_alpha(b)
    h, w = brgb.shape[-2:]
    # scale is python float when static -> fixed shapes; traced scale is not
    # supported (jit needs static geometry), matching nodemodel templates.
    scale = float(params["scale"]) if not hasattr(params["scale"], "shape") \
        else 0.5
    sw, sh = max(2, int(w * scale)), max(2, int(h * scale))
    small = to_f01(resize_layer(fg, sw, sh))
    srgb, _ = split_alpha(small)
    ox = jnp.clip(params["x"] * (w - sw), 0, w - sw).astype(jnp.int32)
    oy = jnp.clip(params["y"] * (h - sh), 0, h - sh).astype(jnp.int32)
    out = jax_dynamic_paste(brgb, srgb, oy, ox)
    return from_f01(join_alpha(out, bal), bg)


def jax_dynamic_paste(canvas, patch, oy, ox):
    import jax
    return jax.lax.dynamic_update_slice(
        canvas, patch, (jnp.int32(0), oy, ox))


register_filter(Filter(
    name="picture_in_picture", process=_pip_process, in_channels=_TWO_IN,
    params=(Param("scale", "num", 0.5, 0.05, 1.0),
            Param("x", "num", 1.0, 0.0, 1.0),
            Param("y", "num", 0.0, 0.0, 1.0)),
    flags=FILTER_IS_TRANSITION,
    description="scale fg and paste over bg at (x,y)"))


# -- grid compositor (layout_blends.c) ---------------------------------------

def _grid4_process(ins, params, ctx):
    """2x2 grid of up to four tracks (layout_blends.c quad view)."""
    from ...ops.resize import resize_layer
    base = ins[0]
    h, w = base.height, base.width
    hh, hw = max(2, h // 2), max(2, w // 2)
    cells = []
    for i in range(4):
        src = ins[i] if i < len(ins) else ins[-1]
        cells.append(to_f01(resize_layer(src, hw, hh))[:3])
    top = jnp.concatenate([cells[0], cells[1]], axis=-1)
    bot = jnp.concatenate([cells[2], cells[3]], axis=-1)
    grid = jnp.concatenate([top, bot], axis=-2)
    # pad odd geometries back to full size
    ph, pw = h - grid.shape[-2], w - grid.shape[-1]
    if ph or pw:
        grid = jnp.pad(grid, ((0, 0), (0, ph), (0, pw)), mode="edge")
    a = to_f01(base)
    _, al = split_alpha(a)
    return from_f01(join_alpha(grid, al), base)


register_filter(Filter(
    name="grid4", process=_grid4_process,
    in_channels=tuple(ChannelTemplate(f"in{i}", _RGBX, optional=i > 0)
                      for i in range(4)),
    flags=FILTER_IS_TRANSITION,
    description="2x2 grid of four tracks (layout_blends.c)"))


# -- slide_over.c: fg slides in over bg ---------------------------------------

def _slide_over_process(ins, params, ctx):
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, aal = split_alpha(a)
    brgb, _ = split_alpha(b)
    h, w = argb.shape[-2:]
    amt = jnp.clip(params["amount"], 0.0, 1.0)
    d = int(params.get("direction", 0))
    import jax
    x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    if d == 0:    # from left: fg occupies [0, amt*w), content right-aligned
        ofs = jnp.round((1.0 - amt) * w).astype(jnp.int32)
        fgs = jnp.roll(argb, -ofs, axis=-1)
        mask = (x < jnp.round(amt * w).astype(jnp.int32))
    elif d == 1:  # from right
        ofs = jnp.round((1.0 - amt) * w).astype(jnp.int32)
        fgs = jnp.roll(argb, ofs, axis=-1)
        mask = (x >= jnp.round((1.0 - amt) * w).astype(jnp.int32))
    elif d == 2:  # from top
        ofs = jnp.round((1.0 - amt) * h).astype(jnp.int32)
        fgs = jnp.roll(argb, -ofs, axis=-2)
        mask = (y < jnp.round(amt * h).astype(jnp.int32))
    else:         # from bottom
        ofs = jnp.round((1.0 - amt) * h).astype(jnp.int32)
        fgs = jnp.roll(argb, ofs, axis=-2)
        mask = (y >= jnp.round((1.0 - amt) * h).astype(jnp.int32))
    m = mask.astype(jnp.float32)
    out = fgs * m + brgb * (1.0 - m)
    return from_f01(join_alpha(out, aal), fg)


register_filter(Filter(
    name="slide_over", process=_slide_over_process, in_channels=_TWO_IN,
    params=(Param("amount", "num", 0.0, 0.0, 1.0),
            Param("direction", "string_list", 0,
                  choices=("left", "right", "top", "bottom"))),
    flags=FILTER_IS_TRANSITION,
    description="fg slides in over bg (slide_over.c)"))


# -- multi_transitions.c remaining modes -------------------------------------
# (dissolve / rand replace / iris rectangle; iris circle lives above)

def _pixel_hash(ctx, h, w, salt=None):
    """Deterministic per-pixel uniform field in [0,1) from full-frame
    integer coordinates (tile-origin aware), optionally salted per frame.

    INTEGER hash, not a sin-based one: f32 sin of coordinate-scale
    arguments (10^5 rad) has zero effective precision, so Mosaic's and
    XLA's sin legitimately disagree and threshold pixels flip between the
    fused-sweep and XLA paths (measured: 17% of pixels at 240x1280).
    int32 multiply/xor/shift wrap identically everywhere."""
    import jax
    H, W = (ctx.height or h), (ctx.width or w)
    iy = jnp.clip(jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
                  + jnp.asarray(ctx.y0, jnp.int32), 0, H - 1)
    ix = jnp.clip(jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
                  + jnp.asarray(ctx.x0, jnp.int32), 0, W - 1)
    v = ix * np.int32(73856093) ^ iy * np.int32(19349663)
    if salt is not None:
        v = v ^ jnp.asarray(salt, jnp.int32) * np.int32(83492791)
    # murmur-style finalizer (arithmetic >> is fine: deterministic and
    # identical on every backend)
    v = (v ^ (v >> 13)) * np.int32(0x5bd1e995)
    v = v ^ (v >> 15)
    return (v & np.int32(0xffff)).astype(jnp.float32) * np.float32(1 / 65536)


def _dissolve_process(ins, params, ctx):
    """multi_transitions.c "dissolve": a fixed random per-pixel threshold —
    pixels switch fg->bg in a stable random order as amount rises."""
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, aal = split_alpha(a)
    brgb, _ = split_alpha(b)
    h, w = argb.shape[-2:]
    m = (_pixel_hash(ctx, h, w) >= params["amount"]).astype(jnp.float32)
    out = argb * m + brgb * (1.0 - m)
    return from_f01(join_alpha(out, aal), fg)


register_filter(Filter(
    name="dissolve", process=_dissolve_process, in_channels=_TWO_IN,
    params=(Param("amount", "num", 0.0, 0.0, 1.0),),
    flags=FILTER_IS_TRANSITION,
    description="random-pixel dissolve (multi_transitions.c)"))


def _rand_replace_process(ins, params, ctx):
    """multi_transitions.c "rand replace": like dissolve but the random
    field re-rolls every frame, so the boundary sparkles."""
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, aal = split_alpha(a)
    brgb, _ = split_alpha(b)
    h, w = argb.shape[-2:]
    salt = jnp.asarray(ctx.frame, jnp.int32)
    m = (_pixel_hash(ctx, h, w, salt) >= params["amount"]) \
        .astype(jnp.float32)
    out = argb * m + brgb * (1.0 - m)
    return from_f01(join_alpha(out, aal), fg)


register_filter(Filter(
    name="rand_replace", process=_rand_replace_process, in_channels=_TWO_IN,
    params=(Param("amount", "num", 0.0, 0.0, 1.0),),
    flags=FILTER_IS_TRANSITION,
    description="per-frame random replace (multi_transitions.c)"))


def _iris_rect_process(ins, params, ctx):
    """multi_transitions.c "iris rectangle": expanding centred rectangle
    (Chebyshev-distance analogue of iris_circle)."""
    fg, bg = ins[0], ins[1]
    a, b = to_f01(fg), to_f01(bg)
    argb, aal = split_alpha(a)
    brgb, _ = split_alpha(b)
    h, w = argb.shape[-2:]
    from ..util import ctx_grid
    x, y = ctx_grid(ctx, h, w, centered=True)
    r = jnp.maximum(jnp.abs(x), jnp.abs(y))
    soft = params["softness"] + 1e-4
    m = jnp.clip((params["amount"] - r) / soft + 0.5, 0.0, 1.0)
    out = argb * m + brgb * (1.0 - m)
    return from_f01(join_alpha(out, aal), fg)


register_filter(Filter(
    name="iris_rectangle", process=_iris_rect_process, in_channels=_TWO_IN,
    params=(Param("amount", "num", 0.0, 0.0, 1.0),
            Param("softness", "num", 0.05, 0.0, 0.5)),
    flags=FILTER_IS_TRANSITION,
    description="rectangular iris wipe (multi_transitions.c)"))


# -- gdk/compositor.c: N-input geometric compositor --------------------------

def _compositor_process(ins, p, ctx):
    """gdk/compositor.c: up to four inputs, each placed at (x,y) scaled by
    (sx,sy) with its own alpha, composited in z order (revz reverses) over
    a background colour. Geometry is fully traced: placement is inverse
    bilinear sampling (map_coordinates), so x/y/sx/sy animate per frame
    without retracing."""
    import jax
    from jax.scipy.ndimage import map_coordinates
    base = ins[0]
    a0 = to_f01(base)
    _, aal = split_alpha(a0)
    h, w = a0.shape[-2:]
    y_t = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    x_t = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    acc = jnp.stack([jnp.broadcast_to(p["bg_red"], (h, w)),
                     jnp.broadcast_to(p["bg_green"], (h, w)),
                     jnp.broadcast_to(p["bg_blue"], (h, w))]) \
        .astype(jnp.float32)
    order = range(len(ins))
    if int(p.get("revz", 0)):
        order = reversed(list(order))
    for i in order:
        src, _ = split_alpha(to_f01(ins[i]))
        sx = jnp.maximum(p[f"sx{i}"], 1e-3)
        sy = jnp.maximum(p[f"sy{i}"], 1e-3)
        u = (x_t - p[f"x{i}"] * w) / sx
        v = (y_t - p[f"y{i}"] * h) / sy
        inside = ((u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)) \
            .astype(jnp.float32)
        uu = jnp.clip(u, 0, w - 1)
        vv = jnp.clip(v, 0, h - 1)
        sampled = jnp.stack([map_coordinates(src[c], [vv, uu], order=1)
                             for c in range(3)])
        m = (inside * jnp.clip(p[f"alpha{i}"], 0.0, 1.0))[None]
        acc = acc * (1.0 - m) + sampled * m
    return from_f01(join_alpha(jnp.clip(acc, 0.0, 1.0), aal), base)


register_filter(Filter(
    name="compositor", process=_compositor_process,
    in_channels=tuple(ChannelTemplate(f"in{i}", _RGBX, optional=i > 0)
                      for i in range(4)),
    params=tuple(
        Param(f"{k}{i}", "num", d, lo, hi)
        for i in range(4)
        for k, d, lo, hi in (("x", 0.25 * (i % 2), -1.0, 1.0),
                             ("y", 0.25 * (i // 2), -1.0, 1.0),
                             ("sx", 0.5, 0.01, 4.0),
                             ("sy", 0.5, 0.01, 4.0),
                             ("alpha", 1.0, 0.0, 1.0)))
    + (Param("bg_red", "num", 0.0, 0.0, 1.0),
       Param("bg_green", "num", 0.0, 0.0, 1.0),
       Param("bg_blue", "num", 0.0, 0.0, 1.0),
       Param("revz", "int", 0, 0, 1)),
    flags=FILTER_IS_TRANSITION,
    description="4-input geometric compositor (gdk/compositor.c)"))


# -- simple_blend.c remaining modes -------------------------------------------
# (chroma blend / luma overlay / luma underlay / negative luma overlay /
#  averaged luma overlay; reference common_process types 0-4)

def _luma_select(kind):
    """Builder for the luma-threshold overlay family: per-pixel hard
    select between fg and bg driven by a luma comparison."""
    from ..util import luma

    def fn(a, b, p):
        t = p["amount"]
        if kind == "overlay":          # luma(fg) < t -> bg
            m = (luma(a) < t)
        elif kind == "underlay":       # luma(bg) > 1-t -> bg
            m = (luma(b) > 1.0 - t)
        elif kind == "negative":       # luma(fg) > 1-t -> bg
            m = (luma(a) > 1.0 - t)
        else:                          # averaged: 3x3 mean luma(fg) < t
            g = luma(a)
            gp = jnp.pad(g, 1, mode="edge")
            avg = sum(gp[dy:dy + g.shape[0], dx:dx + g.shape[1]]
                      for dy in range(3) for dx in range(3)) / 9.0
            m = (avg < t)
        m = m.astype(jnp.float32)[None]
        return b * m + a * (1.0 - m)

    return fn


_mk_transition("chroma_blend",
               lambda a, b, p: a * (1.0 - p["amount"]) + b * p["amount"],
               desc="per-channel table mix (simple_blend.c chroma blend)")
_mk_transition("luma_overlay", _luma_select("overlay"),
               desc="bg where fg luma < t (simple_blend.c)")
_mk_transition("luma_underlay", _luma_select("underlay"),
               desc="bg where bg luma bright (simple_blend.c)")
_mk_transition("negative_luma_overlay", _luma_select("negative"),
               desc="bg where fg luma > 1-t (simple_blend.c)")
_mk_transition("averaged_luma_overlay", _luma_select("averaged"),
               desc="bg where 3x3 mean fg luma < t (simple_blend.c)")


# -- layout_blends.c triple split ---------------------------------------------

def _triple_split_process(ins, p, ctx):
    """layout_blends.c "triple split": three tracks side by side at
    boundaries xstart/xend (sym centres them), vertical or horizontal,
    with a coloured border band of half-width bw."""
    import jax
    a = to_f01(ins[0])
    argb, aal = split_alpha(a)
    srcs = [argb] + [split_alpha(to_f01(ins[i] if i < len(ins)
                                        else ins[-1]))[0]
                     for i in (1, 2)]
    h, w = argb.shape[-2:]
    xs, xe = p["xstart"], p["xend"]
    sym = jnp.asarray(p["sym"]) > 0.5
    xs = jnp.where(sym, xs / 2.0, xs)
    xe = jnp.where(sym, 1.0 - xs, xe)
    lo, hi = jnp.minimum(xs, xe), jnp.maximum(xs, xe)
    axis = 0 if int(p.get("vert", 0)) else 1
    n = h if axis == 0 else w
    t = jax.lax.broadcasted_iota(jnp.int32, (h, w), axis) \
        .astype(jnp.float32) / np.float32(max(n - 1, 1))
    out = jnp.where((t < lo)[None], srcs[0],
                    jnp.where((t < hi)[None], srcs[1], srcs[2]))
    bw = p["bw"]
    border = (jnp.abs(t - lo) < bw) | (jnp.abs(t - hi) < bw)
    bc = jnp.stack([p["border_r"], p["border_g"],
                    p["border_b"]])[:, None, None]
    out = jnp.where(border[None], bc, out)
    return from_f01(join_alpha(out, aal), ins[0])


register_filter(Filter(
    name="triple_split", process=_triple_split_process,
    in_channels=tuple(ChannelTemplate(f"in{i}", _RGBX, optional=i > 0)
                      for i in range(3)),
    params=(Param("xstart", "num", 0.33, 0.0, 1.0),
            Param("sym", "num", 0.0, 0.0, 1.0),
            Param("xend", "num", 0.67, 0.0, 1.0),
            Param("vert", "int", 0, 0, 1),
            Param("bw", "num", 0.0, 0.0, 0.1),
            Param("border_r", "num", 0.0, 0.0, 1.0),
            Param("border_g", "num", 0.0, 0.0, 1.0),
            Param("border_b", "num", 0.0, 0.0, 1.0)),
    flags=FILTER_IS_TRANSITION,
    description="three tracks side by side (layout_blends.c triple split)"))
