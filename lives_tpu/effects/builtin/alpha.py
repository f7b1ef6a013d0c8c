"""Alpha-channel producers and consumers — the cconx filter family.

TPU-native re-expressions of the reference's separated-alpha plugins:
  farneback_analyser  <- weed-plugins/farneback_analyser.cpp (dense optical
                         flow exported as two AFLOAT out-channels + scalar
                         out-params; here a one-iteration Lucas-Kanade
                         estimate — box-filtered gradient products, fully
                         vectorised, no OpenCV)
  alpha_visualizer    <- weed-plugins/alpha_visualizer.c (alpha in-channel
                         rendered to RGB(A) with per-primary enables and a
                         float range)
  fg_bg_removal       <- weed-plugins/fg_bg_removal.c (running-average luma
                         background model; static pixels replaced by black /
                         fire noise / blue glow; the foreground mask is also
                         exported as an A8 out-channel — a cconx source)
  motion_mask         — frame-difference motion mask as an A8 out-channel
                        (the role farneback masks play in reference sessions,
                        cheap form; pairs with mask_overlay/compositor)

Alpha out-channels ride data connections (effects/data.py, reference
src/effects-data.c:1730 cconx_new) into downstream alpha in-channels; inside
a FrameGraph template the wiring is one traced computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import Palette
from ...layer import Layer
from ..host import (FILTER_STATEFUL, ChannelTemplate, Filter, Param,
                    register_filter)
from ..util import from_f01, join_alpha, luma, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)
_ONE_IN = (ChannelTemplate("in", _RGBX),)
_ALPHA_ANY = (Palette.A8, Palette.AFLOAT, Palette.A1)


def _alpha_f01(a: Layer) -> jnp.ndarray:
    """(H,W) float [0,1] view of an alpha layer (any alpha palette)."""
    p = a.planes[0]
    if a.palette == int(Palette.AFLOAT):
        return p.astype(jnp.float32)
    if a.palette == int(Palette.A1):
        return p.astype(jnp.float32)
    return p.astype(jnp.int32).astype(jnp.float32) * np.float32(1 / 255.0)


def _a8(m_f01: jnp.ndarray) -> Layer:
    """[0,1] (H,W) float mask -> A8 alpha Layer."""
    u8 = jnp.clip(jnp.floor(m_f01 * 255.0 + 0.5), 0, 255) \
        .astype(jnp.int32).astype(jnp.uint8)
    return Layer(planes=(u8,), palette=int(Palette.A8))


def _afloat(m: jnp.ndarray) -> Layer:
    return Layer(planes=(m.astype(jnp.float32),),
                 palette=int(Palette.AFLOAT))


# -- motion_mask: frame-diff -> A8 mask --------------------------------------

def _motion_mask_process(ins, p, ctx, state):
    g = luma(split_alpha(to_f01(ins[0]))[0])
    prev = state
    d = jnp.abs(g - prev)
    m = jnp.clip((d - p["threshold"]) / jnp.maximum(p["softness"], 1e-4),
                 0.0, 1.0)
    return ins[0], g, {"mask": _a8(m), "motion": jnp.mean(d)}


register_filter(Filter(
    name="motion_mask", process=_motion_mask_process, in_channels=_ONE_IN,
    params=(Param("threshold", "num", 0.05, 0.0, 1.0),
            Param("softness", "num", 0.1, 0.0, 1.0)),
    out_params=(Param("motion", "num", 0.0, 0.0, 1.0),),
    alpha_outs=(ChannelTemplate("mask", (Palette.A8,)),),
    flags=FILTER_STATEFUL,
    init_state=lambda w, h, pal: jnp.zeros((h, w), jnp.float32),
    description="frame-difference motion mask exported as an A8 "
                "out-channel (cconx source)"))


# -- farneback_analyser: dense flow as AFLOAT channels -----------------------

def _box3(x):
    """3x3 box filter, edge-padded (separable; stays on the VPU)."""
    x = (x + jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0))
    return (x + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)) * np.float32(1 / 9)


def _farneback_process(ins, p, ctx, state):
    """One-iteration Lucas-Kanade dense flow (farneback_analyser.cpp's
    role): solve the 2x2 normal equations of I_x*u + I_y*v = -I_t over a
    box window, per pixel."""
    g = luma(split_alpha(to_f01(ins[0]))[0])
    prev = state
    ix = (jnp.roll(g, -1, 1) - jnp.roll(g, 1, 1)) * 0.5
    iy = (jnp.roll(g, -1, 0) - jnp.roll(g, 1, 0)) * 0.5
    it = g - prev
    a11 = _box3(ix * ix) + np.float32(1e-4)
    a12 = _box3(ix * iy)
    a22 = _box3(iy * iy) + np.float32(1e-4)
    b1 = -_box3(ix * it)
    b2 = -_box3(iy * it)
    det = a11 * a22 - a12 * a12
    u = (a22 * b1 - a12 * b2) / det
    v = (a11 * b2 - a12 * b1) / det
    mag = jnp.sqrt(u * u + v * v)
    scale = p["scale"]
    return ins[0], g, {
        "flow_x": _afloat(u * scale), "flow_y": _afloat(v * scale),
        "mean_flow_x": jnp.mean(u), "mean_flow_y": jnp.mean(v),
        "mean_magnitude": jnp.mean(mag), "max_magnitude": jnp.max(mag)}


register_filter(Filter(
    name="farneback_analyser", process=_farneback_process,
    in_channels=_ONE_IN,
    params=(Param("scale", "num", 1.0, 0.0, 16.0),),
    out_params=(Param("mean_flow_x", "num", 0.0, -64.0, 64.0),
                Param("mean_flow_y", "num", 0.0, -64.0, 64.0),
                Param("mean_magnitude", "num", 0.0, 0.0, 64.0),
                Param("max_magnitude", "num", 0.0, 0.0, 64.0)),
    alpha_outs=(ChannelTemplate("flow_x", (Palette.AFLOAT,)),
                ChannelTemplate("flow_y", (Palette.AFLOAT,))),
    flags=FILTER_STATEFUL,
    init_state=lambda w, h, pal: jnp.zeros((h, w), jnp.float32),
    description="dense optical flow -> two AFLOAT out-channels + flow "
                "stats (farneback_analyser.cpp)"))


# -- alpha_visualizer: alpha in-channel -> RGB(A) -----------------------------

def _alpha_vis_process(ins, p, ctx):
    video = ins[0]
    a = ins[1]  # connected alpha (slot 0) or None
    arr = to_f01(video)
    vrgb, al = split_alpha(arr)
    if a is not None:
        m = _alpha_f01(a)
        lo, hi = p["fmin"], p["fmax"]
        m = jnp.clip((m - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
    else:
        # unconnected: visualise the layer's own alpha (or luma)
        m = al if al is not None else luma(vrgb)
    rgb = jnp.clip(jnp.stack([m * p["red"], m * p["green"], m * p["blue"]]),
                   0.0, 1.0)
    # output alpha (if present) goes opaque, as the reference documents
    out = join_alpha(rgb, jnp.ones_like(al) if al is not None else None)
    return from_f01(out, video)


register_filter(Filter(
    name="alpha_visualizer", process=_alpha_vis_process,
    in_channels=_ONE_IN,
    alpha_ins=(ChannelTemplate("alpha", _ALPHA_ANY, optional=True),),
    params=(Param("red", "num", 1.0, 0.0, 1.0),
            Param("green", "num", 1.0, 0.0, 1.0),
            Param("blue", "num", 1.0, 0.0, 1.0),
            Param("fmin", "num", 0.0, -64.0, 64.0),
            Param("fmax", "num", 1.0, -64.0, 64.0)),
    description="render a connected alpha channel as RGB(A) "
                "(alpha_visualizer.c)"))


# -- fg_bg_removal: background model + replacement ----------------------------

def _hash01(h, w, salt):
    """Deterministic integer-hash noise field in [0,1) (no transcendentals:
    Mosaic != XLA on f32 sin — CLAUDE.md)."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    v = ix * np.int32(73856093) ^ iy * np.int32(19349663) \
        ^ (jnp.asarray(salt, jnp.int32) * np.int32(83492791))
    v = (v ^ (v >> 13)) * np.int32(0x5BD1E995)
    v = v ^ (v >> 15)
    return (v & np.int32(0xFFFF)).astype(jnp.float32) * np.float32(1 / 65536)


def _fg_bg_process(ins, p, ctx, state):
    """Static pixels (|luma - running average| < threshold) get replaced:
    type 0 black, 1 fire noise, 2 blue glow (fg_bg_removal.c:135-160).
    The moving-foreground mask is exported for cconx consumers."""
    lay = ins[0]
    arr = to_f01(lay)
    rgb, al = split_alpha(arr)
    g = luma(rgb)
    avg, count = state
    new_avg = (avg * count + g) / (count + 1.0)
    is_bg = (jnp.abs(g - new_avg) < p["threshold"]).astype(jnp.float32)
    h, w = g.shape
    t = int(p.get("type", 0))
    if t == 1:    # fire-ish: random red + green, no blue
        r = _hash01(h, w, ctx.frame) * 0.5
        gg = _hash01(h, w, ctx.frame + 7919) * 0.5
        repl = jnp.stack([r + gg, gg, jnp.zeros_like(g)])
    elif t == 2:  # blue glow: random grey + full blue
        n = _hash01(h, w, ctx.frame)
        repl = jnp.stack([n, n, jnp.ones_like(g)])
    else:         # black
        repl = jnp.zeros_like(rgb)
    out = rgb * (1.0 - is_bg) + repl * is_bg
    mask = 1.0 - is_bg  # moving foreground
    new_count = jnp.minimum(count + 1.0, p["history"])
    return (from_f01(join_alpha(out, al), lay), (new_avg, new_count),
            {"mask": _a8(mask)})


register_filter(Filter(
    name="fg_bg_removal", process=_fg_bg_process, in_channels=_ONE_IN,
    params=(Param("threshold", "num", 64 / 255.0, 0.0, 1.0),
            Param("type", "int", 0, 0, 2),
            Param("history", "num", 255.0, 1.0, 1000.0)),
    alpha_outs=(ChannelTemplate("mask", (Palette.A8,)),),
    flags=FILTER_STATEFUL,
    init_state=lambda w, h, pal: (jnp.zeros((h, w), jnp.float32),
                                  jnp.float32(0.0)),
    description="running-average background removal, 3 replacement types; "
                "exports the fg mask (fg_bg_removal.c)"))


# -- vector_visualiser: flow-field arrows over video ---------------------------

def _vector_vis_process(ins, p, ctx):
    """cairo/vector_visualiser.c grid mode (the only mode reachable in the
    reference — `mode` is hardcoded MD_GRID at :244): the frame is divided
    into a ~20x20 grid; at each cell centre an arrow is drawn whose vector
    comes from two connected AFLOAT channels (x-plane, y-plane — e.g. the
    farneback_analyser flow). TPU re-expression: the coarse flow is a
    static strided slice, broadcast back per-pixel with jnp.repeat, and
    arrows render as per-pixel distance fields (segment + tip ring) — no
    gathers, no host loop, fuses into one VPU pass."""
    video = ins[0]
    ax, ay = ins[1], ins[2]
    arr = to_f01(video)
    rgb, al = split_alpha(arr)
    if ax is None or ay is None:
        return video  # nothing connected: pass through
    h, w = rgb.shape[-2:]
    sm_h, sm_w = max(h // 20, 1), max(w // 20, 1)
    fx = ax.planes[0].astype(jnp.float32) * p["scale"]
    fy = ay.planes[0].astype(jnp.float32) * p["scale"]
    # arrow bases at (sm + 2*sm*k), exactly the reference's loop lattice
    cfx = fx[sm_h::2 * sm_h, sm_w::2 * sm_w]
    cfy = fy[sm_h::2 * sm_h, sm_w::2 * sm_w]
    ny, nx = cfx.shape
    # per-pixel vector of the OWN cell (2sm x 2sm block around each base)
    rep = lambda c: jnp.repeat(jnp.repeat(c, 2 * sm_h, 0), 2 * sm_w, 1)
    pad_y, pad_x = h - ny * 2 * sm_h, w - nx * 2 * sm_w
    def full(c):
        r = rep(c)
        if pad_y > 0:
            r = jnp.concatenate([r, jnp.repeat(r[-1:], pad_y, 0)], 0)
        if pad_x > 0:
            r = jnp.concatenate([r, jnp.repeat(r[:, -1:], pad_x, 1)], 1)
        return r[:h, :w]
    vx, vy = full(cfx), full(cfy)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    # own-cell base point (bx, by); arrow runs S=(b - v - .5) -> E=b
    by = (jnp.floor(yy / (2 * sm_h)) * (2 * sm_h) + sm_h)
    bx = (jnp.floor(xx / (2 * sm_w)) * (2 * sm_w) + sm_w)
    sx, sy = bx - vx - 0.5, by - vy - 0.5
    ex, ey = bx, by
    dx, dy = ex - sx, ey - sy
    seg2 = jnp.maximum(dx * dx + dy * dy, 1e-6)
    t = jnp.clip(((xx - sx) * dx + (yy - sy) * dy) / seg2, 0.0, 1.0)
    qx, qy = sx + t * dx - xx, sy + t * dy - yy
    d_seg = jnp.sqrt(qx * qx + qy * qy)
    ln = jnp.sqrt(vx * vx + vy * vy)
    d_tip = jnp.abs(jnp.sqrt((xx - ex) ** 2 + (yy - ey) ** 2) - ln * 0.25)
    lw = 2.0  # cairo line width 4 -> half-width 2
    stroke = jnp.clip(lw - jnp.minimum(d_seg, d_tip) + 0.5, 0.0, 1.0)
    # suppress degenerate (near-zero) vectors so still frames stay clean
    stroke = stroke * (ln > 0.25)
    red = jnp.stack([jnp.ones_like(stroke), jnp.zeros_like(stroke),
                     jnp.zeros_like(stroke)])
    out = rgb * (1.0 - stroke[None]) + red * stroke[None]
    return from_f01(join_alpha(out, al), video)


register_filter(Filter(
    name="vector_visualiser", process=_vector_vis_process,
    in_channels=_ONE_IN,
    alpha_ins=(ChannelTemplate("x-plane", (Palette.AFLOAT,), optional=True),
               ChannelTemplate("y-plane", (Palette.AFLOAT,), optional=True)),
    params=(Param("scale", "num", 1.0, 0.0, 64.0),),
    description="overlay a 20x20 grid of flow arrows from two connected "
                "AFLOAT channels (cairo/vector_visualiser.c grid mode)"))


# -- alpha_to_grey ------------------------------------------------------------

def _alpha_to_grey_process(ins, p, ctx):
    """scripts/alpha_to_grey.script: replace RGB with the alpha channel
    as a grey image (alpha itself passes through). RGB input (no alpha)
    degrades to its luma — the script's RGBA-only palette list widened
    to our planar world."""
    lay = ins[0]
    a, alpha = split_alpha(to_f01(lay))
    g = alpha if alpha is not None else luma(a)
    out = jnp.stack([g, g, g])
    return from_f01(join_alpha(out, alpha), lay)


register_filter(Filter(
    name="alpha_to_grey", process=_alpha_to_grey_process,
    in_channels=_ONE_IN,
    description="alpha channel as grey pixels "
                "(scripts/alpha_to_grey.script)"))
