"""Stateful feedback effects — the EffecTV ports re-imagined.

Reference plugins: `RGBdelay.c`, `fireTV.c`, `lifeTV.c`, `blurzoom.c`
(radioacTV), `onedTV.c`, `nervousTV.c` (lives-plugins/weed-plugins/). The
reference hides state in `plugin_internal` pointers; here state is an
explicit pytree threaded through `process(ins, params, ctx, state)` so
chains containing these filters batch-render with `lax.scan`
(FrameGraph.run_batch) and stay deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import Palette
from ..host import (ChannelTemplate, FILTER_STATEFUL, Filter, Param,
                    register_filter)
from ..util import from_f01, join_alpha, luma, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)
_ONE_IN = (ChannelTemplate("in", _RGBX),)

MAX_DELAY = 16


def _stateful(name, process, init_state, params=(), desc=""):
    return register_filter(Filter(
        name=name, process=process, in_channels=_ONE_IN,
        params=tuple(params), flags=FILTER_STATEFUL,
        init_state=init_state, description=desc))


# -- rgb_delay ---------------------------------------------------------------

def _rgbdelay_init(w, h, pal):
    # rotating ring: u8 slots (delayed frames ARE u8 content — RGBdelay.c
    # keeps u8 copies) + an int32 head. A full-f32 ring rebuilt by
    # concatenate cost ~760 MB of HBM traffic PER FRAME at 1080p and
    # dominated the stateful scan path; the rotating u8 write is O(one
    # slot) and lets XLA alias the carried buffer in lax.scan.
    return {"ring": jnp.zeros((MAX_DELAY, 3, h, w), jnp.uint8),
            "head": jnp.int32(0)}


def _rgbdelay_process(ins, p, ctx, state):
    import jax
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    head = state["head"]
    cur_u8 = jnp.clip(jnp.floor(rgb * 255.0 + 0.5), 0, 255) \
        .astype(jnp.int32).astype(jnp.uint8)
    ring = jax.lax.dynamic_update_index_in_dim(state["ring"], cur_u8,
                                               head, 0)
    dr = jnp.clip(p["delay_r"], 0, MAX_DELAY - 1).astype(jnp.int32)
    dg = jnp.clip(p["delay_g"], 0, MAX_DELAY - 1).astype(jnp.int32)
    db = jnp.clip(p["delay_b"], 0, MAX_DELAY - 1).astype(jnp.int32)

    def chan(d, c):
        idx = (head - d) % MAX_DELAY  # d frames ago
        return jax.lax.dynamic_index_in_dim(
            ring, idx, 0, keepdims=False)[c] \
            .astype(jnp.int32).astype(jnp.float32) * np.float32(1 / 255.0)

    out = jnp.stack([chan(dr, 0), chan(dg, 1), chan(db, 2)])
    new_state = {"ring": ring, "head": (head + 1) % MAX_DELAY}
    return from_f01(join_alpha(out, al), lay), new_state


_stateful("rgb_delay", _rgbdelay_process, _rgbdelay_init,
          params=(Param("delay_r", "num", 0.0, 0.0, MAX_DELAY - 1),
                  Param("delay_g", "num", 4.0, 0.0, MAX_DELAY - 1),
                  Param("delay_b", "num", 8.0, 0.0, MAX_DELAY - 1)),
          desc="per-channel temporal delay (RGBdelay.c)")


# -- fire --------------------------------------------------------------------
#
# The spatial steps are factored into `*_core` functions shared with the
# fused stateful sweep kernel (graph/pallas_stateful.py) so both paths
# keep ONE source of truth. Shifts are edge-CLAMPED (not wrapped):
# flames must not teleport across frame edges, and clamped halos are
# exactly what the sweep kernel's clamped-coordinate generation provides.


def _shift_lr(a):
    """Column neighbours with edge clamp: (left, right) of a (..., W)."""
    l = jnp.concatenate([a[..., :1], a[..., :-1]], axis=-1)
    r = jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
    return l, r


def fire_core(mid_ext, cooling):
    """One fire propagation step. `mid_ext` is max(state, sparks) with
    ONE extra row BELOW (edge-clamped): (n+1, W) -> (n, W)."""
    up = mid_ext[1:]
    l, r = _shift_lr(up)
    return (up * 2.0 + l + r) * 0.25 * (1.0 - 0.04 - cooling * 0.1)


def fire_flame(buf):
    """Fire palette black->red->yellow->white: (n, W) -> (3, n, W)."""
    fr = jnp.clip(buf * 3.0, 0.0, 1.0)
    fg = jnp.clip(buf * 3.0 - 1.0, 0.0, 1.0)
    fb = jnp.clip(buf * 3.0 - 2.0, 0.0, 1.0)
    return jnp.stack([fr, fg, fb])


def fire_compose(rgb, flame, amount):
    base = rgb * (1.0 - amount)
    return jnp.clip(jnp.maximum(base, flame * amount + base), 0.0, 1.0)


def _fire_init(w, h, pal):
    return jnp.zeros((h, w), jnp.float32)


def _fire_process(ins, p, ctx, state):
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    g = luma(rgb)
    # spark injection where the image is bright
    sparks = jnp.where(g > p["threshold"], g, 0.0)
    mid = jnp.maximum(state, sparks)
    # flames rise: up-shift + neighbour average + decay (edge-clamped)
    buf = fire_core(jnp.concatenate([mid, mid[-1:]], axis=0), p["cooling"])
    out = fire_compose(rgb, fire_flame(buf), p["amount"])
    return from_f01(join_alpha(out, al), lay), buf


_stateful("fire", _fire_process, _fire_init,
          params=(Param("threshold", "num", 0.6, 0.0, 1.0),
                  Param("cooling", "num", 0.3, 0.0, 1.0),
                  Param("amount", "num", 1.0, 0.0, 1.0)),
          desc="rising flames from bright areas (fireTV.c)")


# -- life --------------------------------------------------------------------

def _life_init(w, h, pal):
    return jnp.zeros((h, w), jnp.uint8)


def life_core(cells_ext, g_ext, threshold):
    """One life step. `cells_ext` is the f32 cell field with one
    edge-clamped row above AND below ((n+2, W)); `g_ext` is comp luma
    with one clamped row ABOVE ((n+1, W)). Returns f32 0/1 (n, W)."""
    above, mid, below = cells_ext[:-2], cells_ext[1:-1], cells_ext[2:]
    al_, ar_ = _shift_lr(above)
    ml_, mr_ = _shift_lr(mid)
    bl_, br_ = _shift_lr(below)
    n = above + below + al_ + ar_ + ml_ + mr_ + bl_ + br_
    born = (n == 3.0)
    survive = (mid > 0) & ((n == 2.0) | (n == 3.0))
    # seed new life from image edges (luma gradient, edge-clamped)
    g = g_ext[1:]
    gl, _ = _shift_lr(g)
    gx = jnp.abs(g - gl)
    gy = jnp.abs(g - g_ext[:-1])
    seed = (gx + gy) > threshold
    return (born | survive | seed).astype(jnp.float32)


def _life_process(ins, p, ctx, state):
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    g = luma(rgb)
    cells = state.astype(jnp.float32)
    cells_ext = jnp.concatenate([cells[:1], cells, cells[-1:]], axis=0)
    g_ext = jnp.concatenate([g[:1], g], axis=0)
    overlay = life_core(cells_ext, g_ext, p["threshold"])
    out = jnp.clip(rgb + overlay[None] * p["amount"], 0.0, 1.0)
    return (from_f01(join_alpha(out, al), lay),
            overlay.astype(jnp.uint8))


_stateful("life", _life_process, _life_init,
          params=(Param("threshold", "num", 0.2, 0.0, 1.0),
                  Param("amount", "num", 0.6, 0.0, 1.0)),
          desc="Conway life seeded by image edges (lifeTV.c)")


# -- blurzoom (radioactive glow) --------------------------------------------

def _blurzoom_init(w, h, pal):
    return jnp.zeros((h, w), jnp.float32)


def _blurzoom_process(ins, p, ctx, state):
    from ...ops.resize import resize_plane
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    h, w = rgb.shape[-2:]
    g = luma(rgb)
    edges = jnp.abs(g - jnp.roll(g, 1, 1)) + jnp.abs(g - jnp.roll(g, 1, 0))
    buf = state + jnp.where(edges > 0.25, 1.0, 0.0)
    # zoom out slightly (glow expands) + decay
    zh, zw = int(h * 0.95), int(w * 0.95)
    inner = resize_plane(buf, zh, zw, "bilinear")
    pad_t, pad_l = (h - zh) // 2, (w - zw) // 2
    buf = jnp.pad(inner, ((pad_t, h - zh - pad_t), (pad_l, w - zw - pad_l)))
    buf = buf * (0.75 + 0.2 * (1.0 - p["decay"]))
    glow_col = jnp.stack([p["red"], p["green"], p["blue"]])[:, None, None]
    out = jnp.clip(rgb + buf[None] * glow_col * p["amount"], 0.0, 1.0)
    return from_f01(join_alpha(out, al), lay), buf


_stateful("blurzoom", _blurzoom_process, _blurzoom_init,
          params=(Param("decay", "num", 0.5, 0.0, 1.0),
                  Param("amount", "num", 0.8, 0.0, 1.0),
                  Param("red", "num", 0.3, 0.0, 1.0),
                  Param("green", "num", 1.0, 0.0, 1.0),
                  Param("blue", "num", 0.3, 0.0, 1.0)),
          desc="expanding motion glow (blurzoom.c radioacTV)")


# -- onedTV ------------------------------------------------------------------

def _oned_init(w, h, pal):
    return {"row": jnp.zeros((), jnp.int32),
            "acc": jnp.zeros((3, h, w), jnp.float32)}


def _oned_process(ins, p, ctx, state):
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    h = rgb.shape[-2]
    row = state["row"]
    line = jax.lax.dynamic_slice_in_dim(rgb, row, 1, axis=1)
    acc = jax.lax.dynamic_update_slice_in_dim(state["acc"], line, row, axis=1)
    # draw a bright cursor line
    out = jax.lax.dynamic_update_slice_in_dim(
        acc, jnp.ones_like(line), (row + 1) % h, axis=1)
    speed = jnp.maximum(p["speed"], 1.0).astype(jnp.int32)
    return (from_f01(join_alpha(out, al), lay),
            {"row": (row + speed) % h, "acc": acc})


_stateful("onedtv", _oned_process, _oned_init,
          params=(Param("speed", "num", 1.0, 1.0, 16.0),),
          desc="scanline-at-a-time freeze (onedTV.c)")


# -- nervous -----------------------------------------------------------------

NERVOUS_DEPTH = 8


def _nervous_init(w, h, pal):
    # rotating u8 ring (see _rgbdelay_init: O(one slot) write per frame)
    return {"ring": jnp.zeros((NERVOUS_DEPTH, 3, h, w), jnp.uint8),
            "head": jnp.int32(0)}


def _nervous_process(ins, p, ctx, state):
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    head = state["head"]
    cur_u8 = jnp.clip(jnp.floor(rgb * 255.0 + 0.5), 0, 255) \
        .astype(jnp.int32).astype(jnp.uint8)
    ring = jax.lax.dynamic_update_index_in_dim(state["ring"], cur_u8,
                                               head, 0)
    key = jax.random.fold_in(jax.random.PRNGKey(1234),
                             jnp.asarray(ctx.frame, jnp.int32))
    idx = jax.random.randint(key, (), 0, NERVOUS_DEPTH)
    out = jax.lax.dynamic_index_in_dim(ring, idx, 0, keepdims=False) \
        .astype(jnp.int32).astype(jnp.float32) * np.float32(1 / 255.0)
    new_state = {"ring": ring, "head": (head + 1) % NERVOUS_DEPTH}
    return from_f01(join_alpha(out, al), lay), new_state


_stateful("nervous", _nervous_process, _nervous_init,
          desc="random recent-frame flashback (nervousTV.c)")


# -- video feedback ----------------------------------------------------------

def _feedback_init(w, h, pal):
    return jnp.zeros((3, h, w), jnp.float32)


def _feedback_process(ins, p, ctx, state):
    from jax.scipy.ndimage import map_coordinates
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    h, w = rgb.shape[-2:]
    # zoom about centre as a shape-static coordinate warp (traced zoom ok)
    z = 0.9 + p["zoom"] * 0.2  # 0.9 .. 1.1
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = (jnp.arange(h, dtype=jnp.float32)[:, None] - cy) / z + cy
    xx = (jnp.arange(w, dtype=jnp.float32)[None, :] - cx) / z + cx
    yy = jnp.clip(jnp.broadcast_to(yy, (h, w)), 0, h - 1)
    xx = jnp.clip(jnp.broadcast_to(xx, (h, w)), 0, w - 1)
    prev = jax.vmap(lambda ch: map_coordinates(ch, [yy, xx], order=1,
                                               mode="nearest"))(state)
    out = rgb * (1.0 - p["feedback"]) + prev * p["feedback"]
    out = jnp.clip(out, 0.0, 1.0)
    return from_f01(join_alpha(out, al), lay), out


_stateful("feedback", _feedback_process, _feedback_init,
          params=(Param("feedback", "num", 0.7, 0.0, 0.98),
                  Param("zoom", "num", 0.6, 0.0, 1.0)),
          desc="classic video feedback tunnel")


# -- edge (EffecTV edge detect) ----------------------------------------------

def _edge_process(ins, p, ctx):
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    g = luma(rgb)
    gx = jnp.roll(g, -1, 1) - jnp.roll(g, 1, 1)
    gy = jnp.roll(g, -1, 0) - jnp.roll(g, 1, 0)
    mag = jnp.sqrt(gx * gx + gy * gy) * p["gain"]
    tinted = jnp.stack([mag, mag, mag]) * jnp.stack(
        [p["red"], p["green"], p["blue"]])[:, None, None]
    out = jnp.clip(rgb * (1.0 - p["amount"]) + tinted * p["amount"],
                   0.0, 1.0)
    return from_f01(join_alpha(out, al), lay)


register_filter(Filter(
    name="edge", process=_edge_process, in_channels=_ONE_IN,
    params=(Param("gain", "num", 2.0, 0.1, 10.0),
            Param("amount", "num", 1.0, 0.0, 1.0),
            Param("red", "num", 1.0, 0.0, 1.0),
            Param("green", "num", 1.0, 0.0, 1.0),
            Param("blue", "num", 1.0, 0.0, 1.0)),
    description="Sobel edge glow (edge detect, EffecTV)"))


# -- vertigo (rotating/zooming feedback, vertigoTV) ---------------------------

def _vertigo_init(w, h, pal):
    return jnp.zeros((3, h, w), jnp.float32)


def _vertigo_process(ins, p, ctx, state):
    from jax.scipy.ndimage import map_coordinates
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    h, w = rgb.shape[-2:]
    th = (p["speed"] - 0.5) * 0.2  # rotation per frame
    z = 1.0 + p["zoom"] * 0.1
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    y = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    x = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cs, sn = jnp.cos(th) / z, jnp.sin(th) / z
    yy = jnp.clip(cy + y * cs - x * sn, 0, h - 1)
    xx = jnp.clip(cx + y * sn + x * cs, 0, w - 1)
    yy = jnp.broadcast_to(yy, (h, w))
    xx = jnp.broadcast_to(xx, (h, w))
    prev = jax.vmap(lambda ch: map_coordinates(ch, [yy, xx], order=1,
                                               mode="nearest"))(state)
    out = jnp.clip(rgb * (1.0 - p["feedback"]) + prev * p["feedback"],
                   0.0, 1.0)
    return from_f01(join_alpha(out, al), lay), out


_stateful("vertigo", _vertigo_process, _vertigo_init,
          params=(Param("feedback", "num", 0.7, 0.0, 0.98),
                  Param("speed", "num", 0.6, 0.0, 1.0),
                  Param("zoom", "num", 0.5, 0.0, 1.0)),
          desc="rotating/zooming feedback (vertigoTV)")


# -- alien overlay (scripts/alien_overlay.script) -----------------------------

def _alien_init(w, h, pal):
    return jnp.zeros((3, h, w), jnp.float32)


def alien_core(rgb, ghost_old):
    """Pointwise ghost blend (shared with the fused stateful sweep)."""
    ghost = ghost_old + (rgb - ghost_old) * 0.1
    return jnp.clip(rgb * 0.5 + ghost * 0.5, 0.0, 1.0), ghost


def _alien_process(ins, p, ctx, state):
    """alien_overlay.script: blend the frame with a slow exponential ghost
    of itself — static areas stay solid, motion leaves translucent
    trails."""
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    out, ghost = alien_core(rgb, state)
    return from_f01(join_alpha(out, al), lay), ghost


_stateful("alien_overlay", _alien_process, _alien_init,
          desc="ghost-blend motion trails (alien_overlay.script)")
