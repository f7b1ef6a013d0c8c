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
    alpha_in = ins[2] if len(ins) > 2 else None
    if alpha_in is not None:
        # connected alpha channel (cconx) IS the mask — an analyser
        # (motion_mask / fg_bg_removal) drives the overlay live
        from .alpha import _alpha_f01
        g = _alpha_f01(alpha_in)
    else:
        brgb, bal = split_alpha(b)
        g = luma(brgb)  # mask from bg luma (mask clip on track 1)
    m = jnp.clip((g - p["threshold"]) / (p["softness"] + 1e-4), 0.0, 1.0)
    inv = p["invert"]
    m = m * (1.0 - inv) + (1.0 - m) * inv
    out = argb * m[None]
    return from_f01(join_alpha(out, aal), fg)


register_filter(Filter(
    name="mask_overlay", process=_mask_overlay_process, in_channels=_TWO_IN,
    alpha_ins=(ChannelTemplate(
        "mask", (Palette.A8, Palette.AFLOAT, Palette.A1),
        optional=True),),
    params=(Param("threshold", "num", 0.5, 0.0, 1.0),
            Param("softness", "num", 0.05, 0.0, 1.0),
            Param("invert", "num", 0.0, 0.0, 1.0)),
    flags=FILTER_IS_TRANSITION,
    description="mask fg by bg luma, or by a connected alpha channel "
                "(gdk/mask_overlay.c + cconx, effects-data.c:1730)"))


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


# -- Toonz family (reference toonz.cpp: DWANGO OpenToonz ports) ---------------

def _register_rgb(name, fn, params=(), desc=""):
    from ..host import ChannelTemplate, Filter, Param, register_filter
    from ...constants import Palette as _P
    from ..util import from_f01, join_alpha, split_alpha, to_f01

    def process(ins, p, ctx):
        lay = ins[0]
        a = to_f01(lay)
        rgb, al = split_alpha(a)
        out = jnp.clip(fn(rgb, p, ctx), 0.0, 1.0)
        return from_f01(join_alpha(out, al), lay)

    return register_filter(Filter(
        name=name, process=process,
        in_channels=(ChannelTemplate("in", (_P.RGB24, _P.RGBA32)),),
        params=tuple(params), description=desc))


def _light_bloom(rgb, p, ctx):
    """Toonz: Light Bloom — gamma-lifted highlights blurred and added
    back (toonz.cpp in_paramsb: gamma/exposure/gain/radius)."""
    from ..util import luma
    from .blur import _gauss_kernel, sep_conv
    g = luma(rgb)
    # highlight threshold falls as exposure rises (exposure 1 -> 0.5)
    hi = jnp.maximum(g - 1.0 / (1.0 + p["exposure"]), 0.0)
    hi = hi ** (1.0 / jnp.maximum(p["gamma"], 0.1))
    radius = max(1, int(p["radius"] * 24))
    glow = sep_conv(hi[None], _gauss_kernel(radius))[0]
    return rgb + (glow * p["gain"])[None] * rgb.clip(0.2, 1.0)


def _paraffin(rgb, p, ctx):
    """Toonz: Paraffin — graduated tinted wash across the frame."""
    from ..util import ctx_grid
    h, w = rgb.shape[-2:]
    x, y = ctx_grid(ctx, h, w)
    th = p["angle"] * np.float32(2 * np.pi)
    t = x * jnp.cos(th) + y * jnp.sin(th)
    band = jnp.clip((t - p["offset"]) / jnp.maximum(p["softness"], 1e-3),
                    0.0, 1.0)
    tint = jnp.stack([band * p["red"], band * p["green"],
                      band * p["blue"]], 0)
    return rgb * (1.0 - band * p["density"])[None] \
        + tint * p["density"]


def _pencil_hatching(rgb, p, ctx):
    """Toonz: Pencil Hatching — darkness-driven diagonal strokes over a
    paper-white base."""
    from ..util import ctx_grid, luma
    h, w = rgb.shape[-2:]
    x, y = ctx_grid(ctx, h, w)
    g = luma(rgb)
    dark = 1.0 - g
    freq = 40.0 + p["density"] * 160.0
    h1 = jnp.sin((x + y) * freq) * 0.5 + 0.5
    h2 = jnp.sin((x - y) * freq) * 0.5 + 0.5
    stroke = jnp.where(dark > 0.33, jnp.minimum(h1, 1.0 - dark * 0.2), 1.0)
    stroke = jnp.where(dark > 0.66, jnp.minimum(stroke, h2), stroke)
    v = jnp.clip(stroke, 0.0, 1.0)
    out = jnp.stack([v, v, v], 0)
    return rgb + (out - rgb) * p["amount"]


def _coherent_noise(rgb, p, ctx):
    """Toonz: Coherent Noise — smooth value-noise overlay animated by tc
    (hash-based bilinear value noise; no gather)."""
    from ..util import ctx_grid
    h, w = rgb.shape[-2:]
    x, y = ctx_grid(ctx, h, w)
    cells = 4.0 + p["scale"] * 28.0
    gx, gy = x * cells, y * cells
    x0, y0 = jnp.floor(gx), jnp.floor(gy)
    fx, fy = gx - x0, gy - y0
    t = jnp.floor(ctx.tc * p["speed"] * 8.0)

    def hsh(ix, iy):
        s = jnp.sin(ix * 127.1 + iy * 311.7 + t * 74.7) * 43758.5453
        return s - jnp.floor(s)

    sx = fx * fx * (3.0 - 2.0 * fx)
    sy = fy * fy * (3.0 - 2.0 * fy)
    n = (hsh(x0, y0) * (1 - sx) + hsh(x0 + 1, y0) * sx) * (1 - sy) \
        + (hsh(x0, y0 + 1) * (1 - sx) + hsh(x0 + 1, y0 + 1) * sx) * sy
    return rgb + ((n - 0.5) * p["amount"])[None]


def _register_toonz():
    from ..host import Param
    _register_rgb("toonz_light_bloom", _light_bloom,
                  params=(Param("gamma", "num", 2.2, 0.1, 5.0),
                          Param("exposure", "num", 1.0, 0.125, 8.0),
                          Param("gain", "num", 1.0, 0.1, 10.0),
                          Param("radius", "num", 0.1, 0.01, 1.0)),
                  desc="highlight bloom (Toonz: Light Bloom)")
    _register_rgb("toonz_paraffin", _paraffin,
                  params=(Param("angle", "num", 0.25, 0.0, 1.0),
                          Param("offset", "num", 0.3, 0.0, 1.0),
                          Param("softness", "num", 0.4, 0.01, 1.0),
                          Param("density", "num", 0.5, 0.0, 1.0),
                          Param("red", "num", 1.0, 0.0, 1.0),
                          Param("green", "num", 0.9, 0.0, 1.0),
                          Param("blue", "num", 0.6, 0.0, 1.0)),
                  desc="graduated light wash (Toonz: Paraffin)")
    _register_rgb("toonz_pencil_hatching", _pencil_hatching,
                  params=(Param("density", "num", 0.3, 0.0, 1.0),
                          Param("amount", "num", 1.0, 0.0, 1.0)),
                  desc="pencil hatch strokes (Toonz: Pencil Hatching)")
    _register_rgb("toonz_coherent_noise", _coherent_noise,
                  params=(Param("scale", "num", 0.3, 0.0, 1.0),
                          Param("speed", "num", 1.0, 0.0, 8.0),
                          Param("amount", "num", 0.3, 0.0, 1.0)),
                  desc="animated smooth noise (Toonz: Coherent Noise)")


_register_toonz()


# -- deinterlace (reference deinterlace.script / cdata interlace flag) --------

def _deinterlace(rgb, p, ctx):
    """Linear-blend deinterlace: each row mixes with the mean of its
    neighbours, killing comb artefacts (the RFX deinterlace.script's
    ImageMagick -deinterlace analogue; mode via `amount`)."""
    up = jnp.concatenate([rgb[:, :1], rgb[:, :-1]], axis=1)
    down = jnp.concatenate([rgb[:, 1:], rgb[:, -1:]], axis=1)
    blended = (up + down) * 0.5
    return rgb + (blended - rgb) * (p["amount"] * 0.5)


def _register_deinterlace():
    from ..host import Param
    _register_rgb("deinterlace", _deinterlace,
                  params=(Param("amount", "num", 1.0, 0.0, 1.0),),
                  desc="linear-blend deinterlace")


_register_deinterlace()


# -- scribbler (gdk/scribbler.c) ----------------------------------------------

def _scribbler_process(ins, p, ctx):
    """gdk/scribbler.c: text overlaid on the INPUT frame with a foreground
    colour and an optional background box behind the text line; `mode`
    selects foreground only / background only / both (reference
    string_list). Text/size are static (host-rasterised, cached)."""
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    h, w = rgb.shape[-2:]
    mask = _text_mask_cached(str(p["text"]), w, h, max(8, int(p["size"])))
    m = jnp.asarray(mask[3]).astype(jnp.float32) / 255.0
    mode = int(p["mode"])
    out = rgb
    if mode != 0:  # background box (rows spanned by the text, full width)
        import numpy as np
        rows = mask[3].any(axis=1)
        if rows.any():
            y0, y1 = int(np.argmax(rows)), int(len(rows) - np.argmax(rows[::-1]))
            box = jnp.zeros((h, w), jnp.float32).at[max(y0 - 4, 0):
                                                    min(y1 + 4, h)].set(1.0)
            bg_col = jnp.stack([p["bg_red"], p["bg_green"],
                                p["bg_blue"]])[:, None, None]
            mb = (box * jnp.clip(p["bg_alpha"], 0.0, 1.0))[None]
            out = out * (1.0 - mb) + bg_col * mb
    if mode != 1:  # foreground text
        fg_col = jnp.stack([p["red"], p["green"], p["blue"]])[:, None, None]
        mf = (m * jnp.clip(p["fg_alpha"], 0.0, 1.0))[None]
        out = out * (1.0 - mf) + fg_col * mf
    return from_f01(join_alpha(out, al), lay)


register_filter(Filter(
    name="scribbler", process=_scribbler_process, in_channels=_ONE_IN,
    params=(Param("text", "string", "lives"),
            Param("size", "int", 32, 8, 256),
            Param("mode", "string_list", 0,
                  choices=("foreground only", "background only",
                           "foreground and background")),
            Param("red", "num", 1.0, 0.0, 1.0),
            Param("green", "num", 1.0, 0.0, 1.0),
            Param("blue", "num", 1.0, 0.0, 1.0),
            Param("fg_alpha", "num", 1.0, 0.0, 1.0),
            Param("bg_red", "num", 0.0, 0.0, 1.0),
            Param("bg_green", "num", 0.0, 0.0, 1.0),
            Param("bg_blue", "num", 0.0, 0.0, 1.0),
            Param("bg_alpha", "num", 0.5, 0.0, 1.0)),
    description="text + background box over input (gdk/scribbler.c)"))


# -- textfun (textfun.c): glyph-art -------------------------------------------

@functools.lru_cache(maxsize=4)
def _glyph_atlas(cell: int = 8):
    """(K, cell, cell) float32 glyph atlas sorted by ink coverage — the
    textfun.c bitmap-font analogue, rasterised once with PIL (falls back to
    a density-ramp of filled squares without PIL)."""
    ramp = " .:-=+*#%@"
    try:
        from PIL import Image, ImageDraw, ImageFont
        font = ImageFont.load_default()
        glyphs = []
        for ch in ramp:
            img = Image.new("L", (cell, cell), 0)
            ImageDraw.Draw(img).text((0, -2), ch, fill=255, font=font)
            glyphs.append(np.asarray(img, np.float32) / 255.0)
        atlas = np.stack(glyphs)
    except Exception:
        atlas = np.stack([np.full((cell, cell), i / (len(ramp) - 1.0),
                                  np.float32) for i in range(len(ramp))])
    # sort by actual coverage so index == brightness rank
    order = np.argsort(atlas.mean((1, 2)))
    return atlas[order]


def _textfun_process(ins, p, ctx):
    """textfun.c: the frame becomes text — each 8x8 block is replaced by
    the glyph whose ink density matches the block's luma. Modes
    (textfun.c:286): colour pixels / monochrome / greyscale / solid
    colours. The glyph pick is one gather from a (K,8,8) atlas; everything
    else is reshapes."""
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    h, w = rgb.shape[-2:]
    cell = 8
    hh, ww = h // cell, w // cell
    atlas = jnp.asarray(_glyph_atlas(cell))
    k = atlas.shape[0]
    crop = rgb[:, : hh * cell, : ww * cell]
    blocks = crop.reshape(3, hh, cell, ww, cell)
    mean_col = blocks.mean((2, 4))                      # (3, hh, ww)
    g = luma(mean_col)
    thresh = p["threshold"]
    idx = jnp.clip((g * k).astype(jnp.int32), 0, k - 1)
    glyph = jnp.take(atlas, idx, axis=0)                # (hh, ww, c, c)
    canvas = glyph.transpose(0, 2, 1, 3).reshape(hh * cell, ww * cell)
    gate = jnp.repeat(jnp.repeat((g >= thresh).astype(jnp.float32),
                                 cell, 0), cell, 1)
    canvas = canvas * gate
    mode = int(p["mode"])
    if mode == 0:    # colour pixels: glyphs in the block's mean colour
        col = jnp.repeat(jnp.repeat(mean_col, cell, 1), cell, 2)
        out = col * canvas[None]
    elif mode == 1:  # monochrome
        out = jnp.broadcast_to(canvas[None], (3,) + canvas.shape)
    elif mode == 2:  # greyscale: glyph scaled by block luma
        gl = jnp.repeat(jnp.repeat(g, cell, 0), cell, 1)
        out = jnp.broadcast_to((canvas * gl)[None], (3,) + canvas.shape)
    else:            # solid colours: quantised block colour, no glyph shape
        col = jnp.repeat(jnp.repeat(jnp.round(mean_col * 4) / 4, cell, 1),
                         cell, 2)
        out = col * gate[None]
    # pad odd geometry back
    ph, pw = h - out.shape[-2], w - out.shape[-1]
    if ph or pw:
        out = jnp.pad(out, ((0, 0), (0, ph), (0, pw)))
    return from_f01(join_alpha(jnp.clip(out, 0.0, 1.0), al), lay)


register_filter(Filter(
    name="textfun", process=_textfun_process, in_channels=_ONE_IN,
    params=(Param("threshold", "num", 0.1, 0.0, 1.0),
            Param("mode", "string_list", 0,
                  choices=("colour pixels", "monochrome", "greyscale",
                           "solid colours"))),
    description="frame as glyph-art text (textfun.c)"))


# -- photo_censor --------------------------------------------------------------

def _photo_censor_process(ins, p, ctx):
    """Censor a rectangular region: pixelate (block mosaic), black bar, or
    invert. The pixelation is a nearest-block sample (every pixel reads its
    block's top-left corner) — one gather-free remap that XLA fuses.
    Region coordinates are relative (0..1) so the filter is
    geometry-independent; pairs with the framedraw rect widget."""
    lay = ins[0]
    a = to_f01(lay)
    rgb, al = split_alpha(a)
    h, w = rgb.shape[-2:]
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((yy >= p["top"] * h) & (yy < p["bottom"] * h)
           & (xx >= p["left"] * w) & (xx < p["right"] * w))
    mode = int(p["mode"])
    if mode == 1:            # black bar
        repl = jnp.zeros_like(rgb)
    elif mode == 2:          # invert
        repl = 1.0 - rgb
    else:                    # pixelate
        blk = max(2, int(p["block"]))
        ys = (jnp.arange(h) // blk) * blk
        xs = (jnp.arange(w) // blk) * blk
        repl = rgb[:, ys][:, :, xs]
    out = jnp.where(box[None], repl, rgb)
    return from_f01(join_alpha(out, al), lay)


register_filter(Filter(
    name="photo_censor", process=_photo_censor_process, in_channels=_ONE_IN,
    params=(Param("left", "num", 0.25, 0.0, 1.0),
            Param("top", "num", 0.25, 0.0, 1.0),
            Param("right", "num", 0.75, 0.0, 1.0),
            Param("bottom", "num", 0.75, 0.0, 1.0),
            Param("mode", "string_list", 0,
                  choices=("pixelate", "black", "invert")),
            Param("block", "int", 16, 2, 128)),
    description="censor a region: pixelate / black bar / invert"))


# -- xeffect (graphic novel) --------------------------------------------------

def _xeffect_process(ins, p, ctx):
    """Graphic-novel look (weed-plugins/scripts/xeffect.script): luma-edge
    neighbour count routes each pixel to source / black / white. The
    reference nine_fill splat on non-edge pixels becomes a plain source
    copy here (a per-pixel 3x3 write race vectorises to nothing useful);
    edge pixels quantise to ink (dark -> black, bright -> white,
    mid -> source)."""
    lay = ins[0]
    a, alpha = split_alpha(to_f01(lay))
    rgb = a * 255.0
    y100 = (0.299 * rgb[0] + 0.587 * rgb[1] + 0.114 * rgb[2]) * 100.0
    thr = jnp.asarray(p["threshold"], jnp.float32)
    pad = jnp.pad(y100, 1, mode="edge")
    nbr = jnp.zeros_like(y100)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            sh = pad[1 + dy: pad.shape[0] - 1 + dy,
                     1 + dx: pad.shape[1] - 1 + dx]
            nbr = nbr + (jnp.abs(sh - y100) > thr)
    edge = (nbr >= 2) & (nbr <= 5)
    black = jnp.zeros_like(rgb)
    white = jnp.full_like(rgb, 255.0)
    ink = jnp.where(y100 < 12500.0, black,
                    jnp.where(y100 > 20000.0, white, rgb))
    out = jnp.where(edge[None], ink, rgb)
    return from_f01(join_alpha(out / 255.0, alpha), lay)


register_filter(Filter(
    name="xeffect", process=_xeffect_process, in_channels=_ONE_IN,
    params=(Param("threshold", "num", 10000.0, 1000.0, 25000.0),),
    description="graphic novel: luma-edge ink quantise "
                "(scripts/xeffect.script)"))


# -- haip (autonomous painter) ------------------------------------------------

def _haip_process(ins, p, ctx):
    """haip.c: wurms start at random positions each frame and random-walk
    WLEN steps, smearing slightly brightened source colour in 3x3 blocks
    along their trails. Vectorised: all wurm paths at once (starts +
    cumulative +-1 steps), one scatter of N*WLEN*9 points; randomness is
    the integer frame-salted hash (deterministic, path-identical)."""
    import jax

    lay = ins[0]
    a, alpha = split_alpha(to_f01(lay))
    src = a * 255.0
    c, h, w = src.shape
    n = 48 * 1                               # num_wurms * WMULT ceiling
    wlen = 32                                # haip.c WLEN
    amount = jnp.clip(jnp.asarray(p["wurms"], jnp.float32) / 100.0, 0, 1)
    key = jax.random.fold_in(jax.random.PRNGKey(1913),
                             jnp.asarray(ctx.frame, jnp.int32))
    k1, k1b, k2, k3 = jax.random.split(key, 4)
    sx = jax.random.randint(k1, (n, 1), 1, w - 1)
    sy = jax.random.randint(k1b, (n, 1), 1, h - 1)
    steps = jax.random.randint(k2, (2, n, wlen), -1, 2)
    xs = jnp.clip(sx + jnp.cumsum(steps[0], axis=1), 1, w - 2)
    ys = jnp.clip(sy + jnp.cumsum(steps[1], axis=1), 1, h - 2)
    # wurm slots beyond the active count park on their start pixel
    active = (jnp.arange(n)[:, None] < amount * n)
    bright = 1.0 + 0.05 * (jax.random.uniform(k3, (n, wlen)) < 0.01)
    colour = src[:, ys, xs] * bright[None]
    out = src
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy = jnp.clip(ys + dy, 0, h - 1)
            xx = jnp.clip(xs + dx, 0, w - 1)
            paint = jnp.where(active[None], colour, out[:, yy, xx])
            out = out.at[:, yy, xx].set(paint)
    return from_f01(join_alpha(jnp.clip(out, 0, 255) / 255.0, alpha),
                    lay)


register_filter(Filter(
    name="haip", process=_haip_process, in_channels=_ONE_IN,
    params=(Param("wurms", "num", 80.0, 0.0, 100.0),),
    description="autonomous painting wurms smear brightened source "
                "trails (haip.c)"))
