"""Colour-manipulation filters.

TPU re-expressions of the reference's colour plugins (`RGBdelay.c` channel
mixing, `softlight.c`, `fg_bg_removal.c`, `negate.c`, `colorkey.c`, plus the
ubiquitous brightness/contrast/saturation RFX scripts). All pure elementwise
VPU work that XLA fuses into one pass per chain.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...constants import Palette
from ..host import ChannelTemplate, Filter, Param, register_filter
from ..util import from_f01, join_alpha, luma, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)
_ONE_IN = (ChannelTemplate("in", _RGBX),)


def _rgb_filter(name, fn, params=(), desc=""):
    """Helper: filter over the (3,H,W) [0,1] rgb view."""
    def process(ins, p, ctx):
        lay = ins[0]
        a = to_f01(lay)
        rgb, al = split_alpha(a)
        out = jnp.clip(fn(rgb, p, ctx), 0.0, 1.0)
        return from_f01(join_alpha(out, al), lay)
    return register_filter(Filter(name=name, process=process,
                                  in_channels=_ONE_IN, params=tuple(params),
                                  description=desc))


# -- basics ------------------------------------------------------------------

_rgb_filter("negate", lambda rgb, p, c: 1.0 - rgb, desc="invert RGB")

_rgb_filter(
    "brightness_contrast",
    lambda rgb, p, c: (rgb - 0.5) * p["contrast"] + 0.5 + p["brightness"],
    params=(Param("brightness", "num", 0.0, -1.0, 1.0),
            Param("contrast", "num", 1.0, 0.0, 4.0)),
    desc="linear brightness/contrast")

_rgb_filter(
    "gamma_adjust",
    lambda rgb, p, c: jnp.maximum(rgb, 0.0) ** p["gamma"],
    params=(Param("gamma", "num", 1.0, 0.1, 5.0),),
    desc="power-law gamma tweak")


def _saturation(rgb, p, c):
    g = luma(rgb)[None]
    return g + (rgb - g) * p["saturation"]


_rgb_filter("saturation", _saturation,
            params=(Param("saturation", "num", 1.0, 0.0, 4.0),),
            desc="saturation about BT.601 luma")


def _hue_rotate(rgb, p, c):
    """Rotate hue by angle (YIQ-space rotation, constant-luma).

    Channel-wise scalar coefficients, NOT an einsum with a traced-scalar
    matrix: Mosaic (pallas) rejects captured-const einsums and traced-
    scalar stacking (the sepia lesson, PERF_NOTES.md), and XLA fuses both
    forms identically — this form runs inside the fused sweep."""
    th = p["angle"] * np.float32(2.0 * np.pi)
    cs, sn = jnp.cos(th), jnp.sin(th)
    m0 = np.array([[0.213, 0.715, 0.072]] * 3, np.float32)
    m1 = np.array([[0.787, -0.715, -0.072],
                   [-0.213, 0.285, -0.072],
                   [-0.213, -0.715, 0.928]], np.float32)
    m2 = np.array([[-0.213, -0.715, 0.928],
                   [0.143, 0.140, -0.283],
                   [-0.787, 0.715, 0.072]], np.float32)
    r, g, b = rgb[0], rgb[1], rgb[2]
    chans = []
    for i in range(3):
        coef = [np.float32(m0[i, j]) + cs * np.float32(m1[i, j])
                + sn * np.float32(m2[i, j]) for j in range(3)]
        chans.append(coef[0] * r + coef[1] * g + coef[2] * b)
    return jnp.stack(chans)


_rgb_filter("hue_rotate", _hue_rotate,
            params=(Param("angle", "num", 0.0, 0.0, 1.0),),
            desc="rotate hue (0..1 = full turn)")

_rgb_filter(
    "colour_balance",
    # channel-wise (not a stacked scalar gain vector): Mosaic cannot shape-
    # cast stacked traced scalars, and XLA fuses both forms identically
    lambda rgb, p, c: jnp.stack([rgb[0] * p["red"], rgb[1] * p["green"],
                                 rgb[2] * p["blue"]], 0),
    params=(Param("red", "num", 1.0, 0.0, 4.0),
            Param("green", "num", 1.0, 0.0, 4.0),
            Param("blue", "num", 1.0, 0.0, 4.0)),
    desc="per-channel gain")


def _levels(rgb, p, c):
    lo, hi = p["black"], p["white"]
    x = (rgb - lo) / jnp.maximum(hi - lo, 1e-4)
    return jnp.clip(x, 0.0, 1.0) ** p["gamma"]


_rgb_filter("levels", _levels,
            params=(Param("black", "num", 0.0, 0.0, 1.0),
                    Param("white", "num", 1.0, 0.0, 1.0),
                    Param("gamma", "num", 1.0, 0.1, 5.0)),
            desc="input levels + gamma")

_rgb_filter(
    "greyscale",
    lambda rgb, p, c: jnp.broadcast_to(luma(rgb)[None], rgb.shape),
    desc="BT.601 greyscale")


def _sepia(rgb, p, c):
    # channel-wise with scalar weights (no constant-matrix einsum: scalar
    # constants fold into the jaxpr, arrays become captured consts that
    # pallas kernels reject)
    r, g, b = rgb[0], rgb[1], rgb[2]
    tinted = jnp.stack([
        r * np.float32(0.393) + g * np.float32(0.769)
        + b * np.float32(0.189),
        r * np.float32(0.349) + g * np.float32(0.686)
        + b * np.float32(0.168),
        r * np.float32(0.272) + g * np.float32(0.534)
        + b * np.float32(0.131)], 0)
    return rgb + (tinted - rgb) * p["amount"]


_rgb_filter("sepia", _sepia,
            params=(Param("amount", "num", 1.0, 0.0, 1.0),),
            desc="sepia tone")


def _posterize(rgb, p, c):
    n = jnp.maximum(p["levels"], 2.0)
    return jnp.floor(rgb * (n - 1.0) + 0.5) / (n - 1.0)


_rgb_filter("posterize", _posterize,
            params=(Param("levels", "num", 4.0, 2.0, 32.0),),
            desc="quantize colour levels")

_rgb_filter(
    "solarize",
    lambda rgb, p, c: jnp.where(rgb > p["threshold"], 1.0 - rgb, rgb),
    params=(Param("threshold", "num", 0.5, 0.0, 1.0),),
    desc="invert above threshold")

_rgb_filter(
    "threshold",
    lambda rgb, p, c: (luma(rgb)[None] > p["threshold"]).astype(jnp.float32)
    * jnp.ones_like(rgb),
    params=(Param("threshold", "num", 0.5, 0.0, 1.0),),
    desc="binary luma threshold")


def _softlight(rgb, p, c):
    """softlight.c: image soft-lit by its own luma."""
    g = luma(rgb)[None]
    lit = jnp.where(g <= 0.5,
                    rgb * (g + 0.5),
                    1.0 - (1.0 - rgb) * (1.5 - g))
    return rgb + (lit - rgb) * p["amount"]


_rgb_filter("softlight", _softlight,
            params=(Param("amount", "num", 1.0, 0.0, 1.0),),
            desc="soft-light self-illumination")


def _vignette(rgb, p, c):
    from ..util import ctx_grid
    h, w = rgb.shape[-2:]
    x, y = ctx_grid(c, h, w, centered=True)
    r2 = x * x + y * y
    falloff = jnp.exp(-r2 * p["strength"] * 2.0)
    return rgb * (1.0 - p["amount"] * (1.0 - falloff))[None]


_rgb_filter("vignette", _vignette,
            params=(Param("amount", "num", 0.8, 0.0, 1.0),
                    Param("strength", "num", 1.0, 0.1, 4.0)),
            desc="radial darkening")


def _tint(rgb, p, c):
    # channel-wise: see colour_balance (Mosaic scalar-stack constraint)
    g = luma(rgb)
    tinted = jnp.stack([g * p["red"], g * p["green"], g * p["blue"]], 0)
    return rgb + (tinted - rgb) * p["amount"]


_rgb_filter("tint", _tint,
            params=(Param("amount", "num", 1.0, 0.0, 1.0),
                    Param("red", "num", 1.0, 0.0, 1.0),
                    Param("green", "num", 0.8, 0.0, 1.0),
                    Param("blue", "num", 0.5, 0.0, 1.0)),
            desc="tint greyscale with a colour")


def _white_balance(rgb, p, c):
    """auto white balance toward grey-world, amount-weighted."""
    means = jnp.mean(rgb, axis=(-2, -1), keepdims=True)
    grey = jnp.mean(means)
    gain = grey / jnp.maximum(means, 1e-4)
    return rgb * (1.0 + (gain - 1.0) * p["amount"])


_rgb_filter("white_balance", _white_balance,
            params=(Param("amount", "num", 1.0, 0.0, 1.0),),
            desc="grey-world auto white balance")


# -- RFX colour_replace.script / modulate.script backends ---------------------

def _colour_replace(rgb, p, c):
    """colour_replace.script: pixels within `tolerance` of (red,green,blue)
    become (red2,green2,blue2) (ImageMagick -opaque with -fuzz).
    Channel-wise (no traced-scalar stacking) so it runs in the fused
    sweep."""
    d2 = ((rgb[0] - p["red"]) ** 2 + (rgb[1] - p["green"]) ** 2
          + (rgb[2] - p["blue"]) ** 2) * np.float32(1.0 / 3.0)
    m = (jnp.sqrt(d2) <= p["tolerance"]).astype(jnp.float32)
    inv = 1.0 - m
    return jnp.stack([rgb[0] * inv + p["red2"] * m,
                      rgb[1] * inv + p["green2"] * m,
                      rgb[2] * inv + p["blue2"] * m])


_rgb_filter("colour_replace", _colour_replace,
            params=(Param("red", "num", 0.0, 0.0, 1.0),
                    Param("green", "num", 0.0, 0.0, 1.0),
                    Param("blue", "num", 0.0, 0.0, 1.0),
                    Param("red2", "num", 1.0, 0.0, 1.0),
                    Param("green2", "num", 1.0, 0.0, 1.0),
                    Param("blue2", "num", 1.0, 0.0, 1.0),
                    Param("tolerance", "num", 0.1, 0.0, 1.0)),
            desc="replace a colour within tolerance (colour_replace.script)")


def _modulate(rgb, p, c):
    """modulate.script / ImageMagick -modulate: combined brightness,
    saturation, hue scaling (each 1.0 = unchanged; hue 1.0 = no rotation,
    range 0..2 maps to a full -180..+180 turn)."""
    out = rgb * p["brightness"]
    g = luma(out)
    out = g[None] + (out - g[None]) * p["saturation"]
    # hue rotation about the luma axis (YIQ-style rotation matrix)
    th = (p["hue"] - 1.0) * np.float32(np.pi)
    cs, sn = jnp.cos(th), jnp.sin(th)
    y = luma(out)
    i = 0.596 * out[0] - 0.274 * out[1] - 0.322 * out[2]
    q = 0.211 * out[0] - 0.523 * out[1] + 0.312 * out[2]
    i, q = i * cs - q * sn, i * sn + q * cs
    r = y + 0.956 * i + 0.621 * q
    gg = y - 0.272 * i - 0.647 * q
    b = y - 1.106 * i + 1.703 * q
    return jnp.stack([r, gg, b], 0)


_rgb_filter("modulate", _modulate,
            params=(Param("brightness", "num", 1.0, 0.0, 2.0),
                    Param("saturation", "num", 1.0, 0.0, 2.0),
                    Param("hue", "num", 1.0, 0.0, 2.0)),
            desc="combined brightness/saturation/hue (modulate.script)")


# -- posterise (exact script semantics) ---------------------------------------

def _posterise_process(ins, p, ctx):
    """Bit-plane posterise with the reference's exact semantics
    (scripts/posterise.script): keep the top `levels` bits of each RGB
    byte (levmask = 128 + 128>>1 + ... for `levels` terms); alpha passes
    through untouched. Pure integer AND on the u8 planes — no f01
    round-trip, so the output is bit-exact with the reference."""
    lay = ins[0]
    arr = lay.planes[0]
    levels = max(1, min(int(p["levels"]), 8))
    if jnp.issubdtype(arr.dtype, jnp.integer):
        m = 0
        for i in range(levels):
            m |= 128 >> i
        rgb = arr[:3] & arr.dtype.type(m)
    else:
        # float lane (graph templates carry f01 bf16 planes): keeping the
        # top `levels` bits == uniform quantisation with step q=2^(8-levels)
        # (v & mask == floor(v/q)*q) — arithmetically identical, f32 math
        q = np.float32(1 << (8 - levels))
        v = arr[:3].astype(jnp.float32) * np.float32(255.0)
        rgb = (jnp.floor(v / q) * q * np.float32(1 / 255.0)).astype(arr.dtype)
    out = jnp.concatenate([rgb, arr[3:4]], 0) if arr.shape[0] == 4 else rgb
    return lay.replace(planes=(out,))


register_filter(Filter(
    name="posterise", process=_posterise_process, in_channels=_ONE_IN,
    params=(Param("levels", "int", 1, 1, 8),),
    description="reduce colour levels by bit-plane mask "
                "(scripts/posterise.script, bit-exact)"))


# -- palette_mapper ------------------------------------------------------------

_FIXED_PALETTES = {
    # name -> (K, 3) float [0,1] rows. Classic machine palettes.
    "mono": np.array([[0, 0, 0], [255, 255, 255]], np.float32) / 255.0,
    "gameboy": np.array([[15, 56, 15], [48, 98, 48], [139, 172, 15],
                         [155, 188, 15]], np.float32) / 255.0,
    "cga": np.array([[0, 0, 0], [85, 255, 255], [255, 85, 255],
                     [255, 255, 255]], np.float32) / 255.0,
    "ega16": np.array(
        [[0, 0, 0], [0, 0, 170], [0, 170, 0], [0, 170, 170],
         [170, 0, 0], [170, 0, 170], [170, 85, 0], [170, 170, 170],
         [85, 85, 85], [85, 85, 255], [85, 255, 85], [85, 255, 255],
         [255, 85, 85], [255, 85, 255], [255, 255, 85],
         [255, 255, 255]], np.float32) / 255.0,
    "c64": np.array(
        [[0, 0, 0], [255, 255, 255], [136, 57, 50], [103, 182, 189],
         [139, 63, 150], [85, 160, 73], [64, 49, 141], [191, 206, 114],
         [139, 84, 41], [87, 66, 0], [184, 105, 98], [80, 80, 80],
         [120, 120, 120], [148, 224, 137], [120, 105, 196],
         [159, 159, 159]], np.float32) / 255.0,
}


def _palette_mapper(rgb, p, c):
    """Map every pixel to the nearest colour of a fixed machine palette
    (nearest-neighbour in RGB; the distance dot-products ride the MXU as
    one (HW,3)x(3,K) matmul). `strength` blends the mapped image back
    over the original."""
    name = list(_FIXED_PALETTES)[int(p["palette"])]
    pal = jnp.asarray(_FIXED_PALETTES[name])            # (K, 3)
    # argmin_k |x - c_k|^2 = argmin_k (|c_k|^2 - 2 x.c_k)
    dots = jnp.einsum("chw,kc->khw", rgb, pal)          # MXU
    k = jnp.argmin((pal * pal).sum(1)[:, None, None] - 2.0 * dots, axis=0)
    mapped = jnp.moveaxis(pal[k], -1, 0)                # (3, H, W)
    s = jnp.clip(p["strength"], 0.0, 1.0)
    return rgb * (1.0 - s) + mapped * s


_rgb_filter("palette_mapper", _palette_mapper,
            params=(Param("palette", "string_list", 0,
                          choices=tuple(_FIXED_PALETTES)),
                    Param("strength", "num", 1.0, 0.0, 1.0)),
            desc="map colours to the nearest entry of a classic fixed "
                 "palette (mono/gameboy/cga/ega16/c64)")
