"""puretext — animated text modes (gdk/puretext.c).

TPU re-expression of the reference's 2,900-line pango/cairo text animator
(`lives-plugins/weed-plugins/gdk/puretext.c`): the seven op modes
(PT_SPIRAL_TEXT, PT_SPINNING_LETTERS, PT_LETTER_STARFIELD, PT_WORD_COALESCE,
PT_TERMINAL, PT_WORD_SLIDE, PT_BOUNCE — puretext.c:89-98) re-designed as
one jitted sprite compositor:

- HOST (trace time, cached): each glyph of the text is rasterised once with
  PIL into a fixed-size cell; spinning mode also pre-rasterises K rotation
  variants (rotation on device would need gathers — the atlas trades a few
  hundred KB of VMEM for a pure dynamic-slice compositor). Line-wrapped
  layout positions, word and line indices are computed per geometry.
- DEVICE (per frame, traced): every letter's position / visibility / variant
  is closed-form arithmetic in the timecode (no data-dependent control
  flow), and the letters composite onto the frame with a `lax.scan` of
  dynamic_slice -> blend -> dynamic_update_slice. The whole animation is
  ONE XLA computation per config; tc is a traced scalar so scrubbing and
  rate changes never recompile.

Deterministic per-letter randomness uses the integer murmur-style hash
(CLAUDE.md: no transcendental hashes), seeded by letter index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import Palette
from ..host import ChannelTemplate, Filter, Param, register_filter
from ..util import from_f01, join_alpha, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)
_ONE_IN = (ChannelTemplate("in", _RGBX),)

MODES = ("spiral_text", "spinning_letters", "letter_starfield",
         "word_coalesce", "terminal", "word_slide", "bounce")
_N_ROT = 16  # rotation variants for spinning_letters


def _hash01(i: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic [0,1) per-letter hash (host-side, numpy)."""
    v = (i.astype(np.int64) * 73856093) ^ (salt * 19349663)
    v = ((v ^ (v >> 13)) * 0x5BD1E995) & 0xFFFFFFFF
    v = v ^ (v >> 15)
    return (v & 0xFFFF).astype(np.float32) / 65536.0


@functools.lru_cache(maxsize=16)
def _text_atlas(text: str, size: int, w: int, h: int, rotations: bool):
    """Glyph atlas + layout for `text` at font `size` in a w*h frame.

    Returns (atlas (N,K,c,c) f32 masks, lx, ly, word_idx, line_idx) as
    numpy arrays; positions are letter-cell top-left for the line-wrapped
    centred layout. Spaces advance the cursor but emit no sprite.
    """
    # headroom so rotations never clip, capped so the sprite always fits
    # inside the frame (dynamic_slice sizes must be <= operand shape)
    cell = min(max(8, int(size * 1.6)), h, w)
    size = min(size, max(4, int(cell / 1.6)))
    text = text[:256] or "?"
    try:
        from PIL import Image, ImageDraw, ImageFont
        try:
            font = ImageFont.truetype(
                "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", size)
        except Exception:
            font = ImageFont.load_default()

        def raster(ch):
            img = Image.new("L", (cell, cell), 0)
            d = ImageDraw.Draw(img)
            try:
                bb = d.textbbox((0, 0), ch, font=font)
                ox = (cell - (bb[2] - bb[0])) // 2 - bb[0]
                oy = (cell - (bb[3] - bb[1])) // 2 - bb[1]
            except Exception:
                ox = oy = cell // 4
            d.text((ox, oy), ch, fill=255, font=font)
            return img
    except Exception:  # PIL-less fallback: filled blocks
        Image = None

        def raster(ch):
            a = np.zeros((cell, cell), np.uint8)
            a[cell // 4: 3 * cell // 4, cell // 4: 3 * cell // 4] = 255
            return a

    adv = int(size * 0.62)          # monospacedish advance
    line_h = int(size * 1.25)
    max_cols = max(1, (w - cell) // adv)

    # word-wrapped layout
    glyphs, lx, ly, widx, lidx = [], [], [], [], []
    col = line = word = 0
    for ch in text:
        if ch == "\n":
            line += 1; col = 0; word += 1
            continue
        if ch == " ":
            col += 1
            if col >= max_cols:
                line += 1; col = 0
            word += 1
            continue
        if col >= max_cols:
            line += 1; col = 0
        glyphs.append(ch)
        lx.append(col * adv)
        ly.append(line * line_h)
        widx.append(word)
        lidx.append(line)
        col += 1
    if not glyphs:
        glyphs, lx, ly, widx, lidx = ["?"], [0], [0], [0], [0]
    n_lines = line + 1
    # centre the block
    lx = np.asarray(lx, np.float32)
    ly = np.asarray(ly, np.float32)
    for li in range(n_lines):
        sel = np.asarray(lidx) == li
        if sel.any():
            lx[sel] += (w - (lx[sel].max() + adv)) / 2.0 - lx[sel].min() / 2.0
    ly += (h - n_lines * line_h) / 2.0

    K = _N_ROT if rotations else 1
    atlas = np.zeros((len(glyphs), K, cell, cell), np.float32)
    for gi, ch in enumerate(glyphs):
        img = raster(ch)
        if K == 1 or Image is None:
            base = np.asarray(img, np.float32) / 255.0
            atlas[gi, :] = base[None]
        else:
            for k in range(K):
                rot = img.rotate(k * 360.0 / K, resample=Image.BILINEAR)
                atlas[gi, k] = np.asarray(rot, np.float32) / 255.0
    return (atlas, lx, ly, np.asarray(widx, np.float32),
            np.asarray(lidx, np.float32))


def _positions(mode: int, t, lx, ly, widx, rnd, rnd2, n, w, h, cell, speed):
    """Per-letter (px, py, alpha, variant_f01) as traced functions of t.

    Each branch mirrors one puretext.c op mode's motion (cited per line);
    all are closed-form in t — pure VPU arithmetic, no control flow.
    """
    i = jnp.arange(n, dtype=jnp.float32)
    cx, cy = (w - cell) / 2.0, (h - cell) / 2.0
    one = jnp.ones_like(i)
    var = jnp.zeros_like(i)
    if mode == 0:      # spiral_text (puretext.c:2048 Archimedean unwind)
        prog = jnp.clip(t * speed * 0.25, 0.0, 1.0)
        theta = i * 0.55 - t * speed * 0.6
        r = (i + 3.0) / (n + 3.0) * jnp.minimum(w, h) * 0.45 * prog
        px = cx + r * jnp.cos(theta)
        py = cy + r * jnp.sin(theta)
        alpha = one * (prog > (i / (n + 1.0)))
    elif mode == 1:    # spinning_letters (puretext.c:1952): layout + rot
        px, py = lx, ly
        alpha = one
        var = jnp.mod(t * speed * 1.5 + i * 0.13, 1.0)
    elif mode == 2:    # letter_starfield (puretext.c:1614): radial fly-out
        ang = rnd * np.float32(2 * np.pi)
        d = jnp.mod(t * speed * 0.4 + rnd2, 1.0)
        rad = d * jnp.minimum(w, h) * 0.7
        px = cx + jnp.cos(ang) * rad
        py = cy + jnp.sin(ang) * rad
        alpha = jnp.clip(d * 4.0, 0.0, 1.0) * jnp.clip((1.0 - d) * 4.0, 0.0,
                                                       1.0)
    elif mode == 3:    # word_coalesce (puretext.c:1248): random -> layout
        s = jnp.clip(t * speed * 0.8 - widx * 0.35, 0.0, 1.0)
        s = s * s * (3.0 - 2.0 * s)  # smoothstep
        px = rnd * (w - cell) * (1.0 - s) + lx * s
        py = rnd2 * (h - cell) * (1.0 - s) + ly * s
        alpha = jnp.clip(t * speed * 0.8 - widx * 0.35 + 0.3, 0.0, 1.0)
    elif mode == 4:    # terminal (puretext.c:1746): typed reveal
        px, py = lx, ly
        alpha = (i < t * speed * 8.0).astype(jnp.float32)
    elif mode == 5:    # word_slide (puretext.c:1346): words slide in
        s = jnp.clip(t * speed * 1.2 - widx * 0.5, 0.0, 1.0)
        s = s * s * (3.0 - 2.0 * s)
        side = jnp.where(jnp.mod(widx, 2.0) < 1.0, -float(cell) * 2.0,
                         float(w) + cell)
        px = side * (1.0 - s) + lx * s
        py = ly
        alpha = (s > 0.0).astype(jnp.float32)
    else:              # bounce (puretext.c:1453): damped vertical bounce
        px = lx
        phase = rnd * np.float32(np.pi)
        amp = (h * 0.5) * jnp.exp(-t * 0.45)
        py = ly - jnp.abs(jnp.cos(t * speed * 3.0 + phase)) * amp
        alpha = one
    return px, py, alpha, var


def _puretext_process(ins, p, ctx):
    lay = ins[0]
    arr = to_f01(lay)
    rgb, al = split_alpha(arr)
    h, w = rgb.shape[-2:]
    mode = int(p["mode"])
    atlas_np, lx_np, ly_np, widx_np, _ = _text_atlas(
        str(p["text"]), max(8, int(p["size"])), w, h, rotations=(mode == 1))
    n, K, cell, _ = atlas_np.shape
    atlas = jnp.asarray(atlas_np)
    lx = jnp.asarray(lx_np)
    ly = jnp.asarray(ly_np)
    widx = jnp.asarray(widx_np)
    idx = np.arange(n)
    rnd = jnp.asarray(_hash01(idx, 11))
    rnd2 = jnp.asarray(_hash01(idx, 97))

    t = jnp.asarray(ctx.tc, jnp.float32)
    px, py, alpha, var = _positions(mode, t, lx, ly, widx, rnd, rnd2,
                                    n, w, h, cell, p["speed"])
    # letters fully outside the frame vanish instead of clamping at edges
    inside = ((px > -cell) & (px < w) & (py > -cell) & (py < h)) \
        .astype(jnp.float32)
    alpha = alpha * inside
    pxi = jnp.clip(px.astype(jnp.int32), 0, w - cell)
    pyi = jnp.clip(py.astype(jnp.int32), 0, h - cell)
    vki = jnp.clip((var * K).astype(jnp.int32), 0, K - 1)

    colour = jnp.stack([p["red"], p["green"], p["blue"]]) \
        .astype(rgb.dtype)[:, None, None]

    def paint(canvas, letter):
        gi, k, x, y, a = letter
        sprite = jax.lax.dynamic_slice(
            atlas, (gi, k, 0, 0), (1, 1, cell, cell))[0, 0].astype(
                canvas.dtype)
        m = (sprite * a)[None]
        patch = jax.lax.dynamic_slice(canvas, (0, y, x), (3, cell, cell))
        patch = patch * (1.0 - m) + colour * m
        return jax.lax.dynamic_update_slice(canvas, patch, (0, y, x)), None

    letters = (jnp.arange(n, dtype=jnp.int32), vki, pxi, pyi,
               alpha.astype(rgb.dtype))
    out, _ = jax.lax.scan(paint, rgb, letters)
    return from_f01(join_alpha(out, al), lay)


register_filter(Filter(
    name="puretext", process=_puretext_process, in_channels=_ONE_IN,
    params=(Param("text", "string", "pure text"),
            Param("mode", "string_list", 4, choices=MODES),
            Param("size", "int", 48, 8, 200),
            Param("speed", "num", 1.0, 0.05, 10.0),
            Param("red", "num", 1.0, 0.0, 1.0),
            Param("green", "num", 1.0, 0.0, 1.0),
            Param("blue", "num", 1.0, 0.0, 1.0)),
    description="animated text over video: 7 motion modes "
                "(gdk/puretext.c PT_* op modes)"))
