"""Text rendering + subtitles (reference `src/pangotext.c`; .srt/.sub
load/save `src/clip_load_save.c:35,1752`).

Text is rasterised host-side with PIL (the pango/cairo replacement) into an
RGBA mask once per string/style, then composited on-device — so animated
playback never re-rasterises, it just re-blends.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .constants import Palette
from .layer import Layer

try:
    from PIL import Image, ImageDraw, ImageFont
    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False


def render_text_mask(text: str, width: int, height: int,
                     size: int = 32, colour=(255, 255, 255),
                     halign: str = "center", valign: str = "bottom",
                     margin: int = 16, font: str = "") -> np.ndarray:
    """Rasterise text to an (4, H, W) uint8 RGBA overlay. `font` is a
    truetype file name/path (the reference's fontchooser special,
    paramspecial.c); empty falls back to DejaVu then PIL's default."""
    if not HAVE_PIL:
        raise RuntimeError("PIL required for text rendering")
    img = Image.new("RGBA", (width, height), (0, 0, 0, 0))
    draw = ImageDraw.Draw(img)
    fnt = None
    if font:
        for cand in (font, f"{font}.ttf"):
            try:
                fnt = ImageFont.truetype(cand, size)
                break
            except Exception:
                pass
    if fnt is None:
        try:
            fnt = ImageFont.truetype("DejaVuSans-Bold.ttf", size)
        except Exception:
            fnt = ImageFont.load_default()
    font = fnt
    lines = text.split("\n")
    line_h = size + 4
    total_h = line_h * len(lines)
    if valign == "bottom":
        y0 = height - margin - total_h
    elif valign == "top":
        y0 = margin
    else:
        y0 = (height - total_h) // 2
    for i, line in enumerate(lines):
        bbox = draw.textbbox((0, 0), line, font=font)
        tw = bbox[2] - bbox[0]
        if halign == "center":
            x = (width - tw) // 2
        elif halign == "left":
            x = margin
        else:
            x = width - margin - tw
        y = y0 + i * line_h
        # outline for legibility (pangotext draws shadow/outline too)
        for dx, dy in ((-2, 0), (2, 0), (0, -2), (0, 2)):
            draw.text((x + dx, y + dy), line, font=font,
                      fill=(0, 0, 0, 255))
        draw.text((x, y), line, font=font, fill=(*colour, 255))
    return np.moveaxis(np.asarray(img), -1, 0).copy()


def overlay_text(layer: Layer, text: str, **style) -> Layer:
    """Composite text onto an RGB-family layer (render_text_to_layer
    successor)."""
    import jax.numpy as jnp
    mask = render_text_mask(text, layer.width, layer.height, **style)
    arr = layer.planes[0].astype(jnp.float32)
    m = jnp.asarray(mask).astype(jnp.float32)
    a = m[3:4] / 255.0
    rgb = arr[:3] * (1.0 - a) + m[:3] * a
    out = jnp.clip(jnp.floor(rgb + 0.5), 0, 255).astype(jnp.uint8)
    if arr.shape[0] == 4:
        out = jnp.concatenate([out, layer.planes[0][3:4]], 0)
    return layer.replace(planes=(out,))


# ---------------------------------------------------------------------------
# Subtitles
# ---------------------------------------------------------------------------

@dataclass
class Subtitle:
    start: float            # seconds
    end: float
    text: str


def _srt_time(s: str) -> float:
    m = re.match(r"(\d+):(\d+):(\d+)[,.](\d+)", s.strip())
    h, mi, se, ms = (int(x) for x in m.groups())
    return h * 3600 + mi * 60 + se + ms / 1000.0


def _srt_fmt(t: float) -> str:
    ms = int(round(t * 1000))
    return f"{ms // 3600000:02d}:{ms // 60000 % 60:02d}:" \
           f"{ms // 1000 % 60:02d},{ms % 1000:03d}"


def load_srt(path: str | Path) -> list[Subtitle]:
    """.srt parser (reference reload_subs, clip_load_save.c:1752)."""
    text = Path(path).read_text(errors="replace")
    subs = []
    for block in re.split(r"\n\s*\n", text.strip()):
        lines = [l for l in block.splitlines() if l.strip()]
        if len(lines) < 2:
            continue
        ti = 1 if re.fullmatch(r"\d+", lines[0].strip()) else 0
        m = re.match(r"(.+?)\s*-->\s*(.+)", lines[ti])
        if not m:
            continue
        subs.append(Subtitle(_srt_time(m.group(1)), _srt_time(m.group(2)),
                             "\n".join(lines[ti + 1:])))
    return subs


def save_srt(path: str | Path, subs: list[Subtitle]):
    """save_subs_to_file (clip_load_save.c:35)."""
    out = []
    for i, s in enumerate(subs, 1):
        out.append(f"{i}\n{_srt_fmt(s.start)} --> {_srt_fmt(s.end)}\n"
                   f"{s.text}\n")
    Path(path).write_text("\n".join(out))


def load_sub(path: str | Path, fps: float = 25.0) -> list[Subtitle]:
    """MicroDVD .sub parser: {start_frame}{end_frame}text."""
    subs = []
    for line in Path(path).read_text(errors="replace").splitlines():
        m = re.match(r"\{(\d+)\}\{(\d+)\}(.*)", line.strip())
        if m:
            subs.append(Subtitle(int(m.group(1)) / fps,
                                 int(m.group(2)) / fps,
                                 m.group(3).replace("|", "\n")))
    return subs


def sub_at(subs: list[Subtitle], t: float) -> str | None:
    for s in subs:
        if s.start <= t < s.end:
            return s.text
    return None


class SubtitleOverlay:
    """Player-side subtitle compositor with mask caching."""

    def __init__(self, subs: list[Subtitle], **style):
        self.subs = subs
        self.style = style
        self._cache: dict[str, np.ndarray] = {}

    def apply(self, layer: Layer, t: float) -> Layer:
        text = sub_at(self.subs, t)
        if not text:
            return layer
        import jax.numpy as jnp
        key = f"{text}@{layer.width}x{layer.height}"
        mask = self._cache.get(key)
        if mask is None:
            mask = render_text_mask(text, layer.width, layer.height,
                                    **self.style)
            self._cache[key] = mask
        m = jnp.asarray(mask).astype(jnp.float32)
        a = m[3:4] / 255.0
        arr = layer.planes[0].astype(jnp.float32)
        rgb = arr[:3] * (1.0 - a) + m[:3] * a
        out = jnp.clip(jnp.floor(rgb + 0.5), 0, 255).astype(jnp.uint8)
        if arr.shape[0] == 4:
            out = jnp.concatenate([out, layer.planes[0][3:4]], 0)
        return layer.replace(planes=(out,))
