"""The RFX script library — TPU executions of the reference's most-used
rendered-effect scripts (`/root/reference/lives-plugins/plugins/effects/
RFXscripts/*.script`, e.g. blur.script:24-40).

Each reference script is a Perl program shelling ImageMagick per frame
image; here each is a declarative entry mapping the script's RFX params
onto a builtin filter + value transform, executed as batched device work by
`rfx.apply_rendered_effect`. Param definitions are parsed from the REAL
reference script files when available (rfx.parse_rfx_params on the
<params> DSL), so auto-generated UIs match the originals.

    apply_script(clip, "blur", radius=5)
    apply_script(clip, "fade_in_out", direction=0)   # per-frame ramp
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Optional

from .io.clips import Clip
from .rfx import apply_rendered_effect, parse_rfx_params

REF_SCRIPTS = Path("/root/reference/lives-plugins/plugins/effects/"
                   "RFXscripts")


@dataclass(frozen=True)
class ScriptDef:
    """One RFX script: our filter + param mapping.

    `mapping(params, n_frames) -> (filter_values dict)`; entries may be
    callables f(frame)->value for per-frame animation."""
    name: str
    filter: str
    mapping: Callable[[dict, int], dict]
    defaults: dict = field(default_factory=dict)

    def params_spec(self) -> list[dict]:
        """Param defs from the actual reference script when present."""
        p = REF_SCRIPTS / f"{self.name}.script"
        if p.is_file():
            try:
                spec = parse_rfx_params(p.read_text(errors="replace"))
                if spec:
                    return spec
            except Exception:
                pass
        return [{"name": k, "kind": "num", "default": v}
                for k, v in self.defaults.items()]


_SCRIPTS: dict[str, ScriptDef] = {}


def _script(name, filter_name, defaults=None, mapping=None):
    defaults = defaults or {}

    def default_mapping(p, n):
        return {**{k: p.get(k, d) for k, d in defaults.items()}}

    _SCRIPTS[name] = ScriptDef(name, filter_name,
                               mapping or default_mapping, defaults)


# -- 1:1 filter mappings (script param -> filter param) ----------------------
_script("blur", "gaussian_blur",
        {"radius": 4, "amount": 1.0},
        lambda p, n: {"radius": int(p.get("radius", 4)),
                      "amount": p.get("amount", 1.0)})
_script("brightness_change", "brightness_contrast", {"delta": 0.2},
        lambda p, n: {"brightness": p.get("delta", 0.2)})
_script("contrast", "brightness_contrast", {"contrast": 1.5},
        lambda p, n: {"contrast": p.get("contrast", 1.5)})
_script("gamma_change", "gamma_adjust", {"gamma": 1.2},
        lambda p, n: {"gamma": p.get("gamma", 1.2)})
_script("saturation_change", "saturation", {"saturation": 1.5},
        lambda p, n: {"saturation": p.get("saturation", 1.5)})
_script("hue_change", "hue_rotate", {"angle": 0.2},
        lambda p, n: {"angle": p.get("angle", 0.2)})
_script("negate", "negate", {})
_script("sepia", "sepia", {"amount": 1.0})
_script("monochrome", "greyscale", {})
_script("posterize", "posterize", {"levels": 4},
        lambda p, n: {"levels": int(p.get("levels", 4))})
_script("solarize", "solarize", {"threshold": 0.5})
_script("colorize", "tint", {"red": 1.0, "green": 0.8, "blue": 0.5,
                             "amount": 1.0})
_script("colour_filter", "colour_balance",
        {"red": 1.0, "green": 1.0, "blue": 1.0})
_script("flip", "flip_vertical", {})
_script("flop", "flip_horizontal", {})
_script("rotate", "rotate", {"degrees": 90.0})
_script("pixilate", "pixelate", {"block": 8},
        lambda p, n: {"block": int(p.get("block", 8))})
_script("emboss", "emboss", {"strength": 0.5, "amount": 1.0})
_script("charcoal", "charcoal", {"strength": 0.5})
_script("edge_detect", "edge", {})
_script("noisify", "noise", {},
        lambda p, n: {"mono": bool(p.get("mono", False))})
_script("spread", "spread", {"amount": 0.3})
_script("wave", "wave", {"amplitude": 0.3, "wavelength": 0.25})
_script("swirl", "swirl", {"degrees": 90.0})
_script("shift_horizontal", "shift", {"dx": 0.25},
        lambda p, n: {"dx": p.get("dx", 0.25), "dy": 0.0})
_script("shift_vertical", "shift", {"dy": 0.25},
        lambda p, n: {"dx": 0.0, "dy": p.get("dy", 0.25)})
_script("despekle", "box_blur", {},
        lambda p, n: {"radius": 1, "amount": 1.0})
_script("enhance", "sharpen", {"amount": 0.8},
        lambda p, n: {"radius": 2, "amount": p.get("amount", 0.8)})
_script("normalize", "levels", {},
        lambda p, n: {"black": 0.05, "white": 0.95})
_script("dream", "dream", {})
_script("tunnel", "lens", {"amount": 0.8},
        lambda p, n: {"amount": p.get("amount", 0.8)})
_script("randomzoom", "rotozoom", {},
        lambda p, n: {"angle": 0.0, "zoom": 1.3})
_script("deinterlace", "deinterlace", {"amount": 1.0})


# -- per-frame animated scripts ----------------------------------------------

def _fade_mapping(p, n_frames):
    """fade_in_out.script: brightness ramp over the range.
    direction 0 = fade in, 1 = fade out."""
    fade_in = int(p.get("direction", 0)) == 0
    span = max(n_frames - 1, 1)

    def ramp(frame):
        t = min(max(frame / span, 0.0), 1.0)
        lvl = t if fade_in else 1.0 - t
        return lvl - 1.0  # brightness offset: -1 (black) .. 0 (unchanged)

    return {"brightness": ramp}


_SCRIPTS["fade_in_out"] = ScriptDef("fade_in_out", "brightness_contrast",
                                    _fade_mapping, {"direction": 0})


def _spin_mapping(p, n_frames):
    """spin.script: full rotations across the range."""
    turns = float(p.get("turns", 1.0))
    span = max(n_frames - 1, 1)
    return {"degrees": lambda f: 360.0 * turns * (f / span)}


_SCRIPTS["spin"] = ScriptDef("spin", "rotate", _spin_mapping, {"turns": 1.0})


def _shrink_mapping(p, n_frames):
    """shrink_expand.script: zoom ramp."""
    z0, z1 = float(p.get("start", 1.0)), float(p.get("end", 0.2))
    span = max(n_frames - 1, 1)
    return {"angle": 0.0,
            "zoom": lambda f: z0 + (z1 - z0) * (f / span)}


_SCRIPTS["shrink_expand"] = ScriptDef("shrink_expand", "rotozoom",
                                      _shrink_mapping,
                                      {"start": 1.0, "end": 0.2})


# -- API ----------------------------------------------------------------------

def list_scripts() -> list[str]:
    return sorted(_SCRIPTS)


def get_script(name: str) -> ScriptDef:
    return _SCRIPTS[name]


def apply_textover(clip: Clip, text: str, start: int = 0,
                   end: int | None = None, **style) -> int:
    """textover.script: burn text onto a frame range (host PIL raster +
    device composite via text.overlay_text)."""
    from .text import overlay_text
    from .constants import Palette
    from .ops.colorspace import convert_layer
    end_ = clip.frames if end is None else min(end, clip.frames)
    for n in range(start, end_):
        lay = convert_layer(clip.get_frame(n), Palette.RGB24)
        clip.put_frame(n, overlay_text(lay, text, **style))
    clip.save_header()
    return max(end_ - start, 0)


def apply_script(clip: Clip, name: str, start: int = 0,
                 end: int | None = None, batch_size: int = 32,
                 progress=None, **params) -> int:
    """Execute an RFX script on clip frames [start, end) through the
    batched rendered-effect engine. Returns frames processed."""
    sd = _SCRIPTS[name]
    end_ = clip.frames if end is None else min(end, clip.frames)
    n = max(end_ - start, 0)
    raw = sd.mapping(params, n)
    # animated entries receive RANGE-relative frame numbers
    values = {k: ((lambda f, _fn=v: _fn(f - start)) if callable(v) else v)
              for k, v in raw.items()}
    return apply_rendered_effect(clip, sd.filter, start=start, end=end_,
                                 values=values, batch_size=batch_size,
                                 progress=progress)
