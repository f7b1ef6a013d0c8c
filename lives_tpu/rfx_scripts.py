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
    # host-op scripts (frame-index edits, two-source transitions, clip
    # generators) execute via a runner instead of the filter engine:
    # runner(clip, start, end, progress, **params) -> frames processed
    runner: Optional[Callable] = None

    def params_spec(self) -> list[dict]:
        """Param defs from the actual reference script when present.
        Runner-backed scripts (two-source transitions, frame ops,
        generators) take different kwargs than the reference Perl param
        blocks, so they advertise their own defaults — advertising names
        the runner would silently swallow is worse than a renamed UI."""
        user = getattr(self, "user_spec", None)
        if user is not None:   # user-authored (rfx_builder) scripts
            return list(user)
        if self.runner is not None:
            def kind_of(v):
                if isinstance(v, bool):
                    return "bool"
                if isinstance(v, str):
                    return "string"
                if isinstance(v, int):
                    return "int"
                return "num"
            return [{"name": k, "kind": kind_of(v), "default": v}
                    for k, v in self.defaults.items()]
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


def script_specials(name: str) -> list[dict]:
    """Special-widget hints for a script's param window (reference
    paramspecial.c: aspect / fileread / fontchooser / password /
    mergealign / framedraw), parsed from the reference .script when one
    exists. Indices arrive resolved to param names."""
    from .rfx import parse_rfx_params, parse_rfx_specials
    p = REF_SCRIPTS / f"{name}.script"
    if not p.is_file():
        return []
    try:
        text = p.read_text(errors="replace")
        return parse_rfx_specials(text, parse_rfx_params(text))
    except Exception:
        return []


def parse_param_value(v):
    """Parse a CLI/OSC string param: int-looking stays int, float-looking
    becomes float, everything else stays a string. Shared by `cli rfx`
    and OSC /rfx/apply so the two surfaces cannot drift."""
    if not isinstance(v, str):
        return v
    try:
        if v.lstrip("-").isdigit():
            return int(v)
        if "." in v:
            return float(v)
    except ValueError:
        pass
    return v


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
    if sd.runner is not None:
        end_r = clip.frames if end is None else min(end, clip.frames)
        return sd.runner(clip, start, end_r, progress, **params)
    end_ = clip.frames if end is None else min(end, clip.frames)
    n = max(end_ - start, 0)
    raw = sd.mapping(params, n)
    # animated entries receive RANGE-relative frame numbers
    values = {k: ((lambda f, _fn=v: _fn(f - start)) if callable(v) else v)
              for k, v in raw.items()}
    return apply_rendered_effect(clip, sd.filter, start=start, end=end_,
                                 values=values, batch_size=batch_size,
                                 progress=progress)


# ===========================================================================
# Library completion: the remaining reference RFXscripts. Filter-backed
# entries run through the batched engine above; frame-index edits,
# two-source transitions and clip generators run as host-op runners
# (`ScriptDef.runner`) — still doing their pixel work on device.
# ===========================================================================

_script("colour_replace", "colour_replace",
        {"red": 0.0, "green": 0.0, "blue": 0.0,
         "red2": 1.0, "green2": 1.0, "blue2": 1.0, "tolerance": 0.1})


def _modulate_mapping(p, n_frames):
    """modulate.script: brightness/saturation/hue ramps (the script steps
    p1/p3/p5 per frame from start to end values)."""
    span = max(n_frames - 1, 1)

    def norm(v):
        # values > 4 are ImageMagick percent scale (100 = unchanged);
        # each endpoint normalises independently (mixing a defaulted 1.0
        # with a percent 150 must not crush the default to 0.01)
        return v / 100.0 if v > 4.0 else v

    def ramp(k0, k1):
        a = norm(float(p.get(k0, 1.0)))
        b = norm(float(p.get(k1, p.get(k0, 1.0))))
        return lambda f: a + (b - a) * (f / span)

    return {"brightness": ramp("bstart", "bend"),
            "saturation": ramp("sstart", "send"),
            "hue": ramp("hstart", "hend")}


_SCRIPTS["modulate"] = ScriptDef(
    "modulate", "modulate", _modulate_mapping,
    {"bstart": 1.0, "bend": 1.0, "sstart": 1.0, "send": 1.0,
     "hstart": 1.0, "hend": 1.0})


def _cycle_mapping(p, n_frames):
    """cycle.script: colour cycling — ImageMagick -cycle shifts the
    colormap by an accumulating amount; the closest colour-space analogue
    is an accumulating hue rotation (`shift` degrees + `step` per frame)."""
    shift = float(p.get("shift", 0.0))
    step = float(p.get("step", 10.0))
    return {"angle": lambda f: ((shift + step * f) / 360.0) % 1.0}


_SCRIPTS["cycle"] = ScriptDef("cycle", "hue_rotate", _cycle_mapping,
                              {"shift": 0.0, "step": 10.0})


def _pan_zoom_mapping(p, n_frames):
    """pan_and_zoomy (weed-plugins/scripts): Ken Burns — animate zoom and
    target point from a start to an end view across the range."""
    span = max(n_frames - 1, 1)

    def ramp(k0, k1, d0, d1):
        a, b = float(p.get(k0, d0)), float(p.get(k1, d1))
        return lambda f: a + (b - a) * (f / span)

    return {"zoom": ramp("zstart", "zend", 1.0, 2.0),
            "x": ramp("xstart", "xend", 0.5, 0.5),
            "y": ramp("ystart", "yend", 0.5, 0.5)}


_SCRIPTS["pan_and_zoom"] = ScriptDef(
    "pan_and_zoom", "targeted_zoom", _pan_zoom_mapping,
    {"zstart": 1.0, "zend": 2.0, "xstart": 0.5, "xend": 0.5,
     "ystart": 0.5, "yend": 0.5})

_script("blank_frames", "solid_colour",
        {"red": 0.0, "green": 0.0, "blue": 0.0})


# -- two-source transitions ---------------------------------------------------

def _pull_rgb(src, n: int, width: int, height: int) -> "np.ndarray":
    """Frame n (modulo length) of a Clip or Clipboard as (3,H,W) u8."""
    import numpy as np
    from .constants import Palette
    from .ops.colorspace import convert_layer
    from .ops.resize import resize_layer
    if hasattr(src, "get_frame"):          # Clip
        total = src.frames
        lay = src.get_frame(n % max(total, 1))
    elif hasattr(src, "frames") and isinstance(src.frames, list):
        # clipedit.Clipboard: raw (3,H,W) u8 arrays
        import jax.numpy as jnp
        from .layer import Layer as _Layer
        arr = src.frames[n % max(len(src.frames), 1)]
        lay = _Layer(planes=(jnp.asarray(arr),), palette=int(Palette.RGB24))
    else:                                   # plain list of layers
        layers = list(src)
        lay = layers[n % max(len(layers), 1)]
    lay = convert_layer(lay, Palette.RGB24)
    if (lay.width, lay.height) != (width, height):
        lay = resize_layer(lay, width, height)
    return np.asarray(lay.planes[0])


def _transition_blend_fn(mode: str):
    """Batched device blend for the rendered transitions: (A (B,3,H,W) f32
    in [0,1], Bk, t (B,), params) -> out."""
    import jax
    import jax.numpy as jnp

    def fade(a, b, t, thresh, tiles):
        return a * (1.0 - t)[:, None, None, None] + b * t[:, None, None, None]

    def checkerboard(a, b, t, thresh, tiles):
        h, w = a.shape[-2:]
        ty = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) \
            // max(h // max(int(tiles), 1), 1)
        tx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) \
            // max(w // max(int(tiles), 1), 1)
        m = ((tx + ty) % 2).astype(jnp.float32)[None, None]
        return a * (1.0 - m) + b * m

    def bwthresh(a, b, t, thresh, tiles):
        g = 0.299 * b[:, 0] + 0.587 * b[:, 1] + 0.114 * b[:, 2]
        m = (g > thresh).astype(jnp.float32)[:, None]
        return a * (1.0 - m) + b * m

    return {"fade": fade, "checkerboard": checkerboard,
            "bwthresh": bwthresh}[mode]


def _run_transition(clip: Clip, other, mode: str, start: int, end: int,
                    progress=None, pstart: float = 0.0, pend: float = 1.0,
                    thresh: float = 0.5, tiles: int = 8,
                    batch_size: int = 32) -> int:
    """transition_fade / _checkerboard / _bwthresh: blend the clip's frames
    with a second source on device, batched (the reference composites via
    ImageMagick once per frame)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from .constants import Palette
    from .layer import Layer as _Layer
    if other is None:
        raise ValueError("transition scripts need other=<Clip|Clipboard>")
    blend = _transition_blend_fn(mode)
    span = max(end - start - 1, 1)

    @jax.jit
    def step(a_u8, b_u8, t):
        a = a_u8.astype(jnp.int32).astype(jnp.float32) / 255.0
        b = b_u8.astype(jnp.int32).astype(jnp.float32) / 255.0
        out = jnp.clip(blend(a, b, t, thresh, tiles), 0.0, 1.0)
        return (out * 255.0 + 0.5).astype(jnp.uint8)

    done = 0
    for ofs in range(start, end, batch_size):
        hi = min(ofs + batch_size, end)
        from .ops.colorspace import convert_layer
        a = np.stack([np.asarray(convert_layer(
            clip.get_frame(n), Palette.RGB24).planes[0])
            for n in range(ofs, hi)])
        b = np.stack([_pull_rgb(other, n - start, clip.width, clip.height)
                      for n in range(ofs, hi)])
        t = pstart + (pend - pstart) * (
            np.arange(ofs, hi, dtype=np.float32) - start) / span
        out = np.asarray(step(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(t)))
        for k, n in enumerate(range(ofs, hi)):
            clip.put_frame(n, _Layer(planes=(out[k],),
                                     palette=int(Palette.RGB24)))
            done += 1
            if progress:
                progress(done, end - start)
    clip.save_header()
    return done


def _splice_runner(clip, start, end, progress=None, other=None,
                   keep: int = 4, insert: int = 4, **_):
    """transition_splice.script: alternate runs of `insert` frames from
    the other source then `keep` original frames (the reference emits the
    clipboard run first: $lc starts at $p0), pure frame replacement."""
    import jax.numpy as jnp
    import numpy as np
    from .constants import Palette
    from .layer import Layer as _Layer
    if other is None:
        raise ValueError("transition_splice needs other=<Clip|Clipboard>")
    keep, insert = int(keep), int(insert)
    done = 0
    cyc = max(keep, 0) + max(insert, 0)
    if cyc == 0:
        return 0
    for n in range(start, end):
        k = (n - start) % cyc
        if k < insert:  # clipboard run comes FIRST (reference $lc=$p0)
            arr = _pull_rgb(other, n - start, clip.width, clip.height)
            clip.put_frame(n, _Layer(planes=(arr,),
                                     palette=int(Palette.RGB24)))
        done += 1
        if progress:
            progress(done, end - start)
    clip.save_header()
    return done


def _mk_transition_runner(mode):
    def runner(clip, start, end, progress=None, other=None, **params):
        return _run_transition(clip, other, mode, start, end, progress,
                               **{k: v for k, v in params.items()
                                  if k in ("pstart", "pend", "thresh",
                                           "tiles", "batch_size")})
    return runner


_SCRIPTS["transition_fade"] = ScriptDef(
    "transition_fade", "(two-source)", lambda p, n: {},
    {"pstart": 0.0, "pend": 1.0}, runner=_mk_transition_runner("fade"))
_SCRIPTS["transition_checkerboard"] = ScriptDef(
    "transition_checkerboard", "(two-source)", lambda p, n: {},
    {"tiles": 8}, runner=_mk_transition_runner("checkerboard"))
_SCRIPTS["transition_bwthresh"] = ScriptDef(
    "transition_bwthresh", "(two-source)", lambda p, n: {},
    {"thresh": 0.5}, runner=_mk_transition_runner("bwthresh"))
_SCRIPTS["transition_splice"] = ScriptDef(
    "transition_splice", "(two-source)", lambda p, n: {},
    {"keep": 4, "insert": 4}, runner=_splice_runner)


# -- frame-order / frame-range host ops ---------------------------------------

def _jumble_runner(clip, start, end, progress=None, seed: int = 0, **_):
    """jumble.script: each output frame becomes a random frame from the
    range (sampling WITH replacement, like the reference's int(rand))."""
    import shutil
    import tempfile
    import numpy as np
    seed = int(seed)
    rng = np.random.default_rng(seed or None)
    src = rng.integers(start, end, end - start)
    # stage only the UNIQUE sampled source frames as image files (disk,
    # not RAM: decoded 4K frames are ~24 MB each; replacement sampling
    # draws ~63% of the range), then write outputs reading from the stage
    stage = tempfile.mkdtemp(prefix="jumble_", dir=clip.clip_dir)
    try:
        import jax.numpy as jnp
        from PIL import Image
        from .constants import Palette
        from .layer import Layer as _Layer
        from .ops.colorspace import convert_layer
        for sn in np.unique(src):
            lay = convert_layer(clip.get_frame(int(sn)), Palette.RGB24)
            arr = np.moveaxis(np.asarray(lay.planes[0]), 0, -1)
            Image.fromarray(arr).save(f"{stage}/{int(sn)}.png")
        for i, sn in enumerate(src):
            with Image.open(f"{stage}/{int(sn)}.png") as im:
                arr = np.moveaxis(np.asarray(im.convert("RGB")),
                                  -1, 0).copy()
            clip.put_frame(start + i, _Layer(planes=(arr,),
                                             palette=int(Palette.RGB24)))
            if progress:
                progress(i + 1, end - start)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    clip.save_header()
    return end - start


_SCRIPTS["jumble"] = ScriptDef("jumble", "(frame-order)",
                               lambda p, n: {}, {"seed": 0},
                               runner=_jumble_runner)


def _skip_forwards_runner(clip, start, end, progress=None, skip: int = 8,
                          pc_start: float = 50.0, pc_step: float = 0.0,
                          **_):
    """skip_forwards.script: blend each frame with a future frame; the
    lookahead counts down each frame (skip..0) then resets, the blend
    percentage ramping by pc_step — a stuttering look-ahead echo."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from .constants import Palette
    from .layer import Layer as _Layer
    from .ops.colorspace import convert_layer

    @jax.jit
    def mix(a_u8, b_u8, pc):
        a = a_u8.astype(jnp.int32).astype(jnp.float32)
        b = b_u8.astype(jnp.int32).astype(jnp.float32)
        out = a * (1.0 - pc) + b * pc
        return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)

    skip = int(skip)
    # read-only source pass (pull before overwriting)
    srcs = [np.asarray(convert_layer(clip.get_frame(n),
                                     Palette.RGB24).planes[0])
            for n in range(start, min(end + skip, clip.frames))]
    diff, pc = skip, pc_start
    done = 0
    for n in range(start, end):
        i = n - start
        j = i + diff
        if diff > 0 and j < len(srcs):
            out = np.asarray(mix(jnp.asarray(srcs[i]), jnp.asarray(srcs[j]),
                                 jnp.float32(min(max(pc / 100.0, 0.0), 1.0))))
            clip.put_frame(n, _Layer(planes=(out,),
                                     palette=int(Palette.RGB24)))
        done += 1
        if progress:
            progress(done, end - start)
        diff -= 1
        pc += pc_step
        if diff < 0:
            diff, pc = skip, pc_start
    clip.save_header()
    return done


_SCRIPTS["skip_forwards"] = ScriptDef(
    "skip_forwards", "(frame-blend)", lambda p, n: {},
    {"skip": 8, "pc_start": 50.0, "pc_step": 0.0},
    runner=_skip_forwards_runner)


def _trim_runner(clip, start, end, progress=None, x: int = 0, y: int = 0,
                 width: int = 0, height: int = 0, border: bool = False,
                 bx: int = 0, by: int = 0, **_):
    """trim_frames.script: crop every frame to (width,height) at (x,y);
    with border=True the crop is placed onto a black full-size frame at
    (bx,by) instead of being scaled back up."""
    import jax.numpy as jnp
    import numpy as np
    from .constants import Palette
    from .layer import Layer as _Layer
    from .ops.colorspace import convert_layer
    from .ops.resize import resize_layer
    x, y, bx, by = int(x), int(y), int(bx), int(by)
    w = int(width) or clip.width
    h = int(height) or clip.height
    x = min(max(x, 0), clip.width - 1)
    y = min(max(y, 0), clip.height - 1)
    w = min(w, clip.width - x)
    h = min(h, clip.height - y)
    done = 0
    for n in range(start, end):
        lay = convert_layer(clip.get_frame(n), Palette.RGB24)
        arr = np.asarray(lay.planes[0])[:, y: y + h, x: x + w]
        if border:
            full = np.zeros((3, clip.height, clip.width), np.uint8)
            yy = min(max(by, 0), clip.height - h)
            xx = min(max(bx, 0), clip.width - w)
            full[:, yy: yy + h, xx: xx + w] = arr
            out = _Layer(planes=(jnp.asarray(full),),
                         palette=int(Palette.RGB24))
        else:
            out = resize_layer(_Layer(planes=(jnp.asarray(arr),),
                                      palette=int(Palette.RGB24)),
                               clip.width, clip.height)
        clip.put_frame(n, out)
        done += 1
        if progress:
            progress(done, end - start)
    clip.save_header()
    return done


_SCRIPTS["trim_frames"] = ScriptDef(
    "trim_frames", "(geometry)", lambda p, n: {},
    {"x": 0, "y": 0, "width": 0, "height": 0, "border": False},
    runner=_trim_runner)


def _photo_still_runner(clip, start, end, progress=None, flash: int = 2,
                        hold: int = 12, desaturate: bool = True, **_):
    """photo_still.script: a camera-flash freeze — `flash` white frames,
    then the first frame held (optionally desaturated to B&W photo look)
    for `hold` frames; the rest untouched."""
    import jax.numpy as jnp
    import numpy as np
    from .constants import Palette
    from .layer import Layer as _Layer
    from .ops.colorspace import convert_layer
    flash, hold = int(flash), int(hold)
    stored = convert_layer(clip.get_frame(start), Palette.RGB24)
    arr = np.asarray(stored.planes[0])
    if desaturate:
        g = (0.299 * arr[0] + 0.587 * arr[1] + 0.114 * arr[2]) \
            .astype(np.uint8)
        arr = np.stack([g, g, g])
    white = np.full_like(arr, 255)
    done = 0
    for n in range(start, min(end, start + flash + hold)):
        i = n - start
        src = white if i < flash else arr
        clip.put_frame(n, _Layer(planes=(src,),
                                 palette=int(Palette.RGB24)))
        done += 1
        if progress:
            progress(done, end - start)
    clip.save_header()
    return done


_SCRIPTS["photo_still"] = ScriptDef(
    "photo_still", "(freeze)", lambda p, n: {},
    {"flash": 2, "hold": 12, "desaturate": True},
    runner=_photo_still_runner)


def _image_overlay_runner(clip, start, end, progress=None, image: str = "",
                          x: int = 0, y: int = 0, scale: float = 1.0,
                          alpha: float = 1.0, dx: float = 0.0,
                          dy: float = 0.0, dscale: float = 0.0,
                          dalpha: float = 0.0, **_):
    """image_overlay.script: composite an image file over the frames, with
    optional per-frame position/size/alpha animation deltas."""
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    from .constants import Palette
    from .layer import Layer as _Layer
    from .ops.colorspace import convert_layer
    if not image:
        raise ValueError("image_overlay needs image=<path>")
    img = Image.open(image).convert("RGBA")
    done = 0
    for n in range(start, end):
        i = n - start
        s = max(scale + dscale * i, 0.01)
        a = min(max(alpha + dalpha * i, 0.0), 1.0)
        ox, oy = int(x + dx * i), int(y + dy * i)
        ow, oh = max(int(img.width * s), 1), max(int(img.height * s), 1)
        over = np.asarray(img.resize((ow, oh)), np.float32) \
            .transpose(2, 0, 1) / 255.0
        lay = convert_layer(clip.get_frame(n), Palette.RGB24)
        base = np.asarray(lay.planes[0]).astype(np.float32)
        # clip the overlay rect to the frame
        x0, y0 = max(ox, 0), max(oy, 0)
        x1 = min(ox + ow, clip.width)
        y1 = min(oy + oh, clip.height)
        if x1 > x0 and y1 > y0:
            sub = over[:, y0 - oy: y1 - oy, x0 - ox: x1 - ox]
            m = sub[3] * a
            base[:, y0:y1, x0:x1] = (base[:, y0:y1, x0:x1] * (1.0 - m)
                                     + sub[:3] * 255.0 * m)
        out = np.clip(base + 0.5, 0, 255).astype(np.uint8)
        clip.put_frame(n, _Layer(planes=(out,),
                                 palette=int(Palette.RGB24)))
        done += 1
        if progress:
            progress(done, end - start)
    clip.save_header()
    return done


_SCRIPTS["image_overlay"] = ScriptDef(
    "image_overlay", "(composite)", lambda p, n: {},
    {"image": "", "x": 0, "y": 0, "scale": 1.0, "alpha": 1.0},
    runner=_image_overlay_runner)


def _resize_runner(clip, start, end, progress=None, width: int = 0,
                   height: int = 0, **_):
    """resize.script: re-render every frame at a new geometry."""
    from .rfx import resize_all
    return resize_all(clip, int(width) or clip.width,
                      int(height) or clip.height,
                      progress=progress)


_SCRIPTS["resize"] = ScriptDef("resize", "(geometry)", lambda p, n: {},
                               {"width": 0, "height": 0},
                               runner=_resize_runner)


def _textover_runner(clip, start, end, progress=None, text: str = "",
                     **style):
    style = {k: v for k, v in style.items() if v not in ("", None)}
    if "size" in style:
        style["size"] = int(style["size"])
    return apply_textover(clip, text, start, end, **style)


# font = truetype name/path (the reference script's fontchooser special)
_SCRIPTS["textover"] = ScriptDef("textover", "(text)", lambda p, n: {},
                                 {"text": "", "size": 32, "font": ""},
                                 runner=_textover_runner)


# -- clip generators (gen_*.script) -------------------------------------------

def frame_calculator(fps: float, hours: float = 0.0, minutes: float = 0.0,
                     seconds: float = 0.0) -> int:
    """frame_calculator.script: time -> 1-based frame number at fps."""
    t = hours * 3600.0 + minutes * 60.0 + seconds
    return int(t * fps + 0.5) + 1


def gen_coloured_frames(workdir, width: int = 640, height: int = 480,
                        frames: int = 25, fps: float = 25.0,
                        red: float = 0.0, green: float = 0.0,
                        blue: float = 0.0, name: str = "coloured"):
    """gen_coloured_frames.script / gen_blank_frames.script: a new clip of
    constant-colour frames."""
    import jax.numpy as jnp
    import numpy as np
    from .constants import Palette
    from .io.clips import create_clip
    from .layer import Layer as _Layer
    c = create_clip(workdir, width, height, fps, name=name)
    col = np.array([red, green, blue], np.float32)[:, None, None]
    arr = np.broadcast_to((col * 255.0 + 0.5).astype(np.uint8),
                          (3, height, width)).copy()
    lay = _Layer(planes=(jnp.asarray(arr),), palette=int(Palette.RGB24))
    for n in range(frames):
        c.put_frame(n, lay)
    c.frames = frames
    c.save_header()
    return c


def gen_blank_frames(workdir, **kw):
    """gen_blank_frames.script: black frames."""
    kw.setdefault("name", "blank")
    return gen_coloured_frames(workdir, red=0.0, green=0.0, blue=0.0, **kw)


def gen_text(workdir, text: str, width: int = 640, height: int = 480,
             frames: int = 25, fps: float = 25.0, size: int = 48,
             colour=(255, 255, 255), bg=(0.0, 0.0, 0.0)):
    """gen_text.script: title frames — text centred on a colour background."""
    import jax.numpy as jnp
    import numpy as np
    from .constants import Palette
    from .io.clips import create_clip
    from .layer import Layer as _Layer
    from .text import render_text_mask
    c = create_clip(workdir, width, height, fps, name="title")
    mask = render_text_mask(text, width, height, size=size, colour=colour,
                            valign="middle")
    m = mask[3].astype(np.float32) / 255.0
    bgcol = (np.array(bg, np.float32)[:, None, None] * 255.0)
    out = np.clip(bgcol * (1.0 - m) + mask[:3].astype(np.float32) * m + 0.5,
                  0, 255).astype(np.uint8)
    lay = _Layer(planes=(jnp.asarray(out),), palette=int(Palette.RGB24))
    for n in range(frames):
        c.put_frame(n, lay)
    c.frames = frames
    c.save_header()
    return c


def gen_clip_from_image(workdir, image: str, frames: int = 25,
                        fps: float = 25.0, width: int = 0, height: int = 0):
    """gen_clip_from_image.script: a clip holding one image for N frames."""
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    from .constants import Palette
    from .io.clips import create_clip
    from .layer import Layer as _Layer
    img = Image.open(image).convert("RGB")
    if width and height:
        img = img.resize((width, height))
    w, h = img.size
    c = create_clip(workdir, w, h, fps, name=Path(image).stem)
    arr = np.asarray(img, np.uint8).transpose(2, 0, 1)
    lay = _Layer(planes=(jnp.asarray(arr),), palette=int(Palette.RGB24))
    for n in range(frames):
        c.put_frame(n, lay)
    c.frames = frames
    c.save_header()
    return c
