"""Effect host: filter classes, instances, palette/size negotiation, chains.

TPU-native successor of the Weed effect host (`/root/reference/src/
effects-weed.c`): filter classes are declarative dataclasses whose process
functions are pure, traceable JAX ops; "palette negotiation"
(`weed_init_effect`, effects-weed.c:6517) happens at trace time by
converting input layers to a palette the filter accepts; per-filter threading
(`process_func_threaded` :1563) is replaced by XLA's intra-op parallelism.

Key correspondences:
  Filter          <- weed filter class plant (weed_filter_t)
  ChannelTemplate <- weed channel template (palette list, optional, ...)
  Param           <- weed parameter template (+ current value on an instance)
  Instance        <- weed filter instance (weed_instance_from_filter :6299)
  apply_instance  <- weed_apply_instance (:1850)
  apply_chain     <- weed_apply_effects / filter map application (:3292)

Stateful effects (EffecTV-style feedback) carry explicit state pytrees —
inputs and outputs of `process` — instead of hidden `plugin_internal`
pointers, so they compose with `lax.scan` for batch rendering.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax.numpy as jnp
import numpy as np

from ..constants import Gamma, Palette, YUVClamping, has_alpha, \
    is_rgb_palette, is_yuv_palette
from ..layer import Layer
from ..ops.colorspace import convert_layer
from ..ops.gamma import gamma_convert_layer
from ..ops.resize import resize_layer

# Filter flags (semantic parity with weed-effects.h:105-114)
FILTER_NON_REALTIME = 1 << 0
FILTER_IS_CONVERTER = 1 << 1
FILTER_STATEFUL = 1 << 2        # carries state between frames
FILTER_IS_TRANSITION = 1 << 3
FILTER_IS_GENERATOR = 1 << 4
FILTER_MAY_RESIZE = 1 << 5


@dataclass(frozen=True)
class ChannelTemplate:
    """Channel template (weed chantmpl)."""
    name: str = "in"
    palettes: tuple[int, ...] | None = None  # None = any
    optional: bool = False
    can_alpha: bool = True


@dataclass(frozen=True)
class Param:
    """Parameter template (weed paramtmpl). `value` on instances may be a
    python scalar OR a traced jnp scalar/array (for interpolated rendering).
    """
    name: str
    kind: str = "num"  # num | int | bool | color | string | string_list
    default: Any = 0.0
    min: float = 0.0
    max: float = 1.0
    choices: tuple[str, ...] = ()
    group: int = 0
    label: str = ""

    def clamp(self, v):
        if self.kind in ("num", "int"):
            return jnp.clip(v, self.min, self.max) if hasattr(v, "shape") \
                else min(max(v, self.min), self.max)
        return v


@dataclass(frozen=True)
class Filter:
    """A filter class. `process(inputs, params, ctx) -> Layer | (Layer, state)`
    where ctx is a FrameContext. Must be traceable."""
    name: str
    process: Callable
    in_channels: tuple[ChannelTemplate, ...] = (ChannelTemplate("in"),)
    out_channels: tuple[ChannelTemplate, ...] = (ChannelTemplate("out"),)
    params: tuple[Param, ...] = ()
    flags: int = 0
    author: str = "lives_tpu"
    version: int = 1
    description: str = ""
    init_state: Callable | None = None  # (width,height,palette)->state pytree
    preferred_gamma: int | None = None  # e.g. LINEAR for physical-light fx
    # analyser hook: (ins, params, ctx) -> dict of out-param values
    # (weed out-parameters; feeds data connections, effects-data.c).
    # Layer-valued entries are alpha OUT-CHANNELS (must match a template in
    # `alpha_outs` by name); scalars/arrays are out-params. Both feed data
    # connections — pconx routes scalars, cconx routes alpha channels
    # (effects-data.c:1730 cconx_new, :2283 cconx_chain_data).
    analyse: Callable | None = None
    out_params: tuple[Param, ...] = ()
    # alpha channel templates (cconx endpoints). `alpha_outs`: channels the
    # filter exports (via analyse / the stateful out-dict). `alpha_ins`:
    # optional alpha inputs appended to `ins` AFTER the regular channels —
    # process sees ins[n_in + j] as a negotiated alpha Layer or None when
    # unconnected. (Reference: weed channel templates with alpha palettes,
    # filled by cconx_chain_data before the instance runs.)
    alpha_outs: tuple[ChannelTemplate, ...] = ()
    alpha_ins: tuple[ChannelTemplate, ...] = ()

    @property
    def hashname(self) -> str:
        """Registry key (reference hashnames, effects-weed.c:10605)."""
        return f"{self.name}|{self.author}|{self.version}"

    @property
    def is_transition(self) -> bool:
        return bool(self.flags & FILTER_IS_TRANSITION)

    @property
    def is_generator(self) -> bool:
        return bool(self.flags & FILTER_IS_GENERATOR) or not self.in_channels

    @property
    def n_in(self) -> int:
        return len(self.in_channels)

    def param(self, name: str) -> Param:
        for p in self.params:
            if p.name == name:
                return p
        raise KeyError(f"{self.name}: no param {name!r}")


@dataclass
class Instance:
    """A filter instance: filter + current param values + state.
    (weed_instance_from_filter, effects-weed.c:6299)."""
    filter: Filter
    values: dict[str, Any] = field(default_factory=dict)
    state: Any = None
    enabled: bool = True
    # in-track mapping for chains (reference in_tracks/out_tracks on init
    # events): which track layers feed this instance
    in_tracks: tuple[int, ...] = (0,)
    out_tracks: tuple[int, ...] = (0,)
    # latest analyser outputs (weed out-param values)
    out_values: dict[str, Any] = field(default_factory=dict)
    # latest exported alpha out-channels: name -> Layer (cconx sources)
    out_channels: dict[str, Any] = field(default_factory=dict)

    def param_values(self) -> dict[str, Any]:
        out = {}
        for p in self.filter.params:
            v = self.values.get(p.name, p.default)
            out[p.name] = v
        return out

    def set(self, **kw) -> "Instance":
        for k, v in kw.items():
            self.filter.param(k)  # validate
            self.values[k] = v
        return self


@dataclass(frozen=True)
class FrameContext:
    """Per-frame info handed to process fns."""
    tc: Any = 0.0          # timecode, seconds (may be traced)
    frame: Any = 0         # frame number (may be traced)
    fps: float = 25.0
    width: int = 0         # FULL frame dims (tile execution: not the tile's)
    height: int = 0
    # tile origin for tiled (pallas fused-sweep) execution; 0 for
    # whole-frame jit. May be traced. Coordinate-dependent effects must
    # build grids via effects.util.ctx_grid, which consumes these.
    y0: Any = 0
    x0: Any = 0


# ---------------------------------------------------------------------------
# Registry (weed_load_all / hashname registry successor)
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, Filter] = {}


def register_filter(f: Filter) -> Filter:
    _REGISTRY[f.name] = f
    return f


def get_filter(name: str) -> Filter:
    _ensure_builtins()
    return _REGISTRY[name]


def list_filters() -> list[str]:
    _ensure_builtins()
    return sorted(_REGISTRY)


_BUILTINS_LOADED = False


def _ensure_builtins():
    global _BUILTINS_LOADED
    if not _BUILTINS_LOADED:
        _BUILTINS_LOADED = True
        from . import builtin  # noqa: F401  (registers on import)


def instantiate(name_or_filter, **values) -> Instance:
    f = name_or_filter if isinstance(name_or_filter, Filter) \
        else get_filter(name_or_filter)
    inst = Instance(filter=f,
                    in_tracks=tuple(range(max(f.n_in, 1))))
    if values:
        inst.set(**values)
    if f.init_state is not None:
        inst.state = None  # lazily created at first apply (needs geometry)
    return inst


# ---------------------------------------------------------------------------
# Application: negotiation + dispatch
# ---------------------------------------------------------------------------

def negotiate_layer(layer: Layer, tmpl: ChannelTemplate,
                    width: int | None = None, height: int | None = None,
                    gamma: int | None = None) -> Layer:
    """Convert a layer to a palette the template accepts (+ optional size /
    gamma) — the trace-time analogue of channel palette negotiation.

    Float RGB layers satisfy integer RGB templates directly (a precision
    superset): the chain compiler keeps the working image in float between
    effects so XLA fuses the whole chain without per-stage u8 round-trips.
    """
    from ..constants import Palette, is_float_palette
    if (tmpl.palettes and is_float_palette(layer.palette)
            and is_rgb_palette(layer.palette)
            and any(is_rgb_palette(p) for p in tmpl.palettes)):
        need_alpha = all(has_alpha(p) for p in tmpl.palettes
                         if is_rgb_palette(p))
        if need_alpha and not has_alpha(layer.palette):
            layer = convert_layer(layer, Palette.RGBAFLOAT)
    elif tmpl.palettes and layer.palette not in tmpl.palettes:
        # prefer same colour family to minimise loss (nodemodel cost rule:
        # convert late, stay >= source fidelity)
        pals = tmpl.palettes
        target = None
        if is_rgb_palette(layer.palette):
            target = next((p for p in pals if is_rgb_palette(p)), pals[0])
        elif is_yuv_palette(layer.palette):
            target = next((p for p in pals if is_yuv_palette(p)), pals[0])
        else:
            target = pals[0]
        layer = convert_layer(layer, target)
    if width and height and (layer.width, layer.height) != (width, height):
        layer = resize_layer(layer, width, height)
    if gamma is not None and layer.gamma != gamma:
        layer = gamma_convert_layer(layer, gamma)
    return layer


def apply_instance(inst: Instance, layers: Sequence[Layer],
                   ctx: FrameContext | None = None,
                   alpha_ins: dict[int, Layer] | None = None) -> list[Layer]:
    """Apply one instance to a layer stack; returns the new stack.

    Layers are indexed by track; inst.in_tracks selects inputs; the result
    replaces the layer at out_tracks[0]. (weed_apply_instance,
    effects-weed.c:1850.)

    `alpha_ins` maps alpha-in slot index -> connected alpha Layer (cconx,
    effects-data.c:2283 cconx_chain_data): each is negotiated to the
    slot's template palettes + the frame geometry and appended to `ins`
    after the regular channels; unconnected slots pass None.
    """
    f = inst.filter
    layers = list(layers)
    if not inst.enabled:
        return layers
    # missing tracks fall back to the front layer (the reference drops
    #/reuses tracks when a multi-input filter has fewer layers than
    # channels — keeps 4-input compositors usable on a 2-track player key)
    ins = [layers[t] if t < len(layers) and layers[t] is not None
           else layers[0]
           for t in inst.in_tracks[: f.n_in]] if f.n_in else []
    # negotiation: all inputs matched to channel templates; sizes unified to
    # the first mandatory input's geometry
    if ins:
        w, h = ins[0].width, ins[0].height
        ins = [negotiate_layer(l, f.in_channels[min(i, f.n_in - 1)], w, h,
                               f.preferred_gamma)
               for i, l in enumerate(ins)]
    if f.alpha_ins:
        w = ins[0].width if ins else 0
        h = ins[0].height if ins else 0
        for j, tmpl in enumerate(f.alpha_ins):
            a = (alpha_ins or {}).get(j)
            if a is not None:
                a = negotiate_layer(a, tmpl, w or None, h or None)
            ins.append(a)
    lead = next((l for l in ins if l is not None), None)
    if ctx is None:
        ctx = FrameContext(width=lead.width if lead is not None else 0,
                           height=lead.height if lead is not None else 0)
    params = {k: f.param(k).clamp(v) for k, v in inst.param_values().items()}

    def _split_outs(d: dict) -> None:
        """Analyser outputs: Layer values are alpha out-channels (cconx
        sources), everything else is an out-param value (pconx)."""
        inst.out_values = {k: v for k, v in d.items()
                           if not isinstance(v, Layer)}
        chans = {k: v for k, v in d.items() if isinstance(v, Layer)}
        if chans:
            inst.out_channels = chans

    if f.flags & FILTER_STATEFUL:
        state = inst.state
        if state is None and f.init_state is not None:
            w0 = lead.width if lead is not None else ctx.width
            h0 = lead.height if lead is not None else ctx.height
            state = f.init_state(w0, h0,
                                 lead.palette if lead is not None else None)
        ret = f.process(ins, params, ctx, state)
        if len(ret) == 3:  # stateful analysers: (out, state, out_values)
            out, inst.state, outs = ret
            _split_outs(dict(outs))
        else:
            out, inst.state = ret
    else:
        out = f.process(ins, params, ctx)
    if f.analyse is not None:
        _split_outs(dict(f.analyse(ins, params, ctx)))
    outs = out if isinstance(out, (list, tuple)) else [out]
    for t, o in zip(inst.out_tracks, outs):
        while len(layers) <= t:
            layers.append(None)
        layers[t] = o
    return layers


def apply_chain(instances: Sequence[Instance], layers: Sequence[Layer],
                ctx: FrameContext | None = None) -> Layer:
    """Apply an ordered effect chain to a layer stack and composite down to
    the frontmost output layer (weed_apply_effects, effects-weed.c:3292)."""
    layers = list(layers)
    for inst in instances:
        layers = apply_instance(inst, layers, ctx)
    return layers[0]
