"""Compound filters: a fixed sub-chain packaged as one Filter
(reference `plugins/effects/compound/*`: e.g. blurzoom+colourbalance combos;
host support in effects-weed.c compound handling).

`make_compound` wires sub-filters in series over track 0, re-exports chosen
sub-params under new names, and fuses at trace time — the compiled compound
is a single XLA graph, so composing costs nothing at runtime.
"""

from __future__ import annotations

from typing import Any, Sequence

from .host import (FILTER_STATEFUL, Filter, FrameContext, Instance, Param,
                   apply_instance, get_filter, register_filter)


class Export:
    """Marks a sub-filter param as exposed on the compound."""

    def __init__(self, name: str):
        self.name = name


def make_compound(name: str, steps: Sequence[tuple[str, dict]],
                  description: str = "") -> Filter:
    """steps: [(filter_name, {param: value | Export("exposed_name")})].

    Values fix sub-params; Export(...) re-exports them on the compound.
    """
    sub_filters = [get_filter(fname) for fname, _ in steps]
    # build exported param templates
    exported: list[Param] = []
    export_map: list[tuple[int, str, str]] = []  # (step, sub_param, name)
    for i, (fname, binds) in enumerate(steps):
        f = sub_filters[i]
        for pname, v in binds.items():
            if isinstance(v, Export):
                src = f.param(pname)
                exported.append(Param(v.name, src.kind, src.default,
                                      src.min, src.max, src.choices))
                export_map.append((i, pname, v.name))

    stateful = any(f.flags & FILTER_STATEFUL for f in sub_filters)
    n_in = max(f.n_in for f in sub_filters)
    in_channels = sub_filters[0].in_channels if n_in <= 1 else \
        max((f.in_channels for f in sub_filters), key=len)

    def _sub_params(i: int, params: dict) -> dict:
        f = sub_filters[i]
        out = {p.name: p.default for p in f.params}
        for pname, v in steps[i][1].items():
            if not isinstance(v, Export):
                out[pname] = v
        for (si, sp, en) in export_map:
            if si == i:
                out[sp] = params[en]
        return out

    def process_stateless(ins, params, ctx):
        layers = list(ins)
        for i, f in enumerate(sub_filters):
            inst = Instance(filter=f, values=_sub_params(i, params),
                            in_tracks=tuple(range(f.n_in)))
            layers = apply_instance(inst, layers, ctx)
        return layers[0]

    def process_stateful(ins, params, ctx, state):
        layers = list(ins)
        state = list(state) if state is not None \
            else [None] * len(sub_filters)
        for i, f in enumerate(sub_filters):
            inst = Instance(filter=f, values=_sub_params(i, params),
                            state=state[i],
                            in_tracks=tuple(range(f.n_in)))
            layers = apply_instance(inst, layers, ctx)
            state[i] = inst.state
        return layers[0], tuple(state)

    def init_state(w, h, pal):
        return tuple(f.init_state(w, h, pal) if f.init_state else None
                     for f in sub_filters)

    return register_filter(Filter(
        name=name,
        process=process_stateful if stateful else process_stateless,
        in_channels=in_channels,
        params=tuple(exported),
        flags=FILTER_STATEFUL if stateful else 0,
        init_state=init_state if stateful else None,
        description=description or
        f"compound: {' -> '.join(f.name for f in sub_filters)}"))


def register_builtin_compounds():
    """A few stock compounds in the spirit of plugins/effects/compound/."""
    from .host import _REGISTRY
    if "dream" in _REGISTRY:
        return
    make_compound("dream", [
        ("gaussian_blur", {"radius": 6, "amount": Export("haze")}),
        ("softlight", {"amount": 0.8}),
        ("saturation", {"saturation": 1.4}),
    ], description="soft hazy glow")
    make_compound("night_vision", [
        ("greyscale", {}),
        ("brightness_contrast", {"brightness": 0.15,
                                 "contrast": Export("gain")}),
        ("tint", {"red": 0.1, "green": 1.0, "blue": 0.2, "amount": 1.0}),
        ("vignette", {"amount": 0.9, "strength": 1.5}),
    ], description="green NV goggles look")
    make_compound("vhs", [
        ("rgb_delay", {"delay_r": 0.0, "delay_g": 1.0, "delay_b": 2.0}),
        ("saturation", {"saturation": Export("colour")}),
        ("motion_blur", {"radius": 3, "amount": 0.5}),
    ], description="chroma-shifted tape look")
