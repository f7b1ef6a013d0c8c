"""Data connections: wire analyser out-params into downstream in-params
("pconx", reference `src/effects-data.c`: `pconx_new/append/find`
:187-433, applied via `pconx_chain_data` before each instance runs).

Connections reference Instance objects directly (the reference keys on
key/mode slots). `autoscale` maps the source's declared out-param range onto
the destination param's [min, max] (reference autoscaling). An `ACTIVATE`
destination toggles the instance instead of a parameter.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from .host import FrameContext, Instance, apply_instance

ACTIVATE = "__activate__"  # special in-param: enables/disables the instance


@dataclass
class Connection:
    src: Instance
    out_param: str
    dst: Instance
    in_param: str
    autoscale: bool = False


class DataConnections:
    """The datacons map (persisted as resources/datacons.map in the
    reference; serialisable here via to/from_list)."""

    def __init__(self):
        self.conns: list[Connection] = []

    def add(self, src: Instance, out_param: str, dst: Instance,
            in_param: str, autoscale: bool = False) -> Connection:
        if in_param != ACTIVATE:
            dst.filter.param(in_param)  # validate
        c = Connection(src, out_param, dst, in_param, autoscale)
        self.conns.append(c)
        return c

    def remove(self, c: Connection):
        self.conns.remove(c)

    def chain_data(self, dst: Instance):
        """Push connected source out-values into dst (pconx_chain_data)."""
        for c in self.conns:
            if c.dst is not dst or c.out_param not in c.src.out_values:
                continue
            v = c.src.out_values[c.out_param]
            if c.in_param == ACTIVATE:
                dst.enabled = bool(v) if not hasattr(v, "shape") else dst.enabled
                continue
            p = dst.filter.param(c.in_param)
            if c.autoscale:
                src_p = next((q for q in c.src.filter.out_params
                              if q.name == c.out_param), None)
                if src_p is not None and src_p.max > src_p.min:
                    v = (v - src_p.min) / (src_p.max - src_p.min) \
                        * (p.max - p.min) + p.min
            dst.values[c.in_param] = p.clamp(v)


def save_datacons(conns: "DataConnections", keymap, path):
    """Persist connections keyed by (key, mode) slots (the reference's
    resources/datacons.map model). Only connections whose endpoints are
    keymap instances are saved."""
    import json

    def slot_of(inst):
        for k, cand in enumerate(keymap.instances):
            if cand is inst:
                return k, keymap.mode[k]
        return None

    out = []
    for c in conns.conns:
        src, dst = slot_of(c.src), slot_of(c.dst)
        if src is None or dst is None:
            continue
        out.append({"src_key": src[0], "src_mode": src[1],
                    "out_param": c.out_param,
                    "dst_key": dst[0], "dst_mode": dst[1],
                    "in_param": c.in_param, "autoscale": c.autoscale})
    with open(path, "w") as fh:
        json.dump({"format": "lives_tpu_datacons", "version": 1,
                   "connections": out}, fh, indent=1)


def load_datacons(keymap, path) -> "DataConnections":
    """Rebuild connections against a keymap (instantiating filters for
    slots that have none yet)."""
    import json
    with open(path) as fh:
        d = json.load(fh)
    conns = DataConnections()
    for c in d["connections"]:
        for k in (c["src_key"], c["dst_key"]):
            if keymap.instances[k] is None:
                keymap.toggle(k, True)
                keymap.toggle(k, False)  # instantiate without enabling
        src = keymap.instances[c["src_key"]]
        dst = keymap.instances[c["dst_key"]]
        if src is None or dst is None:
            continue
        conns.add(src, c["out_param"], dst, c["in_param"], c["autoscale"])
    return conns


def apply_chain_connected(instances: Sequence[Instance], layers,
                          ctx: FrameContext | None = None,
                          connections: DataConnections | None = None):
    """apply_chain with pconx data flow between instances."""
    layers = list(layers)
    for inst in instances:
        if connections is not None:
            connections.chain_data(inst)
        layers = apply_instance(inst, layers, ctx)
    return layers[0]
