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
