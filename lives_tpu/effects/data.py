"""Data connections: wire analyser out-params into downstream in-params
("pconx", reference `src/effects-data.c`: `pconx_new/append/find`
:187-433, applied via `pconx_chain_data` before each instance runs) and
alpha out-channels into downstream alpha in-channels ("cconx",
`cconx_new` :1730, `cconx_add_connection` :2106, `cconx_chain_data`
:2283 — how analyser masks feed compositing filters).

Connections reference Instance objects directly (the reference keys on
key/mode slots). `autoscale` maps the source's declared out-param range onto
the destination param's [min, max] (reference autoscaling). An `ACTIVATE`
destination toggles the instance instead of a parameter.

Channel connections are palette-negotiated at the destination
(`cconx_convert_pixel_data` :2183 — A8/A1/AFLOAT conversion happens in
`negotiate_layer` via `ops.colorspace.convert_layer`); inside a jitted
FrameGraph template the alpha layer flows source->destination as a traced
array in the SAME computation (see graph/nodemodel.py `cconx=`).
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


@dataclass
class ChannelConnection:
    """Alpha out-channel -> alpha in-channel slot (lives_cconnect_t)."""
    src: Instance
    out_channel: str      # name of a template in src.filter.alpha_outs
    dst: Instance
    in_slot: int          # index into dst.filter.alpha_ins


class DataConnections:
    """The datacons map (persisted as resources/datacons.map in the
    reference; serialisable here via to/from_list)."""

    def __init__(self):
        self.conns: list[Connection] = []
        self.chan_conns: list[ChannelConnection] = []

    def add(self, src: Instance, out_param: str, dst: Instance,
            in_param: str, autoscale: bool = False) -> Connection:
        if in_param != ACTIVATE:
            dst.filter.param(in_param)  # validate
        c = Connection(src, out_param, dst, in_param, autoscale)
        self.conns.append(c)
        return c

    def add_channel(self, src: Instance, out_channel: str, dst: Instance,
                    in_slot: int) -> ChannelConnection:
        """cconx_add_connection (effects-data.c:2106): an in-channel slot
        accepts ONE source, so an existing connection to (dst, in_slot) is
        replaced (the reference deletes it first,
        cconx_add_connection_private :1982)."""
        if not any(t.name == out_channel for t in src.filter.alpha_outs):
            raise KeyError(f"{src.filter.name}: no alpha out-channel "
                           f"{out_channel!r}")
        if not 0 <= in_slot < len(dst.filter.alpha_ins):
            raise IndexError(f"{dst.filter.name}: no alpha in-channel slot "
                             f"{in_slot}")
        self.chan_conns = [c for c in self.chan_conns
                           if not (c.dst is dst and c.in_slot == in_slot)]
        c = ChannelConnection(src, out_channel, dst, in_slot)
        self.chan_conns.append(c)
        return c

    def remove(self, c):
        if isinstance(c, ChannelConnection):
            self.chan_conns.remove(c)
        else:
            self.conns.remove(c)

    def prune(self, live: set[int]) -> int:
        """Drop connections whose endpoints are no longer live instances
        (the reference deletes pconx/cconx entries when the instance
        deinits, effects-data.c pconx_delete) — `live` holds id()s of
        currently-keyed instances. Returns the number removed."""
        before = len(self.conns) + len(self.chan_conns)
        self.conns = [c for c in self.conns
                      if id(c.src) in live and id(c.dst) in live]
        self.chan_conns = [c for c in self.chan_conns
                           if id(c.src) in live and id(c.dst) in live]
        return before - len(self.conns) - len(self.chan_conns)

    def alpha_ins_for(self, dst: Instance) -> dict[int, Any]:
        """Connected alpha layers for a destination (cconx_chain_data,
        effects-data.c:2283): the most recent Layer each source exported.
        Host-side path — inside a FrameGraph template the wiring is traced
        instead (same-frame, one computation)."""
        out = {}
        for c in self.chan_conns:
            if c.dst is dst and c.out_channel in c.src.out_channels:
                out[c.in_slot] = c.src.out_channels[c.out_channel]
        return out

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
    chans = []
    for c in conns.chan_conns:
        src, dst = slot_of(c.src), slot_of(c.dst)
        if src is None or dst is None:
            continue
        chans.append({"src_key": src[0], "src_mode": src[1],
                      "out_channel": c.out_channel,
                      "dst_key": dst[0], "dst_mode": dst[1],
                      "in_slot": c.in_slot})
    with open(path, "w") as fh:
        json.dump({"format": "lives_tpu_datacons", "version": 2,
                   "connections": out, "channel_connections": chans},
                  fh, indent=1)


def load_datacons(keymap, path) -> "DataConnections":
    """Rebuild connections against a keymap (instantiating filters for
    slots that have none yet)."""
    import json
    with open(path) as fh:
        d = json.load(fh)
    conns = DataConnections()

    def endpoints(c):
        for k in (c["src_key"], c["dst_key"]):
            if keymap.instances[k] is None:
                keymap.toggle(k, True)
                keymap.toggle(k, False)  # instantiate without enabling
        return keymap.instances[c["src_key"]], keymap.instances[c["dst_key"]]

    for c in d["connections"]:
        src, dst = endpoints(c)
        if src is None or dst is None:
            continue
        conns.add(src, c["out_param"], dst, c["in_param"], c["autoscale"])
    for c in d.get("channel_connections", ()):
        src, dst = endpoints(c)
        if src is None or dst is None:
            continue
        conns.add_channel(src, c["out_channel"], dst, c["in_slot"])
    return conns


def apply_chain_connected(instances: Sequence[Instance], layers,
                          ctx: FrameContext | None = None,
                          connections: DataConnections | None = None):
    """apply_chain with pconx + cconx data flow between instances."""
    layers = list(layers)
    for inst in instances:
        alpha = None
        if connections is not None:
            connections.chain_data(inst)
            alpha = connections.alpha_ins_for(inst) or None
        layers = apply_instance(inst, layers, ctx, alpha_ins=alpha)
    return layers[0]
