"""Data-plugin family: param-stream utilities that wire through data
connections (effects/data.py) to automate other filters.

TPU-native re-expressions of the reference data plugins
(`/root/reference/lives-plugins/weed-plugins/`):
  data_unpacker.c   — flatten array-valued in params to scalar outs
  data_counter.c    — boolean transition counters with on/off thresholds
  log_sig.c         — sigmoid squash of in params
  nn_programmer.c   — evolving random 2-layer net (fitness-driven walk)
(alpha_visualizer.c lives in builtin/alpha.py with the cconx family)

Like `data_processor`/`randomiser` (extra.py), pure data filters take a
pass-through video input so they slot into effect chains; their real work
happens in out-params. Slot counts are scaled down from the reference's
UI-driven maxima (128 ins / 16 counters) to connection-practical sizes;
semantics per slot are preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import Palette
from ..host import (ChannelTemplate, FILTER_IS_TRANSITION, FILTER_STATEFUL,
                    Filter, Param, register_filter)
from ..util import from_f01, join_alpha, luma, split_alpha, to_f01

_RGBX = (Palette.RGB24, Palette.RGBA32)
_ONE_IN = (ChannelTemplate("in", _RGBX),)

_N_UNPACK_IN = 8
_N_UNPACK_OUT = 16
_N_SIG = 8
_N_COUNT = 4
_NN_IN = 4
_NN_HIDDEN = 16
_NN_OUT = 4


# alpha_visualizer moved to builtin/alpha.py (now a true cconx consumer
# with an alpha in-channel; the unconnected fallback keeps this module's
# old own-alpha/luma behaviour)


# -- data_unpacker ------------------------------------------------------------

def _unpack_analyse(ins, p, ctx):
    """data_unpacker.c:39 dunpack_process: concatenate the (possibly
    array-valued) inputs in order and emit one scalar per out slot, with
    optional clamping to [-range, range]."""
    vals = []
    for i in range(_N_UNPACK_IN):
        v = jnp.atleast_1d(jnp.asarray(p[f"in{i}"], jnp.float32)).ravel()
        vals.append(v)
    flat = jnp.concatenate(vals)
    rng = jnp.asarray(p["range"], jnp.float32)
    flat = jnp.where(jnp.asarray(p["clamp"]) > 0.5,
                     jnp.clip(flat, -rng, rng), flat)
    n = min(_N_UNPACK_OUT, flat.shape[0])
    return {f"o{j}": flat[j] for j in range(n)}


register_filter(Filter(
    name="data_unpacker",
    process=lambda ins, p, ctx: ins[0] if ins else None,
    in_channels=_ONE_IN,
    params=tuple(Param(f"in{i}", "num", 0.0, -1e12, 1e12)
                 for i in range(_N_UNPACK_IN))
    + (Param("clamp", "num", 1.0, 0.0, 1.0),
       Param("range", "num", 1.0, 0.0, 1e12)),
    out_params=tuple(Param(f"o{j}", "num", 0.0, -1e12, 1e12)
                     for j in range(_N_UNPACK_OUT)),
    analyse=_unpack_analyse,
    description="flatten array params to scalar outs (data_unpacker.c)"))


# -- log_sig ------------------------------------------------------------------

def _log_sig_analyse(ins, p, ctx):
    """log_sig.c:41 logsig_process: out = 1 / (1 + exp(-in))."""
    return {f"o{i}": jax.nn.sigmoid(jnp.asarray(p[f"in{i}"], jnp.float32))
            for i in range(_N_SIG)}


register_filter(Filter(
    name="log_sig",
    process=lambda ins, p, ctx: ins[0] if ins else None,
    in_channels=_ONE_IN,
    params=tuple(Param(f"in{i}", "num", 0.0, -1e12, 1e12)
                 for i in range(_N_SIG)),
    out_params=tuple(Param(f"o{i}", "num", 0.5, 0.0, 1.0)
                     for i in range(_N_SIG)),
    analyse=_log_sig_analyse,
    description="sigmoid squash of in params (log_sig.c)"))


# -- data_counter -------------------------------------------------------------

def _counter_init(w, h, palette):
    return {"counts": jnp.zeros(_N_COUNT, jnp.int32),
            "ovals": jnp.zeros(_N_COUNT, jnp.bool_),
            "outs": jnp.zeros(_N_COUNT, jnp.bool_)}


def _counter_process(ins, p, ctx, state):
    """data_counter.c:61 dcount_process: per slot, count boolean input
    transitions (rising and/or falling per `count_rising`/`count_falling`);
    after `oncount{j}` transitions the out flips TRUE, after `offcount{j}`
    more it flips back FALSE. Turns fast triggers (beats) into slower
    phrase-level switches."""
    cur = jnp.stack([jnp.asarray(p[f"input{j}"], jnp.float32) > 0.5
                     for j in range(_N_COUNT)])
    oncnt = jnp.stack([jnp.asarray(p[f"oncount{j}"], jnp.int32)
                       for j in range(_N_COUNT)])
    offcnt = jnp.stack([jnp.asarray(p[f"offcount{j}"], jnp.int32)
                        for j in range(_N_COUNT)])
    rising = jnp.logical_and(cur, ~state["ovals"])
    falling = jnp.logical_and(~cur, state["ovals"])
    counted = jnp.logical_or(
        jnp.logical_and(rising, jnp.asarray(p["count_rising"]) > 0.5),
        jnp.logical_and(falling, jnp.asarray(p["count_falling"]) > 0.5))
    counts = state["counts"] + counted.astype(jnp.int32)
    target = jnp.where(state["outs"], offcnt, oncnt)
    flip = counts >= target
    outs = jnp.where(flip, ~state["outs"], state["outs"])
    counts = jnp.where(flip, 0, counts)
    new_state = {"counts": counts, "ovals": cur, "outs": outs}
    out_values = {f"out{j}": outs[j].astype(jnp.float32)
                  for j in range(_N_COUNT)}
    return (ins[0] if ins else None), new_state, out_values


register_filter(Filter(
    name="data_counter", process=_counter_process, in_channels=_ONE_IN,
    flags=FILTER_STATEFUL, init_state=_counter_init,
    params=tuple(Param(f"input{j}", "num", 0.0, 0.0, 1.0)
                 for j in range(_N_COUNT))
    + tuple(Param(f"oncount{j}", "int", 8, 1, 256)
            for j in range(_N_COUNT))
    + tuple(Param(f"offcount{j}", "int", 8, 1, 256)
            for j in range(_N_COUNT))
    + (Param("count_rising", "num", 1.0, 0.0, 1.0),
       Param("count_falling", "num", 0.0, 0.0, 1.0)),
    out_params=tuple(Param(f"out{j}", "num", 0.0, 0.0, 1.0)
                     for j in range(_N_COUNT)),
    description="boolean transition counters (data_counter.c)"))


# -- nn_programmer ------------------------------------------------------------

def _nn_init(w, h, palette):
    k = jax.random.PRNGKey(4242)
    k1, k2, k3 = jax.random.split(k, 3)
    return {"w1": jax.random.uniform(k1, (_NN_HIDDEN, _NN_IN),
                                     minval=-1.0, maxval=1.0),
            "w2": jax.random.uniform(k2, (_NN_OUT, _NN_HIDDEN),
                                     minval=-1.0, maxval=1.0),
            "c": jax.random.uniform(k3, (_NN_HIDDEN + _NN_OUT,),
                                    minval=-1.0, maxval=1.0)}


def _nn_walk(v, rval):
    """nn_programmer.c:112-136: bounded random walk — positive steps pull
    toward +1, negative toward -1, never escaping [-1, 1]."""
    return jnp.clip(v + jnp.where(rval > 0, (1.0 - v) * rval,
                                  (1.0 + v) * rval), -1.0, 1.0)


def _nn_process(ins, p, ctx, state):
    """nn_programmer.c: a random 2-layer net over the inputs whose weights
    random-walk each frame, scaled by (1 - fitness): fitness 1 freezes the
    program, 0 mutates fast. (The reference emits the evolved net as
    data_processor equation strings; here the net itself runs and its
    outputs feed connections directly.)"""
    fit = (1.0 - jnp.asarray(p["fitness"], jnp.float32))
    key = jax.random.fold_in(jax.random.PRNGKey(2121),
                             jnp.asarray(ctx.frame, jnp.int32))
    kw1, kw2, kc = jax.random.split(key, 3)
    # NGAUSS=4 uniform sum ~ gaussian-ish step, scaled like the reference
    def step(k, shape):
        return jax.random.uniform(k, shape + (4,), minval=-1.0,
                                  maxval=1.0).sum(-1) * fit / 4.0
    w1 = _nn_walk(state["w1"], step(kw1, state["w1"].shape))
    w2 = _nn_walk(state["w2"], step(kw2, state["w2"].shape))
    c = _nn_walk(state["c"], step(kc, state["c"].shape))
    x = jnp.stack([jnp.asarray(p[n], jnp.float32)
                   for n in ("a", "b", "c", "d")])
    hidden = jnp.tanh(w1 @ x + c[:_NN_HIDDEN])
    outs = jnp.tanh(w2 @ hidden + c[_NN_HIDDEN:])
    new_state = {"w1": w1, "w2": w2, "c": c}
    out_values = {f"o{i}": outs[i] * 0.5 + 0.5 for i in range(_NN_OUT)}
    return (ins[0] if ins else None), new_state, out_values


register_filter(Filter(
    name="nn_programmer", process=_nn_process, in_channels=_ONE_IN,
    flags=FILTER_STATEFUL, init_state=_nn_init,
    params=(Param("fitness", "num", 0.9, 0.0, 1.0),
            Param("a", "num", 0.0, -1.0, 1.0),
            Param("b", "num", 0.0, -1.0, 1.0),
            Param("c", "num", 0.0, -1.0, 1.0),
            Param("d", "num", 0.0, -1.0, 1.0)),
    out_params=tuple(Param(f"o{i}", "num", 0.5, 0.0, 1.0)
                     for i in range(_NN_OUT)),
    description="evolving random net data mapper (nn_programmer.c)"))


# -- smoother -----------------------------------------------------------------

_N_SMOOTH = 4


def _smooth_init(w, h, palette):
    return jnp.zeros(_N_SMOOTH, jnp.float32)


def _smooth_process(ins, p, ctx, state):
    """EMA smoother for param streams — the reference wires this role via
    data_processor state expressions (e.g. compound/image_stabilizer's
    s[0]=(s[0]+i[0]*8.)/2.). `rate` 1.0 follows instantly, 0 freezes."""
    cur = jnp.stack([jnp.asarray(p[f"in{j}"], jnp.float32)
                     for j in range(_N_SMOOTH)])
    rate = jnp.clip(jnp.asarray(p["rate"], jnp.float32), 0.0, 1.0)
    new = state + (cur - state) * rate
    outs = {f"o{j}": new[j] for j in range(_N_SMOOTH)}
    return (ins[0] if ins else None), new, outs


register_filter(Filter(
    name="smoother", process=_smooth_process, in_channels=_ONE_IN,
    flags=FILTER_STATEFUL, init_state=_smooth_init,
    params=tuple(Param(f"in{j}", "num", 0.0, -1e6, 1e6)
                 for j in range(_N_SMOOTH))
    + (Param("rate", "num", 0.5, 0.0, 1.0),),
    out_params=tuple(Param(f"o{j}", "num", 0.0, -1e6, 1e6)
                     for j in range(_N_SMOOTH)),
    description="EMA smoothing of param streams (data_processor s[] role)"))


# -- integrator ---------------------------------------------------------------

def _integ_init(w, h, palette):
    return jnp.zeros(_N_SMOOTH, jnp.float32)


def _integ_process(ins, p, ctx, state):
    """Leaky integrator for param streams: state = state*decay + in.
    Turns per-frame velocities (optical flow) into positions — the
    image-stabilizer accumulator (compound/image_stabilizer's s[] role,
    with decay bounding drift)."""
    cur = jnp.stack([jnp.asarray(p[f"in{j}"], jnp.float32)
                     for j in range(_N_SMOOTH)])
    decay = jnp.clip(jnp.asarray(p["decay"], jnp.float32), 0.0, 1.0)
    new = state * decay + cur
    outs = {f"o{j}": new[j] for j in range(_N_SMOOTH)}
    return (ins[0] if ins else None), new, outs


register_filter(Filter(
    name="integrator", process=_integ_process, in_channels=_ONE_IN,
    flags=FILTER_STATEFUL, init_state=_integ_init,
    params=tuple(Param(f"in{j}", "num", 0.0, -1e6, 1e6)
                 for j in range(_N_SMOOTH))
    + (Param("decay", "num", 0.95, 0.0, 1.0),),
    out_params=tuple(Param(f"o{j}", "num", 0.0, -1e6, 1e6)
                     for j in range(_N_SMOOTH)),
    description="leaky integrator (velocity -> position accumulator)"))


# -- timer --------------------------------------------------------------------

def _timer_init(w, h, palette):
    return {"started": jnp.zeros((), jnp.bool_),
            "start": jnp.zeros((), jnp.float32),
            "reset_at": jnp.zeros((), jnp.float32),
            "was_reset": jnp.zeros((), jnp.bool_)}


def _timer_process(ins, p, ctx, state):
    """scripts/timer.script: absolute / relative / since-reset clocks as
    out params, with an edge-triggered reset input (feed `was_reset`
    back through a data connection to make one-shot resets)."""
    tc = jnp.asarray(ctx.tc, jnp.float32)
    started = state["started"]
    start = jnp.where(started, state["start"], tc)
    reset_req = jnp.asarray(p["reset"], jnp.float32) > 0.5
    do_reset = reset_req & ~state["was_reset"]
    reset_at = jnp.where(started, jnp.where(do_reset, tc,
                                            state["reset_at"]), tc)
    new_state = {"started": jnp.ones((), jnp.bool_),
                 "start": start, "reset_at": reset_at,
                 "was_reset": reset_req}
    outs = {"relative": tc - start, "absolute": tc,
            "sincereset": tc - reset_at,
            "was_reset": reset_req.astype(jnp.float32)}
    return (ins[0] if ins else None), new_state, outs


register_filter(Filter(
    name="timer", process=_timer_process, in_channels=_ONE_IN,
    flags=FILTER_STATEFUL, init_state=_timer_init,
    params=(Param("reset", "num", 0.0, 0.0, 1.0),),
    out_params=(Param("relative", "num", 0.0, 0.0, 1e9),
                Param("absolute", "num", 0.0, 0.0, 1e9),
                Param("sincereset", "num", 0.0, 0.0, 1e9),
                Param("was_reset", "num", 0.0, 0.0, 1.0)),
    description="timecode clocks for data connections "
                "(scripts/timer.script)"))
