"""Fused STATEFUL sweep: the whole plan of a stateful chain — in-VMEM
track generation, the stateless steps, AND the EffecTV-class stateful
steps with their state held in VMEM across frames — as ONE pallas
kernel per chunk.

The 3-phase stateful path (graph/nodemodel.py: [prefix sweep] ->
[lax.scan middle] -> [suffix sweep]) round-trips a float comp and the
state through HBM every frame. This kernel removes both: the grid is
(B, H//TH) iterated fully sequentially (frames outer, row-bands inner),
state planes live in VMEM scratch (or directly in the final-state
output buffer) and persist across grid steps, so HBM traffic is the u8
frame write plus one final-state flush.

This is the terminal form of the reference's stateful plugin hosting
(weed plugins keep `plugin_internal` state between process_frame calls,
e.g. fireTV.c's buffer) re-imagined for the TPU memory hierarchy.

Correctness model (the zero-collective band-sweep principle applied to
state): every value a band needs outside its rows is either generated
from clamped coordinates (bit-identical to the neighbour band's own
computation) or read from the PREVIOUS frame's state plane. Bands that
must read state rows ABOVE themselves ping-pong two planes (the rows
above were already overwritten this frame); bands reading only below /
their own rows update one plane in place — frames-outer order
guarantees rows below still hold the previous frame's values.

Stateful filters supported here implement their spatial math in
`*_core` functions shared with the XLA filters
(effects/builtin/effectv.py) — one source of truth, edge-CLAMPED
shifts, so the kernel's clamped-halo generation reproduces the XLA
path bit-exactly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import Gamma, Palette
from ..effects.host import FILTER_STATEFUL, FrameContext
from ..layer import Layer
from .pallas_composite import (COORD_SAFE, HAVE_PALLAS, PALLAS_SAFE,
                               _pick_sweep_tile, _stencil_fns,
                               _sweep_vmem_bytes)

if HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _stateful_table():
    """name -> (halo, state_kind). halo = rows consumed like a stencil
    radius; state_kind in {"f32hw", "u8hw", "f32chw"} (the XLA state
    contract's dtype/shape). reads_above decides in-place vs ping-pong
    per chain (computed at build time from the remaining halo)."""
    return {
        "fire": (1, "f32hw"),          # reads 1 row BELOW (rising flames)
        "life": (1, "u8hw"),           # reads +/-1 rows (neighbour count)
        "alien_overlay": (0, "f32chw"),  # pointwise ghost
    }


def _state_reads_above(name: str, cur_after: int) -> int:
    """Rows ABOVE the band's own rows the step reads from the previous
    frame's state plane. fire's mid_ext starts at the out span's top
    (cur_after rows above the band); life adds its top neighbour row."""
    if name == "life":
        return cur_after + 1
    return cur_after


def stateful_sweep_len(chain) -> bool:
    """True when the WHOLE chain qualifies for the fused stateful
    sweep (used by nodemodel to decide before building)."""
    table = _stateful_table()
    safe = PALLAS_SAFE | COORD_SAFE | set(_stencil_fns())
    any_stateful = False
    for inst in chain:
        if not inst.enabled:
            continue
        name = inst.filter.name
        if inst.filter.flags & FILTER_STATEFUL:
            if name not in table:
                return False
            any_stateful = True
        elif name not in safe:
            return False
    return any_stateful


def build_fused_stateful_sweep(chain_spec, n_tracks: int, B: int, H: int,
                               W: int, rows_key, fps: float, source,
                               sink):
    """Returns fn(src_ids (2,T,B) i32, packed (P+2,B) f32,
    states list-per-instance) -> ((B,3,H,W) u8, new states list),
    or None when the chain/source/sink does not qualify.

    Requirements beyond build_fused_sweep's: stateful steps must be in
    `_stateful_table()` with in/out track 0, and the total VMEM
    estimate (track tiles + state planes) must fit the scoped limit.
    """
    from ..prefs import pref
    interpret = pref("pallas_interpret") == "1"
    if not HAVE_PALLAS or W % 128 != 0:
        return None
    if not interpret and jax.default_backend() != "tpu":
        return None
    if source is None or not hasattr(source, "traced_tile") \
            or getattr(source, "alpha", False):
        return None
    if sink.palette != Palette.RGB24 or sink.letterbox:
        return None
    if sink.width not in (0, W) or sink.height not in (0, H):
        return None
    if sink.gamma != Gamma.SRGB:
        return None

    table = _stateful_table()
    stencils = _stencil_fns()
    plan: list[tuple] = []
    R = 0
    seen_stencil = False
    n_stateful = 0
    for (filt, static, in_tr, out_tr, enabled) in chain_spec:
        if not enabled:
            plan.append(("skip",))
            continue
        if tuple(out_tr) != (0,):
            return None
        name = filt.name
        if filt.flags & FILTER_STATEFUL:
            if name not in table or tuple(in_tr[:1]) != (0,):
                return None
            halo, kind = table[name]
            plan.append(("stateful", name, kind))
            R += halo
            n_stateful += 1
        elif name in stencils:
            rp = filt.param("radius")
            r = max(1, int(static.get("radius", rp.default)))
            r = min(r, int(rp.max))
            if r > 16:
                return None
            plan.append(("stencil", r))
            R += r
            seen_stencil = True
        elif name in PALLAS_SAFE or name in COORD_SAFE:
            # multi-input steps are legal ANYWHERE here: non-0 tracks
            # regenerate at the current halo (see gen_track)
            used = tuple(in_tr[: filt.n_in])
            if used and max(used) >= n_tracks:
                return None
            plan.append(("point",))
        else:
            return None
    if not n_stateful:
        return None
    TH = _pick_sweep_tile(H)
    if TH is None or TH < R + 2 or H // TH < 1:
        return None
    nT = H // TH

    # --- per-step halo bookkeeping + state layout decisions -------------
    # walk once to assign, per stateful step: remaining halo AFTER the
    # step (cur_after), in-place vs ping-pong, scratch/operand shapes
    state_steps = []   # (plan_idx, name, kind, cur_after, pingpong)
    cur = R
    for pi, step in enumerate(plan):
        if step[0] == "stencil":
            cur -= step[1]
        elif step[0] == "stateful":
            name, kind = step[1], step[2]
            cur -= table[name][0]
            pingpong = _state_reads_above(name, cur) > 0
            # u8 states must ping-pong (the f32 working pair carries the
            # continuous values); life always does — guard future table
            # entries rather than keeping a dead in-place-u8 branch
            assert pingpong or kind != "u8hw", name
            state_steps.append((pi, name, kind, cur, pingpong))

    def _state_bytes(kind):
        return {"f32hw": H * W * 4, "u8hw": H * W,
                "f32chw": 3 * H * W * 4}[kind]

    # VMEM estimate: per-track band tiles (+comp) + state planes
    # (ping-pong keeps an f32 working copy even for u8 states) + stencil
    # scratch; gate at 80% of the scoped limit
    est = (n_tracks + 2) * 3 * (TH + 2 * R) * (W + 2 * R) * 4
    for _, name, kind, cur_after, pingpong in state_steps:
        work_bytes = {"f32hw": H * W * 4, "u8hw": H * W * 4,
                      "f32chw": 3 * H * W * 4}[kind]
        est += _state_bytes(kind)              # init operand + out buffer
        est += _state_bytes(kind)
        est += (2 * work_bytes) if pingpong else 0

    # scratch layout: stencil scratches (as in build_fused_sweep), then
    # per ping-pong state a (2, ...) f32 working pair, then per stateful
    # step a staging ref, then per halo-consuming step a fixup buffer
    scratch_shapes = []
    cur = R
    stencil_scratch_idx = []
    for step in plan:
        if step[0] == "stencil":
            stencil_scratch_idx.append(len(scratch_shapes))
            scratch_shapes.append(
                pltpu.VMEM((3, TH + 2 * cur, W + 2 * cur), jnp.float32))
            cur -= step[1]
        elif step[0] == "stateful":
            cur -= table[step[1]][0]
    state_scratch_idx = {}
    for si, (_, name, kind, cur_after, pingpong) in enumerate(state_steps):
        shape = (3, H, W) if kind == "f32chw" else (H, W)
        if pingpong:
            state_scratch_idx[si] = len(scratch_shapes)
            scratch_shapes.append(pltpu.VMEM((2,) + shape, jnp.float32))
        else:
            state_scratch_idx[si] = None
    stage_scratch_idx = {}
    for si, (_, name, kind, cur_after, pingpong) in enumerate(state_steps):
        a_top = _state_reads_above(name, cur_after)
        n_below = {"fire": cur_after + 1, "life": cur_after + 1,
                   "alien_overlay": cur_after}[name]
        n_stage = TH + a_top + n_below
        ws = W + 2 * cur_after
        shape = (3, n_stage, ws) if kind == "f32chw" else (n_stage, ws)
        stage_scratch_idx[si] = len(scratch_shapes)
        scratch_shapes.append(pltpu.VMEM(shape, jnp.float32))
    # halo fixup scratch: a halo-consuming step's output at out-of-frame
    # positions must be EDGE-REPLICATED (the XLA padding the next
    # consuming step assumes) — fire/life compute shifted values there,
    # and a stencil's value AT a replicated row differs from its edge
    # row. Applied after EVERY consuming step with halo remaining, via a
    # ref round-trip (outputs are iota-tainted, unsliceable in Mosaic).
    fix_scratch_idx = {}
    cur = R
    for pi, step in enumerate(plan):
        if step[0] == "stencil":
            cur -= step[1]
        elif step[0] == "stateful":
            cur -= table[step[1]][0]
        else:
            continue
        if cur > 0:
            fix_scratch_idx[pi] = len(scratch_shapes)
            scratch_shapes.append(pltpu.VMEM(
                (3, TH + 2 * cur, W + 2 * cur), jnp.float32))
            est += 3 * (TH + 2 * cur) * (W + 2 * cur) * 4

    limit = _sweep_vmem_bytes() or (64 << 20)
    if est > 0.8 * limit:
        return None

    P = len(rows_key)
    inv255 = np.float32(1.0 / 255.0)

    def kernel(params_ref, ids_ref, *rest):
        init_refs = rest[:n_stateful]
        out_ref = rest[n_stateful]
        stout_refs = rest[n_stateful + 1: 2 * n_stateful + 1]
        scratches = rest[2 * n_stateful + 1:]
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * TH

        # ---- state plane plumbing ----------------------------------
        def work_ref(si):
            """(plane ref accessor) for step si: returns (read_fn,
            write_fn). read_fn(row_start, n) -> f32 rows from the
            PREVIOUS frame's plane; write_fn(rows_value) stores this
            frame's center rows [r0, r0+TH)."""
            _, name, kind, cur_after, pingpong = state_steps[si]
            chw = kind == "f32chw"
            sref = scratches[state_scratch_idx[si]] \
                if state_scratch_idx[si] is not None else None
            oref = stout_refs[si]

            def to_f32(v):
                if v.dtype == jnp.uint8:
                    return v.astype(jnp.int32).astype(jnp.float32)
                return v.astype(jnp.float32)

            if pingpong:
                rp = (b + 1) % 2
                wp = b % 2

                @pl.when((b == 0) & (i == 0))
                def _():
                    sref[pl.ds(1, 1)] = to_f32(init_refs[si][...])[None]

                def read(start, n):
                    if chw:
                        return sref[pl.ds(rp, 1), :, pl.ds(start, n), :][0]
                    return sref[pl.ds(rp, 1), pl.ds(start, n), :][0]

                def write(rows):
                    if chw:
                        sref[pl.ds(wp, 1), :, pl.ds(r0, TH), :] = \
                            rows[None]
                        oref[:, pl.ds(r0, TH), :] = _to_out(rows, kind)
                    else:
                        sref[pl.ds(wp, 1), pl.ds(r0, TH), :] = rows[None]
                        oref[pl.ds(r0, TH), :] = _to_out(rows, kind)
            else:                    # in-place f32: state IS the output
                @pl.when((b == 0) & (i == 0))
                def _():
                    oref[...] = init_refs[si][...]

                def read(start, n):
                    if chw:
                        return oref[:, pl.ds(start, n), :]
                    return oref[pl.ds(start, n), :]

                def write(rows):
                    if chw:
                        oref[:, pl.ds(r0, TH), :] = rows
                    else:
                        oref[pl.ds(r0, TH), :] = rows
            return read, write

        def _to_out(rows, kind):
            if kind == "u8hw":
                return jnp.clip(rows, 0, 255).astype(jnp.int32) \
                    .astype(jnp.uint8)
            return rows

        def staged_state(si, read):
            """The previous frame's state over the step's extended row
            span, edge-clamped rows AND columns, via the staging
            scratch (three band variants under pl.when)."""
            _, name, kind, cur_after, pingpong = state_steps[si]
            chw = kind == "f32chw"
            a_top = _state_reads_above(name, cur_after)
            n_below = {"fire": cur_after + 1, "life": cur_after + 1,
                       "alien_overlay": cur_after}[name]
            n_stage = TH + a_top + n_below
            stg = scratches[stage_scratch_idx[si]]

            def pad_cols(v):
                if cur_after == 0:
                    return v
                l = jnp.repeat(v[..., :1], cur_after, axis=-1)
                r = jnp.repeat(v[..., -1:], cur_after, axis=-1)
                return jnp.concatenate([l, v, r], axis=-1)

            def rep(v, n):   # replicate an edge row n times
                return jnp.repeat(v, n, axis=-2)

            def assign(val):
                stg[...] = val

            if nT == 1:
                top = a_top
                bot = n_stage - top - H if n_stage - top > H else 0
                real = n_stage - top - bot
                v = read(0, real)
                parts = []
                if top:
                    parts.append(rep(v[..., :1, :], top))
                parts.append(v)
                if bot:
                    parts.append(rep(v[..., -1:, :], bot))
                assign(pad_cols(jnp.concatenate(parts, axis=-2)
                                if len(parts) > 1 else v))
            else:
                @pl.when(i == 0)
                def _():
                    v = read(0, n_stage - a_top)
                    assign(pad_cols(jnp.concatenate(
                        [rep(v[..., :1, :], a_top), v], axis=-2)
                        if a_top else v))

                @pl.when((i > 0) & (i < nT - 1))
                def _():
                    assign(pad_cols(read(r0 - a_top, n_stage)))

                @pl.when(i == nT - 1)
                def _():
                    v = read(H - (n_stage - n_below), n_stage - n_below)
                    assign(pad_cols(jnp.concatenate(
                        [v, rep(v[..., -1:, :], n_below)], axis=-2)
                        if n_below else v))
            return stg[...]

        def halo_fixup(out, cur_after, pi):
            """Restore the replication invariant after a halo-consuming
            step: out-of-frame halo rows/cols become edge replicas (what
            the XLA path's padding gives the NEXT consuming step)."""
            n_o = TH + 2 * cur_after
            w_o = W + 2 * cur_after
            fsc = scratches[fix_scratch_idx[pi]]
            fsc[...] = out
            gy = jax.lax.broadcasted_iota(
                jnp.int32, (n_o, w_o), 0) + (r0 - cur_after)
            top = fsc[:, cur_after:cur_after + 1, :]
            bot = fsc[:, n_o - 1 - cur_after:n_o - cur_after, :]
            out = jnp.where((gy < 0)[None], top, fsc[...])
            out = jnp.where((gy > H - 1)[None], bot, out)
            fsc[...] = out
            gx = jax.lax.broadcasted_iota(
                jnp.int32, (n_o, w_o), 1) - cur_after
            lef = fsc[:, :, cur_after:cur_after + 1]
            rig = fsc[:, :, w_o - 1 - cur_after:w_o - cur_after]
            out = jnp.where((gx < 0)[None], lef, fsc[...])
            return jnp.where((gx > W - 1)[None], rig, out)

        # ---- lazy track generation -----------------------------------
        # Stateful/stencil steps shrink layer 0's halo; generated values
        # are iota-tainted and CANNOT be sliced in Mosaic, but non-0
        # tracks are pure coordinate functions (out_tr is always 0), so
        # a track used after a halo-consuming step is simply REGENERATED
        # at the current halo — bit-identical to slicing the bigger tile
        # (the clamped coordinates agree on the interior).
        gen_cache = {}

        def gen_track(t, cur_h):
            got = gen_cache.get((t, cur_h))
            if got is not None:
                return got
            hh, ww = TH + 2 * cur_h, W + 2 * cur_h
            yc = jnp.clip(
                jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
                + (r0 - cur_h), 0, H - 1)
            xc = jnp.clip(
                jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
                - cur_h, 0, W - 1)
            ch = source.traced_tile(ids_ref[t, b],
                                    ids_ref[n_tracks + t, b], yc, xc)
            lay = Layer(planes=(ch.astype(jnp.float32) * inv255,),
                        palette=int(Palette.RGBFLOAT))
            gen_cache[(t, cur_h)] = lay
            return lay

        layer0 = gen_track(0, R)
        tc = params_ref[P, b]
        fr = params_ref[P + 1, b].astype(jnp.int32)

        # ---- chain walk ---------------------------------------------
        from ..effects.builtin.effectv import (alien_core, fire_compose,
                                               fire_core, fire_flame,
                                               life_core)
        from ..effects.util import luma
        cur = R
        si_sten = 0
        si_state = 0
        for idx, (spec, step) in enumerate(zip(chain_spec, plan)):
            if step[0] == "skip":
                continue
            filt, static, in_tr, out_tr, enabled = spec
            tp = {k: params_ref[r_, b]
                  for r_, (i_, k) in enumerate(rows_key) if i_ == idx}
            params = {**{p.name: p.default for p in filt.params},
                      **static, **tp}
            params = {k: filt.param(k).clamp(v)
                      for k, v in params.items()
                      if any(p.name == k for p in filt.params)}
            if step[0] == "stencil":
                r = step[1]
                arr = layer0.planes[0]
                sc = scratches[stencil_scratch_idx[si_sten]]
                si_sten += 1
                sc[...] = arr
                kern_fn, sharpen = stencils[filt.name]
                kw = np.asarray(kern_fn(r), np.float32)
                kw = kw / kw.sum()
                n = 2 * r + 1
                h_out = arr.shape[-2] - 2 * r
                w_out = arr.shape[-1] - 2 * r
                rows = sum(np.float32(kw[a]) * sc[:, a:a + h_out, :]
                           for a in range(n))
                blurred = sum(np.float32(kw[d]) * rows[:, :, d:d + w_out]
                              for d in range(n))
                base = sc[:, r:r + h_out, r:r + w_out]
                amount = params.get("amount", 1.0)
                if sharpen:
                    out = base + (base - blurred) * amount
                else:
                    out = base + (blurred - base) * amount
                out = jnp.clip(out, 0.0, 1.0)
                cur -= r
                if cur > 0:
                    out = halo_fixup(out, cur, idx)
                layer0 = Layer(planes=(out,),
                               palette=int(Palette.RGBFLOAT))
            elif step[0] == "stateful":
                name = step[1]
                _, _, kind, cur_after, _ = state_steps[si_state]
                read, write = work_ref(si_state)
                st = staged_state(si_state, read)
                si_state += 1
                arr = layer0.planes[0]   # (3, TH+2cur, W+2cur)
                trim = cur - cur_after      # rows/cols consumed (halo)
                n_out = TH + 2 * cur_after
                if name == "fire":
                    # mid span = out span + 1 below; sparks from comp
                    g = luma(arr)[trim:trim + n_out + 1,
                                  trim:arr.shape[-1] - trim]
                    sparks = jnp.where(g > params["threshold"], g, 0.0)
                    mid = jnp.maximum(st, sparks)
                    buf = fire_core(mid, params["cooling"])
                    write(buf[cur_after:cur_after + TH,
                              cur_after:cur_after + W])
                    rgb = arr[:, trim:trim + n_out,
                              trim:arr.shape[-1] - trim]
                    out = fire_compose(rgb, fire_flame(buf),
                                       params["amount"])
                elif name == "life":
                    # cells_ext = out span +1 above/below; g_ext = +1 above
                    g = luma(arr)[trim - 1:trim + n_out,
                                  trim:arr.shape[-1] - trim]
                    overlay = life_core(st, g, params["threshold"])
                    # cells stay 0/1 (the XLA state contract): the f32
                    # working plane feeds life_core's n==3.0 counts and
                    # the u8 final-state cast keeps 0/1 values
                    write(overlay[cur_after:cur_after + TH,
                                  cur_after:cur_after + W])
                    rgb = arr[:, trim:trim + n_out,
                              trim:arr.shape[-1] - trim]
                    out = jnp.clip(rgb + overlay[None] * params["amount"],
                                   0.0, 1.0)
                else:   # alien_overlay (pointwise)
                    rgb = arr
                    out, ghost = alien_core(rgb, st)
                    write(ghost[:, cur_after:cur_after + TH,
                                cur_after:cur_after + W])
                if cur_after > 0:
                    out = halo_fixup(out, cur_after, idx)
                layer0 = Layer(planes=(out,),
                               palette=int(Palette.RGBFLOAT))
                cur = cur_after
            else:
                ctx = FrameContext(tc=tc, frame=fr, fps=fps,
                                   width=W, height=H,
                                   y0=r0 - cur, x0=-cur)
                fx_ins = [layer0 if t == 0 else gen_track(t, cur)
                          for t in in_tr[: filt.n_in]]
                layer0 = filt.process(fx_ins, params, ctx)
        arr = layer0.planes[0]
        u8 = jnp.clip(jnp.floor(arr * np.float32(255.0) + np.float32(0.5)),
                      0, 255).astype(jnp.int32).astype(jnp.uint8)
        out_ref[...] = u8[None]

    # state operand/output shapes per step (XLA state contract)
    def _st_shape_dtype(kind):
        if kind == "u8hw":
            return jax.ShapeDtypeStruct((H, W), jnp.uint8)
        if kind == "f32chw":
            return jax.ShapeDtypeStruct((3, H, W), jnp.float32)
        return jax.ShapeDtypeStruct((H, W), jnp.float32)

    st_structs = [_st_shape_dtype(k) for (_, _, k, _, _) in state_steps]
    plan_idx = [pi for (pi, *_rest) in state_steps]

    def run(src_ids, packed, states):
        ids = src_ids.reshape(2 * n_tracks, B)
        grid = (B, nT)
        in_specs = [
            pl.BlockSpec((packed.shape[0], B), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * n_tracks, B), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        for st in st_structs:
            in_specs.append(pl.BlockSpec(
                st.shape, lambda b, i, _n=len(st.shape): (0,) * _n,
                memory_space=pltpu.VMEM))
        out_specs = [pl.BlockSpec((1, 3, TH, W), lambda b, i: (b, 0, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [jax.ShapeDtypeStruct((B, 3, H, W), jnp.uint8)]
        for st in st_structs:
            out_specs.append(pl.BlockSpec(
                st.shape, lambda b, i, _n=len(st.shape): (0,) * _n,
                memory_space=pltpu.VMEM))
            out_shapes.append(st)
        operands = [packed, ids] + [states[pi] for pi in plan_idx]
        res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            **({} if interpret else {
                "compiler_params": pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    vmem_limit_bytes=_sweep_vmem_bytes())}),
        )(*operands)
        u8 = res[0]
        new_states = list(states)
        for k, pi in enumerate(plan_idx):
            new_states[pi] = res[1 + k]
        return u8, new_states

    return run
