#!/usr/bin/env python
"""Stateful-LED chain batch render (VERDICT round-2 item 2 scenario):
a 10-track 1080p30 timeline whose chain STARTS with EffecTV-class
stateful effects (fire-led — reference lives-plugins/weed-plugins/fireTV.c,
blurzoom.c look), so no stateless prefix can fuse. The renderer must
lax.scan the whole chain; the round-3 fix generates each frame's tracks
INSIDE the scan body (graph/nodemodel.py in_scan_gen) so the T x B track
frames never materialise in HBM — previously the dominant traffic.

Prints one JSON line. Timing: device-order barrier (block_until_ready is
a no-op on this platform, CLAUDE.md)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(in_scan: bool, suffix: bool = False, n_chunks: int = 5,
        fused_state: bool | None = None, alien_chain: bool = False):
    import jax
    import jax.numpy as jnp
    from lives_tpu.effects import instantiate
    from lives_tpu.graph import SinkSpec
    from lives_tpu.graph.nodemodel import FrameGraph, _TEMPLATE_CACHE
    from lives_tpu.scenes import DeviceSyntheticSource

    os.environ["LIVES_TPU_IN_SCAN_GEN"] = "1" if in_scan else "0"
    os.environ["LIVES_TPU_FUSED_SWEEP"] = "1" if suffix else "0"
    if fused_state is not None:
        os.environ["LIVES_TPU_FUSED_STATEFUL"] = \
            "1" if fused_state else "0"
    tiny = jnp.zeros((8, 128), jnp.uint8)
    bar = jax.jit(lambda a: a + 1)
    H, W, B, T = 1080, 1920, 96, 10
    src = DeviceSyntheticSource(H, W)
    # chain LED by stateful fx, then the 9 transitions folding the tracks,
    # then colour work: no fusable prefix anywhere
    if alien_chain:
        # every stateful step kernel-supported: the whole plan (incl.
        # state) fuses into ONE pallas kernel (graph/pallas_stateful.py)
        chain = [instantiate("fire", threshold=0.6),
                 instantiate("alien_overlay")]
    else:
        chain = [instantiate("fire", threshold=0.6),
                 instantiate("rgb_delay", delay_r=0.0, delay_g=1.0,
                             delay_b=2.0)]
    trans = ["crossfade", "blend_screen", "blend_overlay", "blend_add",
             "blend_multiply", "blend_lighten", "blend_difference",
             "blend_darken", "crossfade"]
    for t in range(1, T):
        inst = instantiate(trans[(t - 1) % len(trans)], amount=0.5)
        inst.in_tracks = (0, t)
        chain.append(inst)
    chain += [instantiate("saturation", saturation=1.2),
              instantiate("vignette", amount=0.5)]
    g = FrameGraph(chain, SinkSpec(width=W, height=H), fps=30.0)

    def chunk(k):
        ids = np.zeros((2, T, B), np.int32)
        for t in range(T):
            ids[0, t] = t + 1
        ids[1] = np.arange(B) + k * B
        tcs = (np.arange(B) + k * B).astype(np.float32) / 30.0
        frames = (np.arange(B) + k * B).astype(np.int32)
        return g.run_batch([], tcs, frames, source=src, src_args=ids)

    last = chunk(0)                     # compile
    np.asarray(bar(tiny))
    t0 = time.perf_counter()
    for k in range(1, n_chunks + 1):
        last = chunk(k)
    np.asarray(bar(tiny))
    dt = time.perf_counter() - t0
    return n_chunks * B / dt / 30.0, np.asarray(last.planes[0][-1])


def main():
    # A/B: the whole-plan fused STATEFUL sweep vs the 3-phase path on a
    # kernel-supported chain (fire+alien led; rgb_delay's 16-frame u8
    # ring stays scan-hosted by design)
    ph3, f_ph3 = run(in_scan=True, suffix=True, fused_state=False,
                     alien_chain=True)
    fstate, f_fstate = run(in_scan=True, suffix=True, fused_state=True,
                           alien_chain=True)
    sdiff = int(np.abs(f_fstate.astype(int) - f_ph3.astype(int)).max())
    print(json.dumps({
        "metric": "stateful_FUSED_sweep_10track_1080p30",
        "value": round(fstate, 2), "unit": "x_realtime",
        "vs_3phase": round(fstate / max(ph3, 1e-9), 2),
        "detail": {"three_phase_path": round(ph3, 2),
                   "whole_plan_fused": round(fstate, 2),
                   "max_lsb_diff": sdiff,
                   "chain": "fire+alien_overlay | 9 transitions | "
                            "saturation+vignette"}}))
    os.environ["LIVES_TPU_FUSED_STATEFUL"] = "0"
    base, f_base = run(in_scan=False)
    inscan, f_in = run(in_scan=True)
    full, f_full = run(in_scan=True, suffix=True)
    exact = bool(np.array_equal(f_base, f_in))
    diff = int(np.abs(f_full.astype(int) - f_base.astype(int)).max())
    print(json.dumps({
        "metric": "stateful_led_render_10track_1080p30",
        "value": round(full, 2), "unit": "x_realtime",
        "vs_baseline": round(full / max(base, 1e-9), 2),
        "detail": {"materialised_scan_path": round(base, 2),
                   "in_scan_generation_path": round(inscan, 2),
                   "suffix_sweep_path": round(full, 2),
                   "in_scan_bitwise_parity": exact,
                   "suffix_max_lsb_diff": diff,
                   "chain": "fire+rgb_delay | 9 transitions | "
                            "saturation+vignette",
                   "timing": "device-order barrier"}}))


if __name__ == "__main__":
    main()
