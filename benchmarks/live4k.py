#!/usr/bin/env python
"""BASELINE config 5: live VJ loop — 4K60, generator source + keyed overlay
+ realtime fx chain. Target: p99 frame latency < 16 ms sustained.

Prints one JSON line per measurement mode:
 - sync: full per-frame round trip (includes host sync each frame)
 - pipelined: sustained throughput with 2 frames in flight (how a display
   sink actually runs; the player's pipeline_depth mode)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    from lives_tpu.effects import instantiate
    from lives_tpu.graph import FrameGraph, SinkSpec
    from lives_tpu.io.genclip import GeneratorClip

    W, H = 3840, 2160
    fg = GeneratorClip("plasma", W, H, fps=60.0)
    bg = GeneratorClip("colour_bars", W, H, fps=60.0)
    chain = [instantiate("luma_key"), instantiate("saturation"),
             instantiate("vignette")]
    g = FrameGraph(chain, SinkSpec(width=W, height=H), fps=60.0)

    # compile
    t0 = time.perf_counter()
    out = g.run([fg.get_frame(0), bg.get_frame(0)], 0.0, 0)
    jax.block_until_ready(out.planes)
    compile_s = time.perf_counter() - t0

    lat = []
    for i in range(120):
        t0 = time.perf_counter()
        out = g.run([fg.get_frame(i), bg.get_frame(i)], i / 60.0, i)
        jax.block_until_ready(out.planes)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    p99 = float(np.percentile(lat_ms, 99))
    print(json.dumps({
        "metric": "live_4k60_sync_latency", "value": round(p99, 2),
        "unit": "p99_ms", "vs_baseline": round(16.0 / max(p99, 1e-9), 3),
        "detail": {"mean_ms": round(float(lat_ms.mean()), 2),
                   "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
                   "compile_s": round(compile_s, 1),
                   "target_ms": 16.0}}))

    N, depth, pending = 360, 2, []
    t0 = time.perf_counter()
    for i in range(N):
        out = g.run([fg.get_frame(i), bg.get_frame(i)], i / 60.0, i)
        pending.append(out)
        if len(pending) > depth:
            jax.block_until_ready(pending.pop(0).planes)
    for o in pending:
        jax.block_until_ready(o.planes)
    fps = N / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "live_4k_pipelined_throughput", "value": round(fps, 1),
        "unit": "fps", "vs_baseline": round(fps / 60.0, 2),
        "detail": {"frames": N, "in_flight": depth}}))


if __name__ == "__main__":
    main()
