#!/usr/bin/env python
"""Stateful-chain batch render: 4 tracks, 1080p30, crossfade + rgb_delay +
fire + saturation + vignette. Stateful (EffecTV-class) chains cannot vmap
— state threads frame-to-frame — so the renderer lax.scans; the prefix
sweep fuses generation + the stateless prefix into ONE pallas kernel
(float comp out) so track frames never materialise, and only the stateful
remainder scans. Prints one JSON line per path.

Timing: device-order barrier (block_until_ready is a no-op here)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(prefix_sweep: bool):
    import jax
    import jax.numpy as jnp
    from lives_tpu.effects import instantiate
    from lives_tpu.graph import SinkSpec
    from lives_tpu.graph.nodemodel import FrameGraph
    from lives_tpu.scenes import DeviceSyntheticSource

    os.environ["LIVES_TPU_FUSED_SWEEP"] = "1" if prefix_sweep else "0"
    tiny = jnp.zeros((8, 128), jnp.uint8)
    bar = jax.jit(lambda a: a + 1)
    H, W, B, T = 1080, 1920, 96, 4
    src = DeviceSyntheticSource(H, W)
    chain = [instantiate("crossfade", amount=0.6),
             instantiate("vignette", amount=0.5),
             instantiate("rgb_delay", delay_r=0.0, delay_g=1.0,
                         delay_b=2.0),
             instantiate("fire", threshold=0.6),
             instantiate("saturation", saturation=1.2)]
    chain[0].in_tracks = (0, 1)
    g = FrameGraph(chain, SinkSpec(width=W, height=H), fps=30.0)

    def chunk(k):
        ids = np.zeros((2, T, B), np.int32)
        for t in range(T):
            ids[0, t] = t + 1
        ids[1] = np.arange(B) + k * B
        tcs = (np.arange(B) + k * B).astype(np.float32) / 30.0
        frames = (np.arange(B) + k * B).astype(np.int32)
        return g.run_batch([], tcs, frames, source=src, src_args=ids)

    chunk(0)                     # compile
    np.asarray(bar(tiny))
    t0 = time.perf_counter()
    n_chunks = 5
    for k in range(1, n_chunks + 1):
        chunk(k)
    np.asarray(bar(tiny))
    dt = time.perf_counter() - t0
    x = n_chunks * B / dt / 30.0
    return x


def main():
    base = run(prefix_sweep=False)
    fused = run(prefix_sweep=True)
    print(json.dumps({
        "metric": "stateful_render_4track_1080p30",
        "value": round(fused, 2), "unit": "x_realtime",
        "vs_baseline": round(fused / max(base, 1e-9), 2),
        "detail": {"xla_scan_path": round(base, 2),
                   "prefix_sweep_path": round(fused, 2),
                   "chain": "crossfade+vignette | rgb_delay+fire+saturation",
                   "timing": "device-order barrier"}}))


if __name__ == "__main__":
    main()
