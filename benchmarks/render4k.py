#!/usr/bin/env python
"""4K multitrack batch render through the fused sweep: the bench.py config
at 3840x2160 (10 tracks, 13 effects). Shows the single-sweep kernel scales
with resolution (HBM traffic = output write only).

Prints one JSON line per run (same schema as bench.py; target here is
realtime 30 fps at 4K = value >= 1, expectation is far above)."""

import json
import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from lives_tpu.events.renderer import render_events
    from lives_tpu.graph import SinkSpec
    from lives_tpu.scenes import DeviceSyntheticSource, multitrack_timeline

    fps = 30.0
    w, h = 3840, 2160
    batch = 24
    n_frames = 96

    _tiny = jnp.zeros((8, 128), jnp.uint8)
    _bar = jax.jit(lambda a: a + 1)

    def barrier():
        np.asarray(_bar(_tiny))

    src = DeviceSyntheticSource(h, w)
    sink = SinkSpec(width=w, height=h)
    el_warm = multitrack_timeline(n_tracks=10, n_frames=batch,
                                  width=w, height=h, fps=fps)
    for _ in render_events(el_warm, src, sink, batch_size=batch):
        pass
    barrier()

    el = multitrack_timeline(n_tracks=10, n_frames=n_frames,
                             width=w, height=h, fps=fps)
    rendered = 0
    t0 = time.perf_counter()
    for tcs, out in render_events(el, src, sink, batch_size=batch):
        rendered += len(tcs)
    barrier()
    dt = time.perf_counter() - t0
    fps_rendered = rendered / dt
    print(json.dumps({
        "metric": "multitrack_render_10track_4k30",
        "value": round(fps_rendered / fps, 2),
        "unit": "x_realtime",
        "vs_baseline": round(fps_rendered / fps, 2),
        "detail": {"frames_per_sec": round(fps_rendered, 1),
                   "frames_measured": rendered,
                   "resolution": f"{w}x{h}",
                   "timing": "device-order barrier (async-safe)"}}))


if __name__ == "__main__":
    main()
