#!/usr/bin/env python
"""Benchmark: the driver metric (BASELINE.md).

Renders the 10-track 1080p30 multitrack timeline (per-track transitions +
4-effect chain, animated params, event-list driven) through the batch
renderer on the real chip and reports render speed as a multiple of
realtime. Target (BASELINE.md): >= 50x realtime per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    from lives_tpu.events.renderer import render_events
    from lives_tpu.graph import SinkSpec
    from lives_tpu.scenes import DeviceSyntheticSource, multitrack_timeline

    fps = 30.0
    n_frames = 240
    warm_frames = 48
    w, h = 1920, 1080
    el = multitrack_timeline(n_tracks=10, n_frames=n_frames + warm_frames,
                             width=w, height=h, fps=fps)
    src = DeviceSyntheticSource(h, w)
    sink = SinkSpec(width=w, height=h)

    batch = 48
    rendered = 0
    t0 = None
    last = None
    for tcs, out in render_events(el, src, sink, batch_size=batch):
        jax.block_until_ready(out.planes)
        rendered += len(tcs)
        if t0 is None and rendered >= warm_frames:
            t0 = time.perf_counter()      # skip compile + warmup chunk
            measured_from = rendered
        last = out
    dt = time.perf_counter() - t0
    n_measured = rendered - measured_from
    fps_rendered = n_measured / dt
    x_realtime = fps_rendered / fps

    result = {
        "metric": "multitrack_render_10track_1080p30",
        "value": round(x_realtime, 2),
        "unit": "x_realtime",
        "vs_baseline": round(x_realtime / 50.0, 3),
        "detail": {
            "frames_per_sec": round(fps_rendered, 1),
            "frames_measured": n_measured,
            "tracks": 10,
            "resolution": f"{w}x{h}",
            "chain": "9 transitions + blur/balance/saturation/vignette",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
