#!/usr/bin/env python
"""Benchmark: the driver metric (BASELINE.md).

Renders the 10-track 1080p30 multitrack timeline (per-track transitions +
4-effect chain, animated params, event-list driven) through the batch
renderer on the real chip and reports render speed as a multiple of
realtime. Target (BASELINE.md): >= 50x realtime per chip.

Timing methodology: on this platform `jax.block_until_ready` does not
synchronize (async dispatch returns early), so the run is timed with a
device-order barrier — a tiny jitted op fetched to host after all chunks
are enqueued; the TPU executes in issue order, so its completion implies
all prior chunks completed. The barrier's single host round-trip (~35 ms)
is included in the timed window.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def _probe_backend(timeout_s: int = 180) -> bool:
    """The axon attachment, when down, hangs backend init for ~10 min.
    Probe it in a killable subprocess so a dead chip fails in minutes
    with a diagnosable line instead of a silent stall."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _probe_backend():
        print(json.dumps({
            "metric": "multitrack_render_10track_1080p30",
            "value": 0.0, "unit": "x_realtime", "vs_baseline": 0.0,
            "error": "TPU attachment unavailable (backend probe timed "
                     "out); see PERF_NOTES.md for the last measured "
                     "chip medians"}))
        sys.exit(1)
    import jax
    import jax.numpy as jnp
    from lives_tpu.events.renderer import render_events
    from lives_tpu.graph import SinkSpec
    from lives_tpu.scenes import DeviceSyntheticSource, multitrack_timeline

    fps = 30.0
    n_frames = 480
    w, h = 1920, 1080
    batch = 96

    # device-order barrier: fetch of a tiny op's result implies all
    # previously issued device work has completed (in-order execution)
    from lives_tpu.utils import device_barrier as barrier

    src = DeviceSyntheticSource(h, w)
    sink = SinkSpec(width=w, height=h)

    # warmup pass: compiles every template (segments x batch shapes)
    el_warm = multitrack_timeline(n_tracks=10, n_frames=2 * batch,
                                  width=w, height=h, fps=fps)
    for _ in render_events(el_warm, src, sink, batch_size=batch):
        pass
    barrier()

    # timed pass
    el = multitrack_timeline(n_tracks=10, n_frames=n_frames,
                             width=w, height=h, fps=fps)
    rendered = 0
    t0 = time.perf_counter()
    for tcs, out in render_events(el, src, sink, batch_size=batch):
        rendered += len(tcs)
    barrier()
    dt = time.perf_counter() - t0

    fps_rendered = rendered / dt
    x_realtime = fps_rendered / fps
    result = {
        "metric": "multitrack_render_10track_1080p30",
        "value": round(x_realtime, 2),
        "unit": "x_realtime",
        "vs_baseline": round(x_realtime / 50.0, 3),
        "detail": {
            "frames_per_sec": round(fps_rendered, 1),
            "frames_measured": rendered,
            "tracks": 10,
            "resolution": f"{w}x{h}",
            "chain": "9 transitions + blur/balance/saturation/vignette",
            "timing": "device-order barrier (async-safe)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
