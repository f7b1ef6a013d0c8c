#!/usr/bin/env python
"""Decomposition profile of the fused single-sweep kernel (roofline study).

Times chain VARIANTS of the bench config (10-track multitrack timeline)
through the production renderer on the real chip, all with barrier timing:

  full     9 transitions + blur/balance/saturation/vignette  (bench.py)
  noblur   9 transitions + balance/saturation/vignette
  trans    9 transitions only
  trans2   1 transition only (2 tracks)  -> generation+transition scaling

Differences between variants isolate where the per-pixel time goes
(generation, transitions, the stencil, the pointwise suffix), which is
what decides whether the sweep is VPU-compute-bound (nothing left to
fetch) or still has memory/overhead headroom. A fused-multiply-add
microbench over the same tile shape estimates the empirical VPU peak so
the chain's op count can be expressed as a fraction of speed-of-light.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/sweep_profile.py [--res 4k|1080p]
Prints one JSON object.
"""

import argparse
import json
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_timeline(n_tracks, n_frames, width, height, fps, fx):
    """multitrack_timeline (scenes.py) with a configurable suffix chain."""
    from lives_tpu.events.event_list import (EventList, TICKS_PER_SECOND,
                                             filter_init_event,
                                             filter_map_event, frame_event,
                                             param_change_event)
    el = EventList(fps=fps, width=width, height=height)
    tpf = int(TICKS_PER_SECOND / fps)
    inits = []
    trans = ["crossfade", "blend_screen", "blend_overlay", "luma_key",
             "blend_add", "blend_multiply", "chroma_key", "blend_lighten",
             "blend_difference"]
    for t in range(1, n_tracks):
        name = trans[(t - 1) % len(trans)]
        vals = {"amount": 0.5} if name.startswith(("crossfade", "blend")) \
            else {}
        init = filter_init_event(0, name, in_tracks=[0, t], out_tracks=[0],
                                 values=vals)
        el.insert(init)
        inits.append(init)
    for name, vals in fx:
        init = filter_init_event(0, name, values=vals)
        el.insert(init)
        inits.append(init)
    el.insert(filter_map_event(0, [i.event_id for i in inits]))
    el.insert(param_change_event(0, inits[0].event_id, "amount", 0.0))
    el.insert(param_change_event((n_frames - 1) * tpf,
                                 inits[0].event_id, "amount", 1.0))
    for i in range(n_frames):
        el.insert(frame_event(i * tpf, list(range(1, n_tracks + 1)),
                              [i] * n_tracks))
    return el


FX_FULL = [("gaussian_blur", {"radius": 3, "amount": 0.6}),
           ("colour_balance", {"red": 1.1, "green": 1.0, "blue": 0.9}),
           ("saturation", {"saturation": 1.3}),
           ("vignette", {"amount": 0.7})]
FX_NOBLUR = FX_FULL[1:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="4k", choices=["4k", "1080p"])
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default=None,
                    help="comma list of variants to run "
                         "(full,noblur,trans,trans2,fma)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lives_tpu.events.renderer import render_events
    from lives_tpu.graph import SinkSpec
    from lives_tpu.scenes import DeviceSyntheticSource
    from lives_tpu.utils import device_barrier as barrier

    if args.res == "4k":
        w, h, batch = 3840, 2160, 24
    else:
        w, h, batch = 1920, 1080, 96
    fps = 30.0
    n_frames = max(args.frames, batch)

    src = DeviceSyntheticSource(h, w)
    sink = SinkSpec(width=w, height=h)

    variants = [
        ("full", 10, FX_FULL),
        ("noblur", 10, FX_NOBLUR),
        ("trans", 10, []),
        ("trans2", 2, []),
    ]

    only = set(args.only.split(",")) if args.only else None
    out = {"metric": f"sweep_profile_{args.res}", "variants": {}}
    for name, n_tracks, fx in variants:
        if only is not None and name not in only:
            continue
        el_warm = make_timeline(n_tracks, batch, w, h, fps, fx)
        for _ in render_events(el_warm, src, sink, batch_size=batch):
            pass
        barrier()
        el = make_timeline(n_tracks, n_frames, w, h, fps, fx)
        times = []
        for _ in range(args.reps):
            rendered = 0
            t0 = time.perf_counter()
            for tcs, _o in render_events(el, src, sink, batch_size=batch):
                rendered += len(tcs)
            barrier()
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        ms_frame = dt / rendered * 1e3
        out["variants"][name] = {
            "ms_per_frame": round(ms_frame, 3),
            "x_rt30": round(1000.0 / 30.0 / ms_frame, 1),
            "runs_s": [round(t, 3) for t in times],
        }
        print(f"# {name}: {ms_frame:.3f} ms/frame "
              f"({out['variants'][name]['x_rt30']}x rt30)", file=sys.stderr)

    if only is not None and "fma" not in only:
        print(json.dumps(out))
        return

    # ---- empirical VPU peak: K-deep fma chain over the same band shape ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    TH = 72 if args.res == "4k" else 120

    def mk(K):
        def kernel(x_ref, o_ref):
            a = x_ref[...]
            acc = a
            for i in range(K):
                acc = acc * np.float32(1.0000001) + a
            o_ref[...] = acc

        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(h // TH,),
                in_specs=[pl.BlockSpec((3, TH, w), lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((3, TH, w), lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
            )(x)
        return jax.jit(run)

    x = jnp.ones((3, h, w), jnp.float32)
    REPS = 30
    peaks = {}
    for K in (32, 128):
        f = mk(K)
        f(x)
        barrier()
        t0 = time.perf_counter()
        for _ in range(REPS):
            y = f(x)
        barrier()
        peaks[K] = (time.perf_counter() - t0) / REPS
    # delta between K=128 and K=32 removes the fixed read/write cost
    el_per_frame = 3 * h * w
    dflops = (128 - 32) * 2 * el_per_frame * 1.0
    dt = peaks[128] - peaks[32]
    out["vpu_fma_peak_gflops"] = round(dflops / dt / 1e9, 1)
    out["fma_times_ms"] = {k: round(v * 1e3, 3) for k, v in peaks.items()}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
