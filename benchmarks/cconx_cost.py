#!/usr/bin/env python
"""Cost of a cconx (alpha data-connection) chain vs the fused sweep.

cconx chains drop off the pallas fused-sweep path (nodemodel.py sweep
eligibility includes `not self.cconx`; alpha producers like motion_mask
are stateful analysers the tile-local kernel cannot host anyway). This
records what that costs at the flagship geometry (VERDICT r4 item 4;
reference analogue: cconx pixel-data conversion in the render path,
src/effects-data.c:2183):

  A. sweep-eligible 10-track chain (the driver-bench plan, fused sweep)
  B. the SAME chain on the XLA template (LIVES_TPU_FUSED_SWEEP=0) —
     isolates "sweep vs XLA" from "cconx itself"
  C. chain + motion_mask -> alpha_visualizer cconx edge (XLA template +
     stateful scan — the real cconx serving path)

Output: one JSON line per variant {variant, ms_per_frame, x_rt30}.
"""

import json
import os
import time

import numpy as np


def build(cconx=False):
    from lives_tpu.effects import instantiate
    from lives_tpu.graph import FrameGraph, SinkSpec

    names = ["crossfade", "blend_screen", "blend_overlay", "luma_key",
             "blend_add", "blend_multiply", "chroma_key",
             "blend_lighten", "blend_difference"]
    chain = []
    for t, name in enumerate(names, start=1):
        kw = {"amount": 0.5} if name.startswith(("crossfade", "blend")) \
            else {}
        inst = instantiate(name, **kw)
        inst.in_tracks = (0, t)
        chain.append(inst)
    chain += [instantiate("gaussian_blur", radius=3, amount=0.6),
              instantiate("colour_balance", red=1.1, green=1.0, blue=0.9),
              instantiate("saturation", saturation=1.3),
              instantiate("vignette", amount=0.7)]
    edges = ()
    if cconx:
        mm = instantiate("motion_mask")
        av = instantiate("alpha_visualizer", red=1.0, green=1.0, blue=1.0)
        chain += [mm, av]
        edges = [(len(chain) - 2, "mask", len(chain) - 1, 0)]
    return FrameGraph(chain, SinkSpec(width=1920, height=1080),
                      fps=30.0, cconx=edges)


def measure(graph, src, n=240, batch=48, tracks=10):
    from lives_tpu.utils import device_barrier
    tcs = np.arange(batch, dtype=np.float32) / 30.0
    frames = np.arange(batch, dtype=np.int32)
    ids = np.zeros((tracks, batch), np.int32)
    for t in range(tracks):
        ids[t] = t + 1
    nums = np.broadcast_to(frames, (tracks, batch))
    kw = dict(source=src, src_args=(ids, nums))
    graph.run_batch([], tcs, frames, **kw)        # compile
    device_barrier()
    t0 = time.perf_counter()
    done = 0
    while done < n:
        graph.run_batch([], tcs, frames, **kw)
        done += batch
    device_barrier()
    return (time.perf_counter() - t0) / done * 1e3


def main():
    from lives_tpu.scenes import DeviceSyntheticSource
    src = DeviceSyntheticSource(1080, 1920)
    for variant, env, cconx in (
            ("sweep_eligible", None, False),
            ("xla_no_cconx", "0", False),
            ("xla_cconx", None, True)):
        if env is None:
            os.environ.pop("LIVES_TPU_FUSED_SWEEP", None)
        else:
            os.environ["LIVES_TPU_FUSED_SWEEP"] = env
        g = build(cconx=cconx)
        ms = measure(g, src)
        print(json.dumps({"variant": variant,
                          "ms_per_frame": round(ms, 3),
                          "x_rt30": round(1000.0 / 30.0 / ms, 1)}),
              flush=True)
    os.environ.pop("LIVES_TPU_FUSED_SWEEP", None)


if __name__ == "__main__":
    main()
