#!/usr/bin/env python
"""Multi-chip rendering example: the three sharding modes over a device
mesh (run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to try on a virtual mesh, or on a real pod slice as-is).

1. batch-DP      — frames shard over the mesh (sharded_batch_fn)
2. spatial bands — each frame's rows shard, ppermute halo exchange
                   (spatial_batch_fn; works for HBM-fed/decoded tracks)
3. band sweep    — each device runs the whole-plan pallas kernel on its
                   band with a LOCALLY generated halo: zero collectives
                   (spatial_sweep_fn; traceable sources only)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lives_tpu.constants import Palette
    from lives_tpu.effects import instantiate
    from lives_tpu.graph import FrameGraph, SinkSpec
    from lives_tpu.graph.nodemodel import _split_params
    from lives_tpu.layer import Layer
    from lives_tpu.parallel import (frame_mesh, sharded_batch_fn,
                                    spatial_batch_fn)
    from lives_tpu.parallel.mesh import spatial_sweep_fn
    from lives_tpu.scenes import DeviceSyntheticSource

    n = len(jax.devices())
    B, H, W = 2 * n, 16 * n, 256
    chain = [instantiate("crossfade", amount=0.5),
             instantiate("gaussian_blur", radius=2, amount=0.8),
             instantiate("vignette", amount=0.6)]
    chain[0].in_tracks = (0, 1)
    graph = FrameGraph(chain, SinkSpec(width=W, height=H), fps=30.0)
    rng = np.random.default_rng(0)
    layers = [Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), np.uint8)),),
        palette=int(Palette.RGB24)) for _ in range(2)]
    tcs = np.arange(B, dtype=np.float32) / 30.0
    frames = np.arange(B, dtype=np.int32)

    mesh = frame_mesh(n)
    out = sharded_batch_fn(graph, mesh)(layers, tcs, frames)
    print(f"DP over {n} devices:", out.planes[0].shape)

    out = spatial_batch_fn(graph, mesh)(layers, tcs, frames)
    print(f"spatial bands (ppermute halos):", out.planes[0].shape)

    os.environ["LIVES_TPU_PALLAS_INTERPRET"] = \
        "1" if jax.default_backend() != "tpu" else "0"
    src = DeviceSyntheticSource(H, W)
    smesh = frame_mesh(n, axis="s")
    run = spatial_sweep_fn(graph, smesh, src, B, H, W, axis="s")
    if run is not None:
        rows, vals = [], []
        for i, inst in enumerate(graph.chain):
            _, tp = _split_params(inst)
            for k in sorted(tp):
                rows.append((i, k))
                vals.append(np.broadcast_to(np.float32(tp[k]), (B,)))
        packed = np.stack(vals + [tcs, frames.astype(np.float32)])
        ids = np.zeros((2, 2, B), np.int32)
        ids[0, 0], ids[0, 1] = 1, 2
        ids[1] = np.arange(B)
        sw = run(ids, packed)
        if sw is not None:
            print("band sweep (zero collectives):", np.asarray(sw).shape)


if __name__ == "__main__":
    main()
