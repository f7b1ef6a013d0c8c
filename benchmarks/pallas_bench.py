#!/usr/bin/env python
"""Pallas vs XLA backend comparison for the YUV420<->RGB core at 1080p/4K.

Prints one JSON line per config with both timings — documents where the
pallas backend stands relative to the XLA-fused path on real hardware.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, args, n=50):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from lives_tpu.ops import colorspace as cs
    from lives_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    for (h, w) in [(1080, 1920), (2160, 3840)]:
        y = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
        u = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.uint8))
        v = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.uint8))

        @jax.jit
        def xla_path(y, u, v):
            return cs.yuv_to_rgb(y, cs.chroma_up(u, 2, 2),
                                 cs.chroma_up(v, 2, 2))

        t_xla = bench(xla_path, (y, u, v))
        t_pl = bench(lambda a, b, c: pk.yuv420_to_rgb(a, b, c), (y, u, v)) \
            if pk.yuv420_to_rgb_supported(h, w) else float("nan")
        mb = (h * w * 1.5 + h * w * 3) / 1e6
        print(json.dumps({
            "metric": f"yuv420_to_rgb_{h}p",
            "value": round(t_xla * 1e3, 3),
            "unit": "ms_xla_path",
            "vs_baseline": round(t_xla / t_pl, 3) if t_pl == t_pl else None,
            "detail": {"pallas_ms": round(t_pl * 1e3, 3),
                       "xla_ms": round(t_xla * 1e3, 3),
                       "eff_GBps_xla": round(mb / 1e3 / t_xla, 1)}}))


if __name__ == "__main__":
    main()
