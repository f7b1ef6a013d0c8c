"""Multi-chip frame sharding (SURVEY.md §2.4 mapping).

The reference's parallelism is pthread row-slicing within a box
(`process_func_threaded`, effects-weed.c:1563) and nothing across machines.
The TPU-native equivalents:

- **batch-DP**: the frame axis of a batch render shards over the mesh —
  embarrassingly parallel, collectives-free, scales multitrack rendering
  linearly with chips;
- **spatial (SP/"TP")**: for 4K live frames, the H axis shards over the
  mesh; neighbourhood ops (blur stencils — EffecTV-class kernels have small
  stencils) exchange halo rows with `ppermute` over ICI inside `shard_map`.

Single-chip sessions run the same code on a 1-device mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..layer import Layer


def frame_mesh(n_devices: int | None = None,
               axis: str = "b") -> Mesh:
    """1-D device mesh over the frame-batch (or spatial) axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_layer_batch(layer: Layer, mesh: Mesh, axis: str = "b") -> Layer:
    """Place a batched Layer (leading B axis on planes) with the batch axis
    sharded over the mesh."""
    def put(p):
        spec = P(axis, *([None] * (p.ndim - 1)))
        return jax.device_put(p, NamedSharding(mesh, spec))
    return layer.replace(planes=tuple(put(p) for p in layer.planes))


def sharded_batch_fn(graph, mesh: Mesh, axis: str = "b"):
    """Wrap FrameGraph.run_batch so batched inputs are dp-sharded over the
    mesh; XLA partitions the whole composite automatically."""
    def run(layers: Sequence[Layer], tcs, frames, params=None):
        layers = [shard_layer_batch(l, mesh, axis) for l in layers]
        spec = NamedSharding(mesh, P(axis))
        tcs = jax.device_put(jnp.asarray(tcs, jnp.float32), spec)
        frames = jax.device_put(jnp.asarray(frames, jnp.int32), spec)
        return graph.run_batch(layers, tcs, frames, params)
    return run


# ---------------------------------------------------------------------------
# Spatially-sharded stencil op with halo exchange (the "TP" pattern)
# ---------------------------------------------------------------------------

def spatial_blur_sharded(img, mesh: Mesh, radius: int = 2,
                         axis: str = "b"):
    """Vertical box blur of (C,H,W) with H sharded over the mesh; halo rows
    exchanged with `ppermute` over the ring. Demonstration/building block of
    spatially-partitioned 4K processing."""
    n = mesh.devices.size
    C, H, W = img.shape
    assert H % n == 0, "H must divide the mesh"
    k = 2 * radius + 1

    def kernel(x):
        # x: (C, H/n, W) local shard
        idx = jax.lax.axis_index(axis)
        up = [(i, (i + 1) % n) for i in range(n)]      # send to next
        down = [(i, (i - 1) % n) for i in range(n)]    # send to prev
        top_halo = jax.lax.ppermute(x[:, -radius:, :], axis, up)
        bot_halo = jax.lax.ppermute(x[:, :radius, :], axis, down)
        # edge shards: clamp-pad instead of wrapped halo
        top_halo = jnp.where(idx == 0,
                             jnp.repeat(x[:, :1, :], radius, 1), top_halo)
        bot_halo = jnp.where(idx == n - 1,
                             jnp.repeat(x[:, -1:, :], radius, 1), bot_halo)
        ext = jnp.concatenate([top_halo, x, bot_halo], axis=1)
        cs = jnp.cumsum(ext.astype(jnp.float32), axis=1)
        zero = jnp.zeros_like(cs[:, :1])
        cs = jnp.concatenate([zero, cs], axis=1)
        out = (cs[:, k:, :] - cs[:, :-k, :]) / float(k)
        return out.astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.floating) \
            else jnp.clip(out + 0.5, 0, 255).astype(img.dtype)

    fn = jax.jit(jax.shard_map(kernel, mesh=mesh,
                               in_specs=P(None, axis, None),
                               out_specs=P(None, axis, None)))
    return fn(img)
