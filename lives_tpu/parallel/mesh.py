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


def chain_band_halo(graph) -> int:
    """Total stencil halo of a FrameGraph's chain, validating that every
    enabled effect is band-safe (pointwise, coordinate-pointwise via
    ctx_grid, or a separable stencil). Raises ValueError otherwise."""
    from ..graph.nodemodel import _split_params
    from ..graph.pallas_composite import (COORD_SAFE, PALLAS_SAFE,
                                          _stencil_fns)
    stencils = _stencil_fns()
    R = 0
    for inst in graph.chain:
        if not inst.enabled:
            continue
        name = inst.filter.name
        if name in stencils:
            static, _ = _split_params(inst)
            dflt = inst.filter.param("radius").default
            R += max(1, int(static.get("radius", dflt)))
        elif name not in PALLAS_SAFE and name not in COORD_SAFE:
            raise ValueError(
                f"{name!r} is not band-safe for spatial sharding")
    if graph.has_stateful:
        raise ValueError("stateful chains cannot spatially shard")
    return R


def _band_batch_fn(graph, mesh: Mesh, spatial_axis: str,
                   batch_axis: str | None):
    """Shared engine for spatial_batch_fn / grid_batch_fn: FrameGraph
    batch execution under shard_map with the H axis sharded over
    `spatial_axis` (ppermute halo exchange sized by the chain's stencils,
    global band origins via FrameContext.y0) and, when `batch_axis` is
    given, the frame batch sharded over that mesh axis too."""
    import numpy as np_
    from ..graph.nodemodel import _split_params

    R = chain_band_halo(graph)
    ns = int(mesh.shape[spatial_axis])
    nb = int(mesh.shape[batch_axis]) if batch_axis else 1
    sink = graph.sink
    frame_fn = graph._make_frame_fn()

    def run(layers: Sequence[Layer], tcs, frames, params=None):
        B = len(np_.asarray(tcs))
        H, W = layers[0].height, layers[0].width
        if batch_axis and B % nb:
            raise ValueError(f"batch {B} must divide dp axis {nb}")
        if sink.width not in (0, W) or sink.height not in (0, H):
            raise ValueError("spatial sharding requires a same-geometry sink")
        if (H // ns) < max(R, 1):
            raise ValueError(f"band H/{ns} smaller than halo {R}")
        if params is None:
            params = []
            for inst in graph.chain:
                _, tp = _split_params(inst)
                params.append({k: np_.broadcast_to(np_.float32(v), (B,))
                               for k, v in tp.items()})
        rows = [(i, k) for i, d in enumerate(params) for k in sorted(d)]
        packed = jnp.asarray(np_.stack(
            [np_.asarray(params[i][k], np_.float32) for i, k in rows]
            + [np_.asarray(tcs, np_.float32),
               np_.asarray(frames, np_.float32)]))
        metas = [dict(palette=l.palette, clamping=l.clamping,
                      sampling=l.sampling, subspace=l.subspace,
                      gamma=l.gamma) for l in layers]
        n_inst = len(graph.chain)
        up = [(i, (i + 1) % ns) for i in range(ns)]
        down = [(i, (i - 1) % ns) for i in range(ns)]

        def body(packed, *planes):
            idx = jax.lax.axis_index(spatial_axis)
            ext_planes = []
            for p in planes:  # (B[/nb], C, H/ns, W) local shard
                if R:
                    top = jax.lax.ppermute(p[..., -R:, :], spatial_axis, up)
                    bot = jax.lax.ppermute(p[..., :R, :], spatial_axis,
                                           down)
                    top = jnp.where(idx == 0,
                                    jnp.repeat(p[..., :1, :], R, -2), top)
                    bot = jnp.where(idx == ns - 1,
                                    jnp.repeat(p[..., -1:, :], R, -2), bot)
                    p = jnp.concatenate([top, p, bot], axis=-2)
                ext_planes.append(p)
            Hl = planes[0].shape[-2]
            y0 = idx * Hl - R

            def one(per_frame_planes, col):
                lyrs = [Layer(planes=(pp,), **m)
                        for pp, m in zip(per_frame_planes, metas)]
                tps = [dict() for _ in range(n_inst)]
                for r_, (i_, k_) in enumerate(rows):
                    tps[i_][k_] = col[r_]
                out, _ = frame_fn(lyrs, tps, list(graph.states),
                                  col[-2], col[-1].astype(jnp.int32),
                                  origin=(y0, H, W))
                return out.planes[0]

            outs = jax.vmap(one, in_axes=(0, 1))(tuple(ext_planes), packed)
            return outs[..., R:R + Hl, :] if R else outs

        plane_spec = P(batch_axis, None, spatial_axis, None)
        packed_spec = P(None, batch_axis) if batch_axis else P()
        shardfn = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(packed_spec,) + tuple(plane_spec for _ in layers),
            out_specs=plane_spec))
        out = shardfn(packed, *[l.planes[0] for l in layers])
        return Layer(planes=(out,), palette=sink.palette, gamma=sink.gamma)

    return run


def spatial_batch_fn(graph, mesh: Mesh, axis: str = "b"):
    """Spatially-sharded batch execution of a production FrameGraph: the H
    axis of every (B,C,H,W) track plane shards over the mesh, stencil
    effects see `ppermute`-exchanged halo rows over ICI, coordinate effects
    see their true global position via FrameContext.y0 (the same mechanism
    the fused pallas sweep uses for tiles), and each device computes its
    band of every frame. This generalises the round-1 demo blur
    (`spatial_blur_sharded`) to the full plan — the reference's
    row-slice threading (`process_func_threaded`, effects-weed.c:1563)
    scaled across chips. Sink must keep source geometry.
    """
    return _band_batch_fn(graph, mesh, spatial_axis=axis, batch_axis=None)


def grid_mesh(n_batch: int, n_spatial: int,
              batch_axis: str = "b", spatial_axis: str = "s") -> Mesh:
    """2-D device mesh: frame-batch DP x H-axis spatial sharding — the
    production layout for rendering long timelines of large frames on a
    pod slice (batch over one mesh dim, each frame's rows over the other,
    halo exchange riding the spatial axis's ICI ring)."""
    devs = jax.devices()
    need = n_batch * n_spatial
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    arr = np.array(devs[:need]).reshape(n_batch, n_spatial)
    return Mesh(arr, (batch_axis, spatial_axis))


def grid_batch_fn(graph, mesh: Mesh, batch_axis: str = "b",
                  spatial_axis: str = "s"):
    """FrameGraph batch execution on a 2-D (dp x sp) mesh: B shards over
    `batch_axis`, H shards over `spatial_axis` with ppermute halo
    exchange."""
    return _band_batch_fn(graph, mesh, spatial_axis=spatial_axis,
                          batch_axis=batch_axis)


def spatial_sweep_fn(graph, mesh: Mesh, source, B: int, H: int, W: int,
                     axis: str = "s"):
    """Spatially-sharded FUSED SWEEP: each device runs the whole-plan
    pallas kernel (graph/pallas_composite.build_fused_sweep) on its own
    H-band of every frame, with the band's global row offset traced in.

    Because sweep sources are pure coordinate functions
    (`source.traced_tile`), every device GENERATES its own stencil halo
    locally — the multi-chip sweep needs **zero collectives** (vs the XLA
    band path's ppermute halo exchange), and per-pixel arithmetic is
    bitwise identical to the single-device kernel. This is the production
    multi-chip form of the driver-bench path: the 74-84x single-chip
    kernel scales across a mesh with no communication on the hot path.

    Returns run(src_ids (2,T,B) int32, packed (P+2,B) f32) ->
    (B,3,H,W) uint8 with H sharded over `axis`, or None when the chain
    does not qualify (caller falls back to spatial_batch_fn).
    """
    from ..graph.nodemodel import _split_params
    from ..graph.pallas_composite import build_fused_sweep

    ns = int(mesh.shape[axis])
    if H % ns:
        return None
    band_h = H // ns
    spec = []
    rows = []
    for i, inst in enumerate(graph.chain):
        static, traced = _split_params(inst)
        spec.append((inst.filter, static, inst.in_tracks,
                     inst.out_tracks, inst.enabled))
        rows += [(i, k) for k in sorted(traced)]
    rows_key = tuple(rows)
    n_tracks = None  # resolved per call from src_ids

    def build(T):
        return build_fused_sweep(spec, T, B, H, W, rows_key, graph.fps,
                                 source, graph.sink, band_h=band_h)

    built = {}

    def _shardfn(T):
        """One jitted shard_map per track count (cached: re-wrapping jit
        per call would retrace every invocation)."""
        fn = build(T)
        if fn is None:
            return None

        def body(ids, pk):
            y0 = (jax.lax.axis_index(axis) * band_h).astype(jnp.float32)
            pk_ext = jnp.concatenate(
                [pk, jnp.broadcast_to(y0, (1, pk.shape[1]))], axis=0)
            return fn(ids, pk_ext)

        # check_vma must be off: pallas_call inside shard_map cannot
        # annotate varying-mesh-axes on its out_shape
        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P()),
            out_specs=P(None, None, axis, None),
            check_vma=False))

    def run(src_ids, packed):
        T = int(np.asarray(src_ids).shape[1])
        if T not in built:
            built[T] = _shardfn(T)
        shardfn = built[T]
        if shardfn is None:
            return None
        return shardfn(jnp.asarray(src_ids), jnp.asarray(packed))

    return run


# ---------------------------------------------------------------------------
# Pipeline parallelism over the effect chain (the "PP" pattern)
# ---------------------------------------------------------------------------

def pipeline_chain_fn(instances, mesh: Mesh, axis: str = "b"):
    """GPipe-style pipeline over a long effect chain: device d owns chain
    stage d; frames stream through the mesh, each step every device
    applies ITS stage to the frame it holds and `ppermute`s the result
    to its neighbour over ICI. All stages run concurrently on different
    frames — the cross-chip form of the reference's inter-step DAG
    parallelism (one proc-thread per fx node, effects-weed.c).

    `instances` are the chain's effect Instances, one PER DEVICE (len ==
    mesh size; pad short chains with None = identity). Stages must
    preserve geometry/palette (elementwise/stencil fx). Returns
    run(batch_f01: (B, C, H, W) float32, tcs: (B,)) -> (B, C, H, W)
    with every frame through the full chain, identical to the
    sequential apply.

    SPMD notes: every device traces every stage and `lax.switch` on
    axis_index selects the resident one (untaken branches cost code
    size, not FLOPs). The input window is replicated and the output
    psum-gathered — right for live-window sizes (the win is chain-depth
    concurrency, not memory scaling)."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    from ..effects.host import FrameContext

    if len(instances) != n:
        raise ValueError(f"need {n} stages (got {len(instances)}); "
                         "pad with None")

    def make_stage_fns():
        fns = []
        for inst in instances:
            if inst is None:
                fns.append(lambda a, _t: a)
            else:
                filt, vals = inst.filter, inst.param_values()

                def fn(a, t, filt=filt, vals=vals):
                    from ..constants import Palette
                    from ..layer import Layer
                    ctx = FrameContext(tc=t, frame=0, fps=25.0,
                                       width=a.shape[-1],
                                       height=a.shape[-2])
                    lay = Layer(planes=(a,),
                                palette=int(Palette.RGBFLOAT))
                    out = filt.process([lay], vals, ctx)
                    if isinstance(out, (tuple, list)):
                        out = out[0]
                    return (out.planes[0] if hasattr(out, "planes")
                            else out).astype(a.dtype)
                fns.append(fn)
        return fns

    def run(batch, tcs):
        import jax
        B = int(batch.shape[0])

        def per_device(chunk, tcs_c):
            d = jax.lax.axis_index(axis)
            fns = make_stage_fns()

            def apply_stage(x, t):
                return jax.lax.switch(d, fns, x, t)

            cur = jnp.zeros_like(chunk[0])
            tcur = jnp.float32(0)
            out = jnp.zeros_like(chunk)

            def step(carry, i):
                cur, tcur, out = carry
                # hand the previous step's result to the next stage
                if n > 1:
                    cur, tcur = jax.lax.ppermute(
                        (cur, tcur), axis,
                        [(k, k + 1) for k in range(n - 1)])
                # device 0 ingests frame i (replicated input window)
                idx = jnp.clip(i, 0, B - 1)
                ingest = (d == 0) & (i < B)
                cur = jnp.where(ingest, chunk[idx], cur)
                tcur = jnp.where(ingest, tcs_c[idx], tcur)
                cur = apply_stage(cur, tcur)
                # device n-1 finished frame i-(n-1)
                j = i - (n - 1)
                emit = (d == n - 1) & (j >= 0)
                sel = (jnp.arange(B)[:, None, None, None]
                       == jnp.clip(j, 0, B - 1))
                out = jnp.where(emit & sel, cur[None], out)
                return (cur, tcur, out), None

            (_, _, out), _ = jax.lax.scan(
                step, (cur, tcur, out), jnp.arange(B + n - 1))
            # only device n-1 holds the results: sum-gather replicates
            keep = jnp.where(d == n - 1, 1.0, 0.0)
            return jax.lax.psum(out * keep, axis)

        full = P(*([None] * batch.ndim))
        fn = jax.shard_map(per_device, mesh=mesh,
                           in_specs=(full, P(None)), out_specs=full,
                           check_vma=False)
        return fn(jnp.asarray(batch, jnp.float32),
                  jnp.asarray(tcs, jnp.float32))

    return run


#: spatially-shardable stateful filters -> band halo radius (rows the
#: step reads beyond its own). Pointwise-in-space ring/ghost filters are
#: radius 0; fire/life shift one row. Global-warp stateful filters
#: (feedback, vertigo, blurzoom) and cursor writers (onedtv) are NOT
#: band-safe.
BAND_SAFE_STATEFUL = {"fire": 1, "life": 1, "alien_overlay": 0,
                      "rgb_delay": 0, "nervous": 0}


def chain_band_halo_stateful(graph) -> int:
    """Total band halo of a STATEFUL chain (stencil radii + stateful
    read radii), validating every enabled effect is band-safe. Raises
    ValueError otherwise (mirror of chain_band_halo, which rejects
    stateful chains outright)."""
    from ..graph.nodemodel import _split_params
    from ..graph.pallas_composite import (COORD_SAFE, PALLAS_SAFE,
                                          _stencil_fns)
    from ..effects.host import FILTER_STATEFUL
    stencils = _stencil_fns()
    R = 0
    for inst in graph.chain:
        if not inst.enabled:
            continue
        name = inst.filter.name
        if inst.filter.flags & FILTER_STATEFUL:
            if name not in BAND_SAFE_STATEFUL:
                raise ValueError(
                    f"{name!r} is not band-safe for spatial sharding")
            R += BAND_SAFE_STATEFUL[name]
        elif name in stencils:
            # stencils mixed with stateful steps break FRAME-edge
            # exactness: a stencil's value computed AT a replicated
            # out-of-frame row differs from the replication of its edge
            # row, and the neighbouring stateful shift then reads it.
            # (The fused stateful sweep fixes this per step — here the
            # chain runs inside one frame_fn. Split-segment fixups are
            # the future refinement; reject for now.)
            raise ValueError(
                "stencils are not supported in spatially-sharded "
                f"STATEFUL chains ({name!r}); run blur before the "
                "recording or use the fused stateful sweep")
        elif name not in PALLAS_SAFE and name not in COORD_SAFE:
            raise ValueError(
                f"{name!r} is not band-safe for spatial sharding")
    return R


def spatial_stateful_fn(graph, mesh: Mesh, axis: str = "b"):
    """STATEFUL chains over spatial bands: every chip owns a row band of
    the frame AND of every state plane; frames run sequentially in a
    `lax.scan` (the state carry), and each frame starts with a ppermute
    halo exchange of both the input planes and the state planes — fresh
    neighbour state every frame, so band arithmetic is exactly the
    full-frame computation (halo validity decays one radius per step,
    covered by the summed halo R; frame edges replicate, matching the
    filters' clamped shifts).

    The reference cannot do this at all: its stateful plugins keep
    whole-frame buffers in plugin_internal and its row-threading
    (effects-weed.c:1563) must single-thread any plugin with state.
    Here a fire+rgb_delay chain scales across chips with 2R rows of ICI
    traffic per frame per state plane.

    Returns run(layers, tcs, frames, params=None) -> Layer
    ((B,C,H,W) planes), matching spatial_batch_fn's contract.
    """
    import numpy as np_
    from ..graph.nodemodel import _split_params
    from ..effects.host import FILTER_STATEFUL

    R = chain_band_halo_stateful(graph)
    ns = int(mesh.shape[axis])
    sink = graph.sink
    frame_fn = graph._make_frame_fn()
    n_inst = len(graph.chain)

    def run(layers: Sequence[Layer], tcs, frames, params=None):
        B = len(np_.asarray(tcs))
        H, W = layers[0].height, layers[0].width
        if sink.width not in (0, W) or sink.height not in (0, H):
            raise ValueError(
                "spatial sharding requires a same-geometry sink")
        if H % ns or (H // ns) < max(R, 1):
            raise ValueError(f"H={H} unshardable over {ns} bands"
                             f" (halo {R})")
        Hl = H // ns
        # materialise init states at frame geometry (run_batch's rule)
        for i, inst in enumerate(graph.chain):
            if (inst.filter.flags & FILTER_STATEFUL
                    and graph.states[i] is None
                    and inst.filter.init_state is not None):
                graph.states[i] = inst.filter.init_state(W, H, None)
        if params is None:
            params = []
            for inst in graph.chain:
                _, tp = _split_params(inst)
                params.append({k: np_.broadcast_to(np_.float32(v), (B,))
                               for k, v in tp.items()})
        rows = [(i, k) for i, d in enumerate(params) for k in sorted(d)]
        packed = jnp.asarray(np_.stack(
            [np_.asarray(params[i][k], np_.float32) for i, k in rows]
            + [np_.asarray(tcs, np_.float32),
               np_.asarray(frames, np_.float32)]))
        metas = [dict(palette=l.palette, clamping=l.clamping,
                      sampling=l.sampling, subspace=l.subspace,
                      gamma=l.gamma) for l in layers]
        st_leaves, st_def = jax.tree.flatten(graph.states)
        # row-shard state leaves whose second-minor axis is the frame
        # height; replicate the rest (ring heads, cursors)
        def _rowsharded(leaf):
            return (hasattr(leaf, "ndim") and leaf.ndim >= 2
                    and leaf.shape[-2] == H)
        row_mask = [_rowsharded(l) for l in st_leaves]
        up = [(i, (i + 1) % ns) for i in range(ns)]
        down = [(i, (i - 1) % ns) for i in range(ns)]

        def _ext(p, idx):
            """Halo-extend rows: neighbours' edge rows via ppermute,
            frame edges replicate (the filters' clamped shifts)."""
            if not R:
                return p
            top = jax.lax.ppermute(p[..., -R:, :], axis, up)
            bot = jax.lax.ppermute(p[..., :R, :], axis, down)
            top = jnp.where(idx == 0, jnp.repeat(p[..., :1, :], R, -2),
                            top)
            bot = jnp.where(idx == ns - 1,
                            jnp.repeat(p[..., -1:, :], R, -2), bot)
            return jnp.concatenate([top, p, bot], axis=-2)

        def body(packed, st_and_planes):
            st_loc = st_and_planes[:len(st_leaves)]
            planes = st_and_planes[len(st_leaves):]
            idx = jax.lax.axis_index(axis)
            y0 = idx * Hl - R

            def step(carry_leaves, per_frame):
                planes_f, col = per_frame
                ext_planes = [_ext(p, idx) for p in planes_f]
                ext_leaves = [_ext(l, idx) if m else l
                              for l, m in zip(carry_leaves, row_mask)]
                states_t = jax.tree.unflatten(st_def, ext_leaves)
                lyrs = [Layer(planes=(pp,), **m)
                        for pp, m in zip(ext_planes, metas)]
                tps = [dict() for _ in range(n_inst)]
                for r_, (i_, k_) in enumerate(rows):
                    tps[i_][k_] = col[r_]
                out, ns_t = frame_fn(lyrs, tps, states_t,
                                     col[-2], col[-1].astype(jnp.int32),
                                     origin=(y0, H, W))
                ns_leaves = jax.tree.leaves(ns_t)
                new_carry = [
                    (l[..., R:R + Hl, :] if (m and R) else l)
                    for l, m in zip(ns_leaves, row_mask)]
                o = out.planes[0]
                return new_carry, (o[..., R:R + Hl, :] if R else o)

            new_st, outs = jax.lax.scan(
                step, list(st_loc), (tuple(planes), packed.T))
            return tuple(new_st) + (outs,)

        plane_spec = P(None, None, axis, None)

        def leaf_spec(leaf, m):
            if not m:
                return P()
            return P(*([None] * (leaf.ndim - 2) + [axis, None]))

        st_specs = tuple(leaf_spec(l, m)
                         for l, m in zip(st_leaves, row_mask))
        shardfn = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(),
                      st_specs + tuple(plane_spec for _ in layers)),
            out_specs=st_specs + (plane_spec,)))
        res = shardfn(packed,
                      tuple(st_leaves) + tuple(l.planes[0]
                                               for l in layers))
        new_leaves = list(res[:len(st_leaves)])
        graph.states = jax.tree.unflatten(st_def, new_leaves)
        out = res[len(st_leaves)]
        return Layer(planes=(out,), palette=sink.palette,
                     gamma=sink.gamma)

    return run
