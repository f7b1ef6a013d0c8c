"""Pallas composite kernel: fuse a run of per-pixel effects into ONE pass.

XLA splits long effect chains with many streamed inputs into several
full-resolution kernels (6+ materialisations of a multi-GB comp at
10 tracks x 96 frames); this kernel runs the whole coordinate-free prefix of
a chain — transitions, keys, colour ops — over VMEM row-tiles in a single
sweep: 10 u8 track tiles in, one u8 comp tile out, per-frame params streamed
through SMEM. The effect *process functions themselves* are traced inside
the kernel body, so the fused path and the XLA path share one source of
truth.

Only translation-invariant effects qualify (no absolute-coordinate masks, no
global reductions, no gathers): see PALLAS_SAFE.

Status: measured at parity with the XLA path on the 10-track benchmark on a
remote-attached v5e, at the cost of a pathological Mosaic compile at full
resolution (the same 9-effect kernel compiles in ~1-8 s at 64x256 but
minutes at 1080p regardless of tile size — remote compile-helper behaviour,
to be profiled on attached hardware). Opt-in via
LIVES_TPU_PALLAS_COMPOSITE=1.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import Palette
from ..effects.host import FrameContext, Instance
from ..layer import Layer

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

#: coordinate-free, reduction-free, gather-free per-pixel filters
PALLAS_SAFE = {
    "crossfade", "blend_add", "blend_subtract", "blend_multiply",
    "blend_screen", "blend_darken", "blend_lighten", "blend_difference",
    "blend_exclusion", "blend_overlay", "blend_hardlight", "blend_dodge",
    "blend_burn", "blend_grain_extract", "blend_grain_merge",
    "luma_key", "chroma_key", "alpha_over", "mask_overlay",
    "negate", "brightness_contrast", "gamma_adjust", "saturation",
    "colour_balance", "levels", "greyscale", "sepia", "posterize",
    "solarize", "threshold", "softlight", "tint",
}


def splittable_prefix(chain: Sequence[Instance]) -> int:
    """Length of the leading run of chain instances the kernel can fuse:
    enabled pallas-safe filters writing to track 0 (disabled instances pass
    through)."""
    n = 0
    for inst in chain:
        if not inst.enabled:
            n += 1
            continue
        if inst.filter.name in PALLAS_SAFE and tuple(inst.out_tracks) == (0,):
            n += 1
            continue
        break
    return n


def supported(h: int, w: int) -> bool:
    if not (HAVE_PALLAS and w % 128 == 0 and h % 8 == 0 and w >= 256):
        return False
    import jax
    return jax.default_backend() == "tpu"  # Mosaic kernels need a real TPU


def _pick_tile(h: int, n_tracks: int, w: int) -> tuple[int, int]:
    """(tile_h, tile_w). Mosaic compile time scales hard with tile AREA
    (vector unrolling), so tiles stay small: ~16x512."""
    tw = 0
    for cand in (512, 384, 256, 128):
        if w % cand == 0:
            tw = cand
            break
    if not tw:
        return 0, 0
    for cand in (16, 8, 24, 32):
        if h % cand == 0 and (n_tracks + 1) * 3 * cand * tw <= 2 << 20:
            return cand, tw
    return 0, 0


def build_composite(prefix: Sequence[tuple], n_tracks: int,
                    B: int, h: int, w: int, rows_key, fps: float):
    """Returns fn(track_arrays list[(B,3,H,W) u8], packed (P,B) f32)
    -> comp (B,3,H,W) u8. prefix: chain_spec tuples
    (filter, static, in_tracks, out_tracks, enabled)."""
    tile_h, tile_w = _pick_tile(h, n_tracks, w)
    if not tile_h:
        return None

    def kernel(params_ref, *refs):
        ins = refs[:n_tracks]
        out_ref = refs[n_tracks]
        b = pl.program_id(0)  # frame index within the batch
        layers = [Layer(planes=(r[0],), palette=int(Palette.RGB24))
                  for r in ins]
        ctx = FrameContext(tc=params_ref[len(rows_key), b],
                           frame=params_ref[len(rows_key) + 1, b]
                           .astype(jnp.int32),
                           fps=fps, width=tile_w, height=tile_h)
        for idx, (filt, static, in_tr, out_tr, enabled) in enumerate(prefix):
            if not enabled:
                continue
            tp = {k: params_ref[r, b] for r, (i, k) in enumerate(rows_key)
                  if i == idx}
            params = {**{p.name: p.default for p in filt.params},
                      **static, **tp}
            params = {k: filt.param(k).clamp(v) for k, v in params.items()
                      if any(p.name == k for p in filt.params)}
            fx_ins = [layers[t] for t in in_tr[: filt.n_in]]
            out = filt.process(fx_ins, params, ctx)
            layers[out_tr[0]] = out
        out_ref[...] = layers[0].planes[0][None]

    def run(tracks, packed):
        """Traceable (called inside the plan template's jit)."""
        grid = (B, h // tile_h, w // tile_w)
        # whole params array in SMEM (blocked SMEM must obey (8,128) tiling;
        # a full-array spec is exempt) — kernel indexes by program_id
        in_specs = [pl.BlockSpec(
            (packed.shape[0], packed.shape[1]), lambda b, i, j: (0, 0),
            memory_space=pltpu.SMEM)]
        in_specs += [pl.BlockSpec((1, 3, tile_h, tile_w),
                                  lambda b, i, j: (b, 0, i, j),
                                  memory_space=pltpu.VMEM)] * n_tracks
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 3, tile_h, tile_w),
                                   lambda b, i, j: (b, 0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 3, h, w), jnp.uint8),
        )(packed, *tracks)

    return run
