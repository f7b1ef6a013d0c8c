"""Pallas plan kernels: fuse the render plan into single VMEM sweeps.

XLA splits long effect chains with many streamed inputs into several
full-resolution kernels (6+ materialisations of a multi-GB comp at
10 tracks x 96 frames). Two fusion levels live here, both tracing the
effect *process functions themselves* inside the kernel body so the fused
and XLA paths share one source of truth:

1. `build_fused_sweep` — the PRODUCTION path for traceable sources (on by
   default; LIVES_TPU_FUSED_SWEEP=0 disables): the ENTIRE plan — in-VMEM
   track generation (`source.traced_tile`), every chain effect including
   separable stencils (blur via scratch-ref round-trips) and
   coordinate-dependent effects (ctx_grid tile origins), and the sink
   quantise — is ONE kernel per frame chunk. HBM traffic is the u8 output
   write only. Driver bench: 87-88x realtime at 1080p (20x for the XLA
   path), 24.4x realtime at 4K, parity +/-1 LSB vs the f32-comp XLA path
   (CPU interpret + real-TPU tests).

2. `build_composite` — the prefix kernel for HBM-fed (decoded) tracks:
   the coordinate-free pointwise prefix of a chain runs over VMEM
   row-tiles, tracks read once. Opt-in via LIVES_TPU_PALLAS_COMPOSITE=1
   (parity with XLA; wins only when XLA splits the chain).

Mosaic constraints encoded here (measured on v5e, PERF_NOTES.md):
int32-only iota; values data-dependent on an iota cannot be sliced
(store to a VMEM scratch ref and slice the ref); traced scalars cannot be
stacked into vectors; u8<->f32 casts route via int32.
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
    "chroma_blend", "luma_overlay", "luma_underlay",
    "negative_luma_overlay", "hue_rotate", "modulate", "colour_replace",
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


#: coordinate-dependent but pointwise effects (use effects.util.ctx_grid,
#: so they are tile-origin-aware inside the sweep kernel)
COORD_SAFE = {"vignette", "wipe", "iris_circle", "iris_rectangle",
              "dissolve", "rand_replace"}

#: separable small-stencil effects the sweep runs in-kernel over a halo:
#: name -> (kernel_fn(radius) -> taps, sharpen_mode)
def _stencil_fns():
    from ..effects.builtin.blur import _box_kernel, _gauss_kernel
    return {
        "gaussian_blur": (_gauss_kernel, False),
        "box_blur": (_box_kernel, False),
        "sharpen": (_gauss_kernel, True),
    }


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
        ti = pl.program_id(1)
        tj = pl.program_id(2)
        layers = [Layer(planes=(r[0],), palette=int(Palette.RGB24))
                  for r in ins]
        # FrameContext contract (host.py): width/height are the FULL frame
        # dims with the tile origin in y0/x0, so ctx_grid users stay
        # correct if they ever join PALLAS_SAFE
        ctx = FrameContext(tc=params_ref[len(rows_key), b],
                           frame=params_ref[len(rows_key) + 1, b]
                           .astype(jnp.int32),
                           fps=fps, width=w, height=h,
                           y0=ti * tile_h, x0=tj * tile_w)
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


# ---------------------------------------------------------------------------
# Fused sweep: the WHOLE plan (LOAD + chain + sink quantise) in one kernel
# ---------------------------------------------------------------------------

def _pick_sweep_tile(H: int, allow_full: bool = False) -> int | None:
    """Output tile height: full-width row bands. Bigger bands amortise the
    blur halo's wasted rows (vregs pad rows to 8 anyway); very tall bands
    inflate Mosaic compile time and VMEM. Measured on v5e with the raised
    scoped-VMEM limit (round 4, 10-track bench chain): 1080p optimum is
    120 rows (99.5x rt30 vs 86-88x at the old 40-row pick); 4K optimum is
    72 (26.9x vs 24.3x at 40) — taller 4K bands regress again (120 ->
    24.6x), so the preference order flips on frame height.
    LIVES_TPU_SWEEP_TILE overrides for tuning."""
    from ..prefs import pref
    forced = int(pref("sweep_tile") or 0)
    # Mosaic block rows must be multiples of 8 (or span the array)
    if forced and H % forced == 0 and (forced % 8 == 0 or forced == H):
        return forced
    # every candidate honours the Mosaic block-row rule (multiple of 8):
    # heights with no x8 divisor (e.g. 540) return None -> XLA fallback
    cands = (72, 120, 48, 40, 64, 32, 24, 16, 8) if H >= 1600 \
        else (120, 72, 48, 40, 64, 32, 24, 16, 8)
    for th in cands:
        if H % th == 0:
            return th
    if allow_full and H <= 160:
        # a block spanning the whole dimension is also legal (Mosaic's
        # "or equal to the respective dimension") — used for spatial
        # bands like 1080/8 = 135 whose height has no x8 divisor
        return H
    return None


def _sweep_vmem_bytes() -> int:
    """Mosaic scoped-VMEM ceiling for sweep kernels. The 16 MB default
    capped 4K tiles at 40 rows (a 48-row band needs 17.7 MB of scratch +
    track tiles); physical VMEM is 128 MB on v5e, so raising the scoped
    limit lets 4K run the tall bands that amortise the stencil halo.
    LIVES_TPU_SWEEP_VMEM_MB overrides (0 = Mosaic default)."""
    from ..prefs import pref
    mb = pref("sweep_vmem_mb")
    mb = int(mb) if mb else 96
    return mb << 20 if mb else None


def sweep_supported(H: int, W: int) -> bool:
    from ..prefs import pref
    if not HAVE_PALLAS:
        return False
    if W % 128 != 0 or _pick_sweep_tile(H) is None:
        return False
    import jax
    if pref("pallas_interpret") == "1":
        return True  # CPU interpret mode (tests)
    return jax.default_backend() == "tpu"


def build_fused_sweep(chain_spec, n_tracks: int, B: int, H: int, W: int,
                      rows_key, fps: float, source, sink, emit: str = "u8",
                      band_h: int | None = None, consume: str | None = None,
                      idx_base: int = 0):
    """Single-sweep plan template: in-kernel source generation + the entire
    effect chain + sink quantisation, one pallas kernel per frame chunk —
    HBM traffic is the u8 output write only.

    This is the terminal form of the nodemodel's purpose (reference
    src/nodemodel.c:447-807 cost minimisation = minimal memory traffic per
    frame): tracks are generated in VMEM from the source's `traced_tile`,
    pointwise effects run on full-width row bands with a halo sized for the
    chain's stencil effects (gaussian/box blur, sharpen), stencils run as
    valid-mode separable shifted-adds over a VMEM scratch round-trip, and
    the band is quantised and written once.

    Mosaic constraints honoured (measured on v5e, see PERF_NOTES.md):
    - iota must be int32 (tpu.iota rejects float);
    - values data-dependent on an iota CANNOT be sliced (compiler crash) —
      hence every stencil first stores its input to a VMEM scratch ref,
      whose reads slice fine;
    - u8<->f32 casts route via int32.

    Requirements: stateless chain writing track 0, a source with
    `traced_tile(clip_id, frame_num, yy, xx) -> (3,th,tw) int32 in 0..255`,
    RGB24 same-geometry sink, no letterbox. Multi-input (transition)
    effects must precede the first stencil. Returns
    fn(src_ids (2,T,B) int32, packed (P+2,B) f32) -> (B,3,H,W) uint8,
    or None when the chain/sink/source does not qualify.

    `emit="comp"` builds a PREFIX kernel instead: no sink step, the band
    is stored as a float comp (bf16 by default, f32 under
    LIVES_TPU_CHAIN_DTYPE=f32) — run_batch uses this to fuse generation +
    the stateless prefix of a STATEFUL chain into one kernel, then scans
    only the stateful remainder over the comp.

    `consume="comp"` builds a SUFFIX kernel: track 0 is read from an HBM
    float-comp operand (the lax.scan'd stateful middle's output) instead of
    being generated; the other tracks still generate in-VMEM. The suffix
    must be stencil-free (the comp operand carries no halo rows).
    `idx_base` offsets chain_spec's local indices into the GLOBAL rows_key
    instance numbering (suffix instances start at idx_base). Together with
    `emit="comp"` on the prefix, a stateful chain renders as
    [prefix sweep kernel] -> [scan of the stateful middle] ->
    [suffix sweep kernel] — only comps and state touch HBM.

    `band_h` builds a SPATIAL-BAND kernel: the output covers band_h rows
    of the H-row frame starting at a TRACED row offset, supplied as packed
    row P+2 (same value per batch entry). Because sweep sources are pure
    coordinate functions, each device of a spatially-sharded mesh
    generates its own stencil halo locally — the multi-chip sweep needs
    ZERO collectives (parallel/mesh.spatial_sweep_fn), and per-pixel
    arithmetic is bitwise identical to the single-device kernel.

    Halo semantics: generation coordinates are clamped to the frame, which
    reproduces the XLA path's edge padding exactly (all ops upstream of a
    stencil are pointwise, so edge-replicating their inputs equals
    edge-replicating their outputs).
    """
    from ..constants import Gamma
    from ..prefs import pref
    interpret = pref("pallas_interpret") == "1"
    if band_h is None:
        if not sweep_supported(H, W):
            return None
    else:
        # band mode relaxes only the TILE constraint (the band height has
        # its own tile pick below); platform + width rules still apply
        if not HAVE_PALLAS or W % 128 != 0:
            return None
        if not interpret and jax.default_backend() != "tpu":
            return None
    if source is None or not hasattr(source, "traced_tile") \
            or getattr(source, "alpha", False):
        return None
    comp_dt = None
    if emit == "comp":
        comp_dt = jnp.float32 if pref(
            "chain_dtype") == "f32" else jnp.bfloat16
    else:
        # sink constraints hold in EVERY u8-emitting mode (band included:
        # the kernel writes quantised RGB24 with no sink convert step)
        if sink.palette != Palette.RGB24 or sink.letterbox:
            return None
        if sink.width not in (0, W) or sink.height not in (0, H):
            return None
        if sink.gamma != Gamma.SRGB:  # synthetic layers are SRGB-tagged
            return None
    in_dt = None
    if consume == "comp":
        in_dt = jnp.float32 if pref(
            "chain_dtype") == "f32" else jnp.bfloat16
    out_h = band_h if band_h is not None else H
    stencils = _stencil_fns()
    plan: list[tuple] = []
    R = 0
    seen_stencil = False
    for (filt, static, in_tr, out_tr, enabled) in chain_spec:
        if not enabled:
            plan.append(("skip",))
            continue
        if tuple(out_tr) != (0,):
            return None
        if filt.name in stencils and consume == "comp":
            return None  # the comp operand carries no stencil halo
        if filt.name in stencils:
            rp = filt.param("radius")
            r = max(1, int(static.get("radius", rp.default)))
            r = min(r, int(rp.max))
            if r > 16:
                # XLA's sep_conv switches algorithms (band-matrix matmul
                # with edge renormalisation) above kernel length 33; the
                # shifted-add sweep would diverge past the +/-1 LSB parity
                # contract AND unroll 2r+1 taps in Mosaic — fall back
                return None
            plan.append(("stencil", r))
            R += r
            seen_stencil = True
        elif filt.name in PALLAS_SAFE or filt.name in COORD_SAFE:
            used = tuple(in_tr[: filt.n_in])
            if seen_stencil and used != (0,):
                return None  # post-stencil sizes only track layer 0
            if used and max(used) >= n_tracks:
                return None
            plan.append(("point",))
        else:
            return None
    TH = _pick_sweep_tile(out_h, allow_full=band_h is not None)
    if TH is None:
        return None
    # scratch per stencil, at that stencil's remaining halo
    scratch_shapes = []
    cur = R
    for step in plan:
        if step[0] == "stencil":
            scratch_shapes.append(
                pltpu.VMEM((3, TH + 2 * cur, W + 2 * cur), jnp.float32))
            cur -= step[1]
    P = len(rows_key)
    inv255 = np.float32(1.0 / 255.0)

    def kernel(params_ref, ids_ref, *rest):
        if in_dt is not None:
            comp_ref, out_ref, *scratches = rest
        else:
            comp_ref = None
            out_ref, *scratches = rest
        b = pl.program_id(0)
        i = pl.program_id(1)
        hh, ww = TH + 2 * R, W + 2 * R
        y_off = params_ref[P + 2, b].astype(jnp.int32) if band_h is not None \
            else 0
        yc = jnp.clip(jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
                      + (i * TH - R) + y_off, 0, H - 1)
        xc = jnp.clip(jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
                      - R, 0, W - 1)
        layers = []
        for t in range(n_tracks):
            if t == 0 and comp_ref is not None:
                layers.append(Layer(
                    planes=(comp_ref[0].astype(jnp.float32),),
                    palette=int(Palette.RGBFLOAT)))
                continue
            ch = source.traced_tile(ids_ref[t, b], ids_ref[n_tracks + t, b],
                                    yc, xc)
            layers.append(Layer(
                planes=(ch.astype(jnp.float32) * inv255,),
                palette=int(Palette.RGBFLOAT)))
        tc = params_ref[P, b]
        fr = params_ref[P + 1, b].astype(jnp.int32)
        cur = R
        si = 0
        for idx, (spec, step) in enumerate(zip(chain_spec, plan)):
            if step[0] == "skip":
                continue
            filt, static, in_tr, out_tr, enabled = spec
            tp = {k: params_ref[r_, b]
                  for r_, (i_, k) in enumerate(rows_key)
                  if i_ == idx + idx_base}
            params = {**{p.name: p.default for p in filt.params},
                      **static, **tp}
            params = {k: filt.param(k).clamp(v) for k, v in params.items()
                      if any(p.name == k for p in filt.params)}
            if step[0] == "stencil":
                r = step[1]
                arr = layers[0].planes[0]
                sc = scratches[si]
                si += 1
                sc[...] = arr
                kern_fn, sharpen = stencils[filt.name]
                kw = np.asarray(kern_fn(r), np.float32)
                kw = kw / kw.sum()  # _sep_conv_shifts renormalisation
                n = 2 * r + 1
                h_out = arr.shape[-2] - 2 * r
                w_out = arr.shape[-1] - 2 * r
                rows = sum(np.float32(kw[a]) * sc[:, a:a + h_out, :]
                           for a in range(n))
                blurred = sum(np.float32(kw[d]) * rows[:, :, d:d + w_out]
                              for d in range(n))
                base = sc[:, r:r + h_out, r:r + w_out]
                amount = params.get("amount", 1.0)
                if sharpen:
                    out = base + (base - blurred) * amount
                else:
                    out = base + (blurred - base) * amount
                out = jnp.clip(out, 0.0, 1.0)
                cur -= r
                layers = [Layer(planes=(out,),
                                palette=int(Palette.RGBFLOAT))] + layers[1:]
            else:
                ctx = FrameContext(tc=tc, frame=fr, fps=fps,
                                   width=W, height=H,
                                   y0=i * TH - cur + y_off, x0=-cur)
                fx_ins = [layers[t] for t in in_tr[: filt.n_in]]
                out = filt.process(fx_ins, params, ctx)
                layers[out_tr[0]] = out
        arr = layers[0].planes[0]
        if comp_dt is not None:  # prefix kernel: float comp out, no sink
            out_ref[...] = arr.astype(comp_dt)[None]
        else:
            u8 = jnp.clip(jnp.floor(arr * np.float32(255.0)
                                    + np.float32(0.5)),
                          0, 255).astype(jnp.int32).astype(jnp.uint8)
            out_ref[...] = u8[None]

    def run(src_ids, packed, comps=None):
        """Traceable: src_ids (2,T,B) int32, packed (P+2,B) f32
        (+ a (P+2)th row holding the band row offset in band mode;
        + comps (B,3,H,W) float in consume="comp" suffix mode)."""
        ids = src_ids.reshape(2 * n_tracks, B)
        grid = (B, out_h // TH)
        in_specs = [
            pl.BlockSpec((packed.shape[0], B), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * n_tracks, B), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        operands = [packed, ids]
        if in_dt is not None:
            in_specs.append(pl.BlockSpec((1, 3, TH, W),
                                         lambda b, i: (b, 0, i, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(comps.astype(in_dt))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 3, TH, W), lambda b, i: (b, 0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (B, 3, out_h, W),
                comp_dt if comp_dt is not None else jnp.uint8),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            **({} if interpret else {"compiler_params": pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=_sweep_vmem_bytes())}),
        )(*operands)

    return run


def sweep_suffix_len(chain: Sequence[Instance]) -> int:
    """Length of the trailing run of enabled stateless pointwise/coord
    effects (NO stencils: the suffix kernel's comp operand carries no
    halo) — the fusable suffix of a stateful chain."""
    from ..effects.host import FILTER_STATEFUL
    safe = PALLAS_SAFE | COORD_SAFE
    n = 0
    for inst in reversed(list(chain)):
        if not inst.enabled:
            n += 1
            continue
        if (inst.filter.flags & FILTER_STATEFUL
                or inst.filter.name not in safe):
            break
        n += 1
    return n


def sweep_prefix_len(chain: Sequence[Instance]) -> int:
    """Length of the leading run of enabled STATELESS sweep-safe effects
    (pointwise + coord + stencils) — the fusable prefix of a stateful
    chain (nodemodel's prefix sweep). The single source of truth for
    what the sweep kernel accepts; build_fused_sweep re-validates track
    wiring and returns None for anything this over-approximates."""
    from ..effects.host import FILTER_STATEFUL
    safe = PALLAS_SAFE | COORD_SAFE | set(_stencil_fns())
    n = 0
    for inst in chain:
        if not inst.enabled:
            n += 1
            continue
        if (inst.filter.flags & FILTER_STATEFUL
                or inst.filter.name not in safe):
            break
        n += 1
    return n
