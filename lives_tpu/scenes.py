"""Canonical benchmark/demo scenes (BASELINE.md configs).

Builds the 10-track multitrack timeline + fx chain that the driver metric is
defined on, with a deterministic on-device synthetic source (no disk decode
in the measured path — the reference metric is about the rendering core).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .constants import Palette
from .events.event_list import (EventList, TICKS_PER_SECOND,
                                filter_init_event, filter_map_event,
                                frame_event, param_change_event)
from .layer import Layer


class DeviceSyntheticSource:
    """Deterministic per-(clip, frame) frames generated on device.

    Cheap procedural content (clip-seeded gradients + motion), so source
    cost is negligible vs the composite being measured.
    """

    def __init__(self, h: int, w: int, alpha: bool = False):
        self.h, self.w, self.alpha = h, w, alpha
        self._fn = jax.jit(self._make, static_argnums=())

    @staticmethod
    def _channels(c, f, x, y):
        """The content formulas, shared by every execution mode: int32
        clip id `c`, frame `f`, pixel coords `x`/`y` (broadcastable int32
        arrays) -> (r, g, b) int32 channel arrays before the u8 wrap.
        Integer-only (no transcendentals) so source cost is negligible."""
        phase = c * 37 + f * 3
        blank = c < 0
        def chan(v):
            return jnp.where(blank, 0, v & 0xFF)
        r = chan(x * (3 + c % 5) // 16 + phase)
        g = chan(y * (2 + c % 3) // 8 - phase * 2)
        b = chan((x + y) // 8 + phase * 5)
        return r, g, b

    def _make(self, clip_ids, frame_nums):
        import jax
        h, w = self.h, self.w
        B = clip_ids.shape[0]
        x = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2)
        y = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1)
        c = clip_ids[:, None, None].astype(jnp.int32)
        f = frame_nums[:, None, None].astype(jnp.int32)
        # cast to u8 per channel BEFORE stacking: int32 (B,3,H,W) temps
        # would quadruple the write traffic of this generator
        r, g, b = (v.astype(jnp.uint8) for v in self._channels(c, f, x, y))
        u8 = jnp.stack([jnp.broadcast_to(r, (B, h, w)),
                        jnp.broadcast_to(g, (B, h, w)),
                        jnp.broadcast_to(b, (B, h, w))], 1)  # (B,3,H,W)
        if self.alpha:
            a = jnp.full((B, 1, h, w), 255, jnp.uint8)
            u8 = jnp.concatenate([u8, a], 1)
        return u8

    def traced_tile(self, clip_id, frame_num, yy, xx):
        """In-kernel LOAD step for the fused pallas sweep
        (graph/pallas_composite.build_fused_sweep): scalar int32 clip/frame
        + (th, tw) int32 global pixel-coordinate arrays -> (3, th, tw)
        int32 channels in [0, 255]. Must agree exactly with `_make` so
        the fused and XLA paths are interchangeable (parity-tested)."""
        r, g, b = self._channels(clip_id, frame_num, xx, yy)
        return jnp.stack([r, g, b], 0)

    def get_batch(self, clip_ids, frame_nums) -> Layer:
        arr = self._fn(jnp.asarray(np.asarray(clip_ids), jnp.int32),
                       jnp.asarray(np.asarray(frame_nums), jnp.int32))
        pal = Palette.RGBA32 if self.alpha else Palette.RGB24
        return Layer(planes=(arr,), palette=int(pal))

    def source_key(self):
        """Stable identity for plan-template caching."""
        return ("synthetic", self.h, self.w, self.alpha)

    def traced_layer(self, clip_ids, frame_nums) -> Layer:
        """Traceable LOAD step: build one track's batched Layer inside a
        plan template (FrameGraph.run_batch source=...)."""
        pal = Palette.RGBA32 if self.alpha else Palette.RGB24
        return Layer(planes=(self._make(clip_ids, frame_nums),),
                     palette=int(pal))

    def get_tracks_batch(self, clip_ids, frame_nums) -> list[Layer]:
        """(T,B) int arrays -> per-track Layers: ONE host->device upload
        (per-leaf transfer latency dominates on remote-attached TPUs), one
        generation kernel per track (one kernel for all T*B frames makes
        XLA materialise multi-GB int32 temps and OOM)."""
        T, B = clip_ids.shape
        both = jnp.asarray(np.stack([clip_ids, frame_nums]).astype(np.int32))
        pal = Palette.RGBA32 if self.alpha else Palette.RGB24
        return [Layer(planes=(self._fn(both[0, t], both[1, t]),),
                      palette=int(pal)) for t in range(T)]


def multitrack_timeline(n_tracks: int = 10, n_frames: int = 300,
                        width: int = 1920, height: int = 1080,
                        fps: float = 30.0) -> EventList:
    """10-track timeline: transitions folding tracks into track 0 + a
    per-frame fx chain, with an animated crossfade (BASELINE config 4)."""
    el = EventList(fps=fps, width=width, height=height)
    tpf = int(TICKS_PER_SECOND / fps)
    inits = []
    # fold tracks 1..n-1 into track 0 with alternating transitions
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
    # per-track fx chain on the composite (BASELINE config 3 effects)
    for name, vals in [("gaussian_blur", {"radius": 3, "amount": 0.6}),
                       ("colour_balance",
                        {"red": 1.1, "green": 1.0, "blue": 0.9}),
                       ("saturation", {"saturation": 1.3}),
                       ("vignette", {"amount": 0.7})]:
        init = filter_init_event(0, name, values=vals)
        el.insert(init)
        inits.append(init)
    el.insert(filter_map_event(0, [i.event_id for i in inits]))
    # animate the first crossfade over the timeline
    el.insert(param_change_event(0, inits[0].event_id, "amount", 0.0))
    el.insert(param_change_event((n_frames - 1) * tpf,
                                 inits[0].event_id, "amount", 1.0))
    for i in range(n_frames):
        el.insert(frame_event(i * tpf, list(range(1, n_tracks + 1)),
                              [i] * n_tracks))
    return el
