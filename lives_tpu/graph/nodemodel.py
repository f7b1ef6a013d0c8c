"""Node model / plan compiler: the successor of `src/nodemodel.c`.

The reference builds a cost-optimised step DAG (LOAD / CONVERT / APPLY_INST)
per playback configuration and runs it with a thread-pool plan runner
(`build_nodemodel` :7692, `create_plan_from_model` :3071, `execute_plan`
:2691). On TPU the plan *is* a jitted XLA graph:

- a **plan template** = one traced+compiled function per configuration
  (track palettes/geometries, filter chain structure, sink spec) — XLA does
  the fusion/scheduling the reference's cost model approximates by hand;
- a **plan cycle** = one invocation of that function on a frame (or batch);
- the reference's palette-routing cost optimisation collapses into two
  rules applied at trace time: convert late, and never below source fidelity
  (negotiation in effects/host.py);
- `rebuild_nodemodel` on config change (player.c:2655) = a cache miss on the
  config key, compiling a new template while the old one keeps serving.

Traced vs static split: numeric/colour params are traced inputs (so fades and
knob turns reuse one compile); ints, choices, geometry and chain structure
are static. Stateful filters thread explicit state pytrees through the plan.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from ..constants import Gamma, Palette
from ..effects.host import FrameContext, Instance, apply_instance, get_filter
from ..layer import Layer
from ..ops.colorspace import convert_layer
from ..ops.gamma import gamma_convert_layer
from ..ops.resize import letterbox_layer, resize_layer

_STATIC_KINDS = ("int", "string", "string_list", "bool", "color")

#: process-wide compiled plan templates, keyed by full config
_TEMPLATE_CACHE: dict = {}
#: template key -> which build path produced it ("sf_fused",
#: "fused_sweep", ...); tests assert engagement against THIS, not key
#: candidacy flags
_TEMPLATE_KIND: dict = {}
#: exact eviction index: chain static key -> the template-cache keys it
#: owns (invalidate() pops precisely these instead of structurally
#: searching every key for an embedded chain key)
_CACHE_OWNERS: dict = {}


@dataclass(frozen=True)
class SinkSpec:
    """Output requirements (display / encoder / stream sink)."""
    width: int = 0            # 0 = keep source geometry
    height: int = 0
    palette: int = Palette.RGB24
    gamma: int = Gamma.SRGB
    letterbox: bool = False
    # resize quality; the player's adaptive-effort mode degrades this under
    # load (reference "effort"/pbq_adaptive, preferences.h:1399)
    method: str = "smooth" 

    def key(self):
        return dataclasses.astuple(self)


def _split_params(inst: Instance):
    """(static_values, traced_values) for an instance."""
    static, traced = {}, {}
    for p in inst.filter.params:
        v = inst.values.get(p.name, p.default)
        if p.kind in _STATIC_KINDS:
            static[p.name] = v
        else:
            traced[p.name] = v
    return static, traced


@dataclass(frozen=True)
class GenSlot:
    """A (GeneratorClip, frame number) pair for FrameGraph.run: generate
    the clip's frame `n` in-template with the clip's own clock
    (tc = n / clip.fps), matching clip.get_frame(n) exactly."""
    clip: Any
    n: int


def _chain_static_key(chain: Sequence[Instance]):
    parts = []
    for inst in chain:
        static, _ = _split_params(inst)
        parts.append((inst.filter.hashname, tuple(sorted(static.items())),
                      inst.in_tracks, inst.out_tracks, inst.enabled,
                      inst.filter.flags))
    return tuple(parts)


class FrameGraph:
    """Compiled frame pipeline for a (tracks, chain, sink) configuration.

    Usage:
        g = FrameGraph(chain, sink)
        out = g.run(layers, tc=0.04, frame=1)   # jit-cached per config
    """

    def __init__(self, chain: Sequence[Instance], sink: SinkSpec | None = None,
                 fps: float = 25.0,
                 cconx: Sequence[tuple] = ()):
        """`cconx`: static alpha-channel wiring (reference cconx,
        effects-data.c:1730) as (src_idx, out_channel_name, dst_idx,
        in_slot) tuples over chain indices. Edges must run forward
        (src_idx < dst_idx): inside ONE jitted template the source's alpha
        out-channel flows to the destination as a traced array — the
        analyser mask and its consumer execute in the same XLA
        computation, no host round-trip."""
        self.chain = list(chain)
        self.cconx = tuple(tuple(c) for c in cconx)
        for (si, name, di, slot) in self.cconx:
            if not si < di:
                raise ValueError(
                    f"cconx edge {si}->{di} must run forward in the chain "
                    "(the reference applies effects in key order; a "
                    "backward edge would read a frame-stale channel)")
            if not any(t.name == name
                       for t in self.chain[si].filter.alpha_outs):
                raise KeyError(f"{self.chain[si].filter.name}: no alpha "
                               f"out-channel {name!r}")
            if not 0 <= slot < len(self.chain[di].filter.alpha_ins):
                raise IndexError(f"{self.chain[di].filter.name}: no alpha "
                                 f"in-channel slot {slot}")
        self.sink = sink or SinkSpec()
        self.fps = fps
        # process-wide plan-template cache: the config key fully determines
        # the traced computation (chain hashnames + static params + tracks +
        # layer configs + sink), so compiled templates are shared across
        # FrameGraph instances — a renderer creating one graph per segment
        # reuses earlier segments' compilations
        self._templates = _TEMPLATE_CACHE
        self.states: list[Any] = [inst.state for inst in self.chain]
        self.stats: dict[Any, int] = {}

    # -- configuration key (plan-template cache key) -----------------------
    def _config_key(self, layers: Sequence[Layer]):
        from ..prefs import pref as _pref
        return (_chain_static_key(self.chain), self.cconx,
                tuple(l.config for l in layers),
                self.sink.key(), self.fps,
                _pref("chain_dtype"), _pref("float_chain"))

    # -- template compilation ---------------------------------------------
    def _build_template_packed(self, layers: Sequence[Layer], gens=()):
        """Packed-scalar live template: every traced scalar (chain params,
        generator params, generator clocks, tc/frame) arrives in ONE (K,)
        f32 array — per-leaf host->device transfers cost ~ms each on
        remote-attached TPUs (CLAUDE.md), and the unpacked pytree path
        shipped 5-10 leaves per frame, dominating live-path latency."""
        frame_fn = self._make_frame_fn()
        names = [sorted(_split_params(inst)[1]) for inst in self.chain]
        gen_names = [sorted(_split_params(l.inst)[1]) for _, l in gens]
        gen_slots = [i for i, _ in gens]
        gen_filters = [l.inst.filter for _, l in gens]
        gen_static = [_split_params(l.inst)[0] for _, l in gens]
        gen_dims = [(l.width, l.height) for _, l in gens]
        gen_fps = [getattr(l, "fps", self.fps) or self.fps for _, l in gens]

        def tmpl_fn(real_layers, packed, states):
            i = 0
            traced = []
            for nm in names:
                traced.append({k: packed[i + j]
                               for j, k in enumerate(nm)})
                i += len(nm)
            gen_traced = []
            for nm in gen_names:
                gen_traced.append({k: packed[i + j]
                                   for j, k in enumerate(nm)})
                i += len(nm)
            gen_times = []
            for _ in gens:
                gen_times.append((packed[i],
                                  packed[i + 1].astype(jnp.int32)))
                i += 2
            tc = packed[i]
            frame = packed[i + 1].astype(jnp.int32)
            lays, ri = [], 0
            total = len(real_layers) + len(gen_slots)
            for slot in range(total):
                if slot in gen_slots:
                    gi = gen_slots.index(slot)
                    filt = gen_filters[gi]
                    w, h = gen_dims[gi]
                    gtc, gframe = gen_times[gi]
                    ctx = FrameContext(tc=gtc, frame=gframe,
                                       fps=gen_fps[gi], width=w, height=h)
                    params = {**{p.name: p.default for p in filt.params},
                              **gen_static[gi], **gen_traced[gi]}
                    lays.append(filt.process([], params, ctx))
                else:
                    lays.append(real_layers[ri])
                    ri += 1
            return frame_fn(lays, traced, states, tc, frame)

        return jax.jit(tmpl_fn)

    def _build_template(self, layers: Sequence[Layer], gens=()):
        frame_fn = self._make_frame_fn()
        if not gens:
            return jax.jit(lambda lays, traced, _gt, _gtm, states, tc, frame:
                           frame_fn(lays, traced, states, tc, frame))
        # in-template generator LOAD: reconstruct the full layer stack by
        # generating the GeneratorClip slots from (tc, frame) + their
        # traced params, then run the chain — all one computation
        gen_slots = [i for i, _ in gens]
        gen_filters = [l.inst.filter for _, l in gens]
        gen_static = [_split_params(l.inst)[0] for _, l in gens]
        gen_dims = [(l.width, l.height) for _, l in gens]
        # each slot generates on ITS clip's clock (get_frame parity)
        gen_fps = [getattr(l, "fps", self.fps) or self.fps for _, l in gens]

        def tmpl_fn(real_layers, traced, gen_traced, gen_times, states,
                    tc, frame):
            lays, ri = [], 0
            total = len(real_layers) + len(gen_slots)
            for slot in range(total):
                if slot in gen_slots:
                    gi = gen_slots.index(slot)
                    filt = gen_filters[gi]
                    w, h = gen_dims[gi]
                    gtc, gframe = gen_times[gi]
                    ctx = FrameContext(tc=gtc, frame=gframe,
                                       fps=gen_fps[gi],
                                       width=w, height=h)
                    # NO clamp: GeneratorClip.get_frame does not clamp, and
                    # the in-template result must match it exactly
                    params = {**{p.name: p.default for p in filt.params},
                              **gen_static[gi], **gen_traced[gi]}
                    lays.append(filt.process([], params, ctx))
                else:
                    lays.append(real_layers[ri])
                    ri += 1
            return frame_fn(lays, traced, states, tc, frame)

        return jax.jit(tmpl_fn)

    def _to_sink(self, out: Layer) -> Layer:
        sink = self.sink
        if sink.width and sink.height and \
                (out.width, out.height) != (sink.width, sink.height):
            if sink.letterbox:
                out = letterbox_layer(out, sink.width, sink.height,
                                      method=sink.method)
            else:
                out = resize_layer(out, sink.width, sink.height,
                                   method=sink.method)
        if out.gamma != sink.gamma:
            out = gamma_convert_layer(out, sink.gamma)
        if out.palette != sink.palette:
            out = convert_layer(out, sink.palette)
        return out

    # -- execution ---------------------------------------------------------
    @staticmethod
    def _is_genclip(obj) -> bool:
        """A GeneratorClip whose frames can be generated INSIDE the run
        template (stateless generator filters only): passing the clip
        itself instead of a pulled Layer makes source generation part of
        the plan — one dispatch per frame and XLA fuses generation into
        the first consumers (the live-path analogue of run_batch's
        in-template LOAD)."""
        from ..effects.host import FILTER_STATEFUL
        if isinstance(obj, GenSlot):
            obj = obj.clip  # the wrapped clip must itself qualify
        inst = getattr(obj, "inst", None)
        return (inst is not None and hasattr(obj, "get_frame")
                and inst.filter.is_generator
                and not (inst.filter.flags & FILTER_STATEFUL))

    def run(self, layers: Sequence[Layer], tc: float = 0.0,
            frame: int = 0, mirror_state: bool = True) -> Layer:
        """One plan cycle: apply the chain to a layer stack. Entries may be
        GeneratorClips or GenSlots (see _is_genclip): those are generated
        in-template. A bare GeneratorClip animates on the graph clock
        (tc/frame as given); a GenSlot(clip, n) generates the clip's frame
        n exactly as clip.get_frame(n) would (tc = n / clip.fps) — the
        player uses GenSlots so scratching, independent bg rates and
        record/replay stay frame-accurate."""
        layers = list(layers)
        gens = []           # (slot, clip, frame_n or None)
        real = []
        for i, l in enumerate(layers):
            if self._is_genclip(l):
                if isinstance(l, GenSlot):
                    gens.append((i, l.clip, l.n))
                else:
                    gens.append((i, l, None))
            elif isinstance(l, GenSlot):
                raise ValueError(
                    "GenSlot wraps a stateful/non-generator clip; pull its "
                    "frames via get_frame instead")
            else:
                real.append(l)
        traced = [_split_params(inst)[1] for inst in self.chain]
        gen_traced = [_split_params(c.inst)[1] for _, c, _ in gens]
        # pack every traced scalar into ONE transfer when all values are
        # host scalars; device-resident values (data-connection wiring
        # feeds analyser out-params straight across) keep the pytree path
        # so they never round-trip through the host
        import numbers
        packable = all(isinstance(v, numbers.Number)
                       for d in (*traced, *gen_traced) for v in d.values())
        key = (self._config_key(real),
               tuple((i, c.inst.filter.hashname, c.width, c.height,
                      n is None,
                      tuple(sorted(_split_params(c.inst)[0].items())))
                     for i, c, n in gens), packable)
        tmpl = self._templates.get(key)
        if tmpl is None:
            pairs = [(i, c) for i, c, _ in gens]
            tmpl = (self._build_template_packed(real, pairs) if packable
                    else self._build_template(real, pairs))
            self._cache_put(key, tmpl)
        self.stats[key] = self.stats.get(key, 0) + 1
        if packable:
            import numpy as np
            vals: list[float] = []
            for d in traced:
                vals.extend(float(d[k]) for k in sorted(d))
            for d in gen_traced:
                vals.extend(float(d[k]) for k in sorted(d))
            for _, c, n in gens:
                if n is None:
                    vals.extend([float(tc), float(frame)])
                else:
                    vals.extend([n / (c.fps or 25.0), float(n)])
            vals.extend([float(tc), float(frame)])
            packed = jnp.asarray(np.asarray(vals, np.float32))
            out, new_states = tmpl(real, packed, self.states)
        else:
            gen_times = [(jnp.float32(tc), jnp.int32(frame)) if n is None
                         else (jnp.float32(n / (c.fps or 25.0)),
                               jnp.int32(n))
                         for _, c, n in gens]
            out, new_states = tmpl(real, traced, gen_traced, gen_times,
                                   self.states,
                                   jnp.float32(tc), jnp.int32(frame))
        if mirror_state:
            # state lives across frames on the graph, mirrored back to
            # the instances
            self.states = new_states
            for inst, st in zip(self.chain, self.states):
                inst.state = st
        return out

    # -- batch execution (the multitrack batch-render path) ----------------
    @property
    def has_stateful(self) -> bool:
        from ..effects.host import FILTER_STATEFUL
        return any(inst.filter.flags & FILTER_STATEFUL
                   for inst in self.chain)

    def run_batch(self, layers: Sequence[Layer], tcs, frames,
                  traced_params: list[dict] | None = None,
                  source=None, src_args=None) -> Layer:
        """One plan cycle over a frame batch.

        `layers`: per-track Layers whose planes carry a leading batch axis B.
        `tcs`/`frames`: (B,) arrays. `traced_params`: per-instance dicts of
        (B,) arrays (interpolated per frame); defaults to instance values
        broadcast over B. Stateless chains vmap (parallel over the batch);
        stateful chains lax.scan (state threads frame-to-frame). This is the
        reference's one-frame-at-a-time render_events loop (events.c:3802)
        re-expressed as a single XLA computation.

        `source`/`src_args`: when the frame source is itself traceable (a
        generator / synthetic source with a `traced_make` method and a
        stable `source_key`), pass it here with src_args=(clip_ids (T,B),
        frame_nums (T,B)) numpy arrays and `layers=[]`: generation becomes
        the plan's LOAD step *inside* the template — one dispatch per chunk,
        and XLA can fuse generation straight into the first consumers so
        source frames never round-trip through HBM.
        """
        import numpy as np
        layers = list(layers)
        tcs_np = np.asarray(tcs, np.float32)
        src_dev = None
        if source is not None:
            src_dev = jnp.asarray(np.stack(src_args).astype(np.int32))
        B = tcs_np.shape[0]
        if traced_params is None:
            traced_params = []
            for inst in self.chain:
                _, tp = _split_params(inst)
                traced_params.append(
                    {k: np.broadcast_to(np.float32(v), (B,))
                     for k, v in tp.items()})
        # pack every traced scalar stream into ONE host->device transfer:
        # per-leaf uploads dominate dispatch latency on remote-attached TPUs.
        # Frame numbers ride as f32 (exact to 2^24 ~ 78h @ 60fps); longer
        # absolute timelines should renumber per segment
        rows = [(i, k) for i, d in enumerate(traced_params)
                for k in sorted(d)]
        packed_np = np.stack(
            [np.asarray(traced_params[i][k], np.float32) for i, k in rows]
            + [tcs_np, np.asarray(frames, np.float32)])
        packed = jnp.asarray(packed_np)
        rows_key = tuple(rows)
        if self.has_stateful:
            # scan carry structure must be stable: materialise init states
            # at the FRAME geometry (source dims for in-template tracks —
            # the default SinkSpec is 0x0 and may differ from the source)
            from ..effects.host import FILTER_STATEFUL
            if layers:
                w0, h0, pal0 = (layers[0].width, layers[0].height,
                                layers[0].palette)
            elif source is not None:
                w0 = getattr(source, "w", 0) or self.sink.width
                h0 = getattr(source, "h", 0) or self.sink.height
                pal0 = None
            else:
                w0, h0, pal0 = self.sink.width, self.sink.height, None
            for i, inst in enumerate(self.chain):
                if (inst.filter.flags & FILTER_STATEFUL
                        and self.states[i] is None
                        and inst.filter.init_state is not None):
                    self.states[i] = inst.filter.init_state(w0, h0, pal0)
        # Eligibility for the pallas fusion paths is computed CHEAPLY here
        # (it is part of the template key); the kernels themselves are only
        # built on a cache miss — building a sweep closure per chunk would
        # waste the single host core (CLAUDE.md). Build success is a
        # deterministic function of the key'd config, so key-on-candidate
        # is sound.
        from ..prefs import pref as _pref2
        from .pallas_composite import sweep_prefix_len
        sweep_env = _pref2("fused_sweep") != "0" and not self.cconx
        sweepable_src = (source is not None and not layers and sweep_env
                         and hasattr(source, "traced_tile"))
        fused_eligible = sweepable_src and not self.has_stateful
        # stateful chains: generation + the stateless PREFIX fuse into one
        # sweep kernel emitting a float comp; only the stateful remainder
        # scans (track frames never materialise — see
        # benchmarks/render_stateful.py, 12.8x -> 133x)
        pre_n = 0
        suf_n = 0
        if sweepable_src and self.has_stateful:
            from .pallas_composite import sweep_suffix_len
            cand_s = sweep_suffix_len(self.chain)
            if cand_s >= 2:
                suf_n = cand_s
            cand = sweep_prefix_len(self.chain)
            # after a fused prefix the scan sees ONLY the comp layer, so
            # the scanned middle must read track 0 alone; the fused suffix
            # regenerates its other tracks in-kernel
            mid_hi = len(self.chain) - suf_n
            tail_ok = all(
                tuple(inst.in_tracks[: inst.filter.n_in]) in ((), (0,))
                for inst in self.chain[cand:mid_hi] if inst.enabled)
            if cand >= 1 and tail_ok:
                pre_n = cand
            elif suf_n:
                # no prefix: the in-scan-generation middle still needs its
                # multi-track reads inside the track count
                n_avail = src_dev.shape[1] if src_dev is not None else 0
                mid_ok = all(
                    max(inst.in_tracks[: inst.filter.n_in], default=0)
                    < n_avail
                    for inst in self.chain[:mid_hi] if inst.enabled)
                if not mid_ok:
                    suf_n = 0
            if pre_n + suf_n > len(self.chain):
                suf_n = len(self.chain) - pre_n
        # whole-plan fused STATEFUL sweep: state lives in VMEM across the
        # chunk's frames (graph/pallas_stateful.py); replaces the 3-phase
        # [prefix]->[scan]->[suffix] split when every stateful step is
        # kernel-supported. Chip-validated round 5 (0 LSB vs the scan
        # path on the fire+alien-led bench) but measured 6% SLOWER than
        # the 3-phase split on real silicon (74.3x vs 78.8x,
        # PERF_NOTES "Round-5 chip day"), so LIVES_TPU_FUSED_STATEFUL=1
        # stays opt-in on merit, not for safety.
        sf_eligible = False
        if sweepable_src and self.has_stateful \
                and _pref2("fused_stateful") == "1":
            from .pallas_stateful import stateful_sweep_len
            sf_eligible = stateful_sweep_len(self.chain)
        comp_n = 0
        comp_geo = None
        if (not sweepable_src and not self.has_stateful and not self.cconx
                and _pref2("pallas_composite") == "1"):
            from .pallas_composite import splittable_prefix, supported
            if source is not None:
                gh, gw = getattr(source, "h", 0), getattr(source, "w", 0)
                u8_ok = not getattr(source, "alpha", False)
            elif layers and all(
                    l.palette == Palette.RGB24
                    and l.planes[0].dtype == jnp.uint8
                    and l.planes[0].ndim == 4 for l in layers):
                gh, gw, u8_ok = layers[0].height, layers[0].width, True
            else:
                gh = gw = 0
                u8_ok = False
            if u8_ok and supported(gh, gw):
                cand = splittable_prefix(self.chain)
                if cand >= 3:
                    comp_n = cand
                    comp_geo = (gh, gw)
        key = ("batch", self._config_key(layers), self.has_stateful,
               rows_key, fused_eligible, pre_n, suf_n, comp_n,
               _pref2("sweep_tile"), _pref2("in_scan_gen"),
               _pref2("sweep_bands"), sf_eligible,
               source.source_key() if source is not None else None,
               tuple(src_dev.shape) if src_dev is not None else None)
        tmpl = self._templates.get(key)
        npre = 0
        nsuf = 0
        fused = None
        sf_fused = None
        pre_sweep = None
        suf_sweep = None
        comp_builder = None
        comp_tracks = 0
        if tmpl is None:
            # build the fusion kernels now (cache miss only)
            def _spec(chain):
                out = []
                for inst in chain:
                    static, _ = _split_params(inst)
                    out.append((inst.filter, static, inst.in_tracks,
                                inst.out_tracks, inst.enabled))
                return out

            from .pallas_composite import build_fused_sweep
            sf_fused = None
            if sf_eligible:
                from .pallas_stateful import build_fused_stateful_sweep
                sf_fused = build_fused_stateful_sweep(
                    _spec(self.chain), src_dev.shape[1], B,
                    getattr(source, "h", 0), getattr(source, "w", 0),
                    rows_key, self.fps, source, self.sink)
            if fused_eligible:
                from ..prefs import pref
                H_src = getattr(source, "h", 0)
                n_bands = int(pref("sweep_bands") or 0)
                if n_bands > 1 and H_src and H_src % n_bands == 0:
                    # single-chip spatial band split (experimental,
                    # LIVES_TPU_SWEEP_BANDS=N): run the proven band
                    # kernel (the multi-chip spatial_sweep_fn form,
                    # y-offset traced in packed row P+2) sequentially
                    # over N bands — probes whether shorter kernels
                    # beat the VMEM-tile-capped full-H sweep at 4K
                    band = build_fused_sweep(
                        _spec(self.chain), src_dev.shape[1], B,
                        H_src, getattr(source, "w", 0),
                        rows_key, self.fps, source, self.sink,
                        band_h=H_src // n_bands)
                    if band is not None:
                        bh = H_src // n_bands

                        def fused(src, packed, _b=band, _n=n_bands,
                                  _bh=bh):
                            outs = []
                            for i in range(_n):
                                y0 = jnp.full((1, packed.shape[1]),
                                              i * _bh, jnp.float32)
                                outs.append(_b(src, jnp.concatenate(
                                    [packed, y0], axis=0)))
                            return jnp.concatenate(outs, axis=2)
                if fused is None:
                    fused = build_fused_sweep(
                        _spec(self.chain), src_dev.shape[1], B,
                        H_src, getattr(source, "w", 0),
                        rows_key, self.fps, source, self.sink)
            if pre_n:
                pre_sweep = build_fused_sweep(
                    _spec(self.chain[:pre_n]), src_dev.shape[1], B,
                    getattr(source, "h", 0), getattr(source, "w", 0),
                    rows_key, self.fps, source, self.sink, emit="comp")
                if pre_sweep is not None:
                    npre = pre_n
            if suf_n:
                suf_sweep = build_fused_sweep(
                    _spec(self.chain[-suf_n:]), src_dev.shape[1], B,
                    getattr(source, "h", 0), getattr(source, "w", 0),
                    rows_key, self.fps, source, self.sink,
                    consume="comp", idx_base=len(self.chain) - suf_n)
                if suf_sweep is not None:
                    nsuf = suf_n
            if comp_n:
                from .pallas_composite import build_composite
                gh, gw = comp_geo
                n_avail = len(layers) if layers else (
                    int(src_dev.shape[1]) if src_dev is not None else None)
                prefix_spec = []
                maxtrack = 0
                # clamp missing tracks to the front layer, matching
                # apply_instance's short-stack fallback
                for (filt, static, in_tr, out_tr, enabled) \
                        in _spec(self.chain[:comp_n]):
                    in_tr = tuple(
                        t if n_avail is None or t < n_avail else 0
                        for t in in_tr)
                    prefix_spec.append((filt, static, in_tr, out_tr,
                                        enabled))
                    maxtrack = max([maxtrack, *in_tr])
                comp_tracks = maxtrack + 1
                comp_builder = build_composite(
                    prefix_spec, comp_tracks, B, gh, gw, rows_key,
                    self.fps)
                if comp_builder is not None:
                    npre = comp_n
        if tmpl is None and sf_fused is not None:
            sink_gamma = self.sink.gamma

            def batch_fn(layers, src, packed, states, _f=sf_fused):
                u8, new_states = _f(src, packed, states)
                return Layer(planes=(u8,), palette=int(Palette.RGB24),
                             gamma=sink_gamma), new_states

            tmpl = jax.jit(batch_fn)
            self._cache_put(key, tmpl, kind="sf_fused")
        if tmpl is None and fused is not None:
            sink_gamma = self.sink.gamma

            def batch_fn(layers, src, packed, states, _f=fused):
                comp = _f(src, packed)
                return Layer(planes=(comp,), palette=int(Palette.RGB24),
                             gamma=sink_gamma), states

            tmpl = jax.jit(batch_fn)
            self._cache_put(key, tmpl, kind="fused_sweep")
        if tmpl is None:
            stop = len(self.chain) - nsuf
            frame_fn = self._make_frame_fn(start=npre, stop=stop,
                                           emit_comp=nsuf > 0)
            n_inst = len(self.chain)

            def unpack(col):
                # col: (P+2,) packed scalars for one frame
                tps = [dict() for _ in range(n_inst)]
                for r, (i, k) in enumerate(rows_key):
                    tps[i][k] = col[r]
                return tps, col[-2], col[-1].astype(jnp.int32)

            def one(layers, col, states):
                tps, tc, fr = unpack(col)
                out, ns = frame_fn(layers, tps[npre:stop],
                                   states[npre:stop], tc, fr)
                return out, states[:npre] + ns + states[stop:]

            def materialise(layers, src):
                if source is None:
                    return layers
                # in-template LOAD step: generate every track's frames
                T = src.shape[1]
                return list(layers) + [source.traced_layer(src[0, t],
                                                           src[1, t])
                                       for t in range(T)]

            if self.has_stateful:
                # LIVES_TPU_IN_SCAN_GEN=0: A/B knob for the pre-batch
                # materialisation path (benchmarks/render_stateful_led.py)
                in_scan_gen = (source is not None and not layers
                               and _pref2("in_scan_gen") != "0")

                sink_gamma = self.sink.gamma

                def finish(outs, new_states, src, packed, _suf=suf_sweep):
                    if _suf is None:
                        return outs, new_states
                    # fused SUFFIX: the scanned middle emitted float comps;
                    # one sweep kernel regenerates the suffix's other
                    # tracks in-VMEM, applies the trailing stateless run
                    # and quantises — comp in, u8 out
                    u8 = _suf(src, packed, outs.planes[0])
                    return Layer(planes=(u8,), palette=int(Palette.RGB24),
                                 gamma=sink_gamma), new_states

                def batch_fn(layers, src, packed, states, _pre=pre_sweep):
                    if _pre is not None:
                        # generation + stateless prefix: one sweep kernel,
                        # float comp out; scan only the stateful remainder
                        comp = _pre(src, packed)
                        layers = [Layer(planes=(comp,),
                                        palette=int(Palette.RGBFLOAT))]
                    elif in_scan_gen:
                        # stateful-LED chain (no fusable prefix): generate
                        # each frame's tracks INSIDE the scan body. Scan
                        # xs must be materialised buffers, so pre-batch
                        # generation would write T x B full frames to HBM
                        # (the dominant traffic at 10 tracks); in-body
                        # generation lets XLA fuse the LOAD step straight
                        # into the chain — only state + comp touch HBM
                        T = src.shape[1]

                        def gstep(states, per_frame):
                            src_col, col = per_frame  # (2,T), (P+2,)
                            lyrs = []
                            for t in range(T):
                                l = source.traced_layer(
                                    src_col[0, t][None],
                                    src_col[1, t][None])
                                lyrs.append(l.replace(planes=tuple(
                                    p[0] for p in l.planes)))
                            out, ns = one(lyrs, col, states)
                            return ns, out
                        new_states, outs = jax.lax.scan(
                            gstep, states,
                            (jnp.moveaxis(src, 2, 0), packed.T))
                        return finish(outs, new_states, src, packed)
                    else:
                        layers = materialise(layers, src)

                    def step(states, per_frame):
                        lyrs, col = per_frame
                        out, ns = one(lyrs, col, states)
                        return ns, out
                    new_states, outs = jax.lax.scan(
                        step, states, (layers, packed.T))
                    return finish(outs, new_states, src, packed)
            else:
                vm = jax.vmap(one, in_axes=(0, 1, None))

                _comp_n = comp_tracks if comp_builder is not None else 0

                def batch_fn(layers, src, packed, states,
                             _comp=comp_builder, _npre=npre, _cn=_comp_n):
                    layers = materialise(layers, src)
                    if _comp is not None:
                        # pass exactly the track count the kernel was built
                        # for (pallas_call operands must match in_specs)
                        tracks = [l.planes[0] for l in layers[:_cn]]
                        comp = _comp(tracks, packed)
                        layers = [Layer(planes=(comp,),
                                        palette=int(Palette.RGB24))] \
                            + layers[1:]
                    return vm(layers, packed, states)
            tmpl = jax.jit(batch_fn)
            self._cache_put(key, tmpl)
        out, self.states = tmpl(layers, src_dev, packed, self.states)
        for inst, st in zip(self.chain, self.states):
            inst.state = st
        return out

    def _make_frame_fn(self, start: int = 0, stop: int | None = None,
                       emit_comp: bool = False):
        """Untraced single-frame function (shared by run and run_batch).
        `start` skips chain instances already applied by a fused composite
        kernel; `stop` cuts the chain before instances a fused SUFFIX
        kernel will apply (their traced_params/states entries must be
        sliced off by the caller). `emit_comp` returns the float comp
        (no sink step) for the suffix kernel to consume.

        The returned fn accepts an optional `origin=(y0, full_h, full_w)`:
        when given, the layers are a horizontal band (possibly halo-padded)
        of a larger frame — FrameContext carries the global geometry so
        coordinate-dependent effects (ctx_grid users) stay correct, and the
        sink resize/letterbox step is skipped (the caller owns assembly).
        This is how the spatially-sharded multi-chip path
        (parallel/mesh.spatial_batch_fn) runs the production chain."""
        chain_spec = []
        for inst in self.chain[start: stop]:
            static, _ = _split_params(inst)
            chain_spec.append((inst.filter, static, inst.in_tracks,
                               inst.out_tracks, inst.enabled))
        sink = self.sink
        fps = self.fps
        cconx = self.cconx

        from ..prefs import pref as _pref
        float_chain = (len(chain_spec) >= 2
                       and _pref("float_chain") != "0")

        def frame_fn(layers, traced_params, states, tc, frame, origin=None):
            w0 = layers[0].width if layers else sink.width
            h0 = layers[0].height if layers else sink.height
            if origin is not None:
                y0, full_h, full_w = origin
                ctx = FrameContext(tc=tc, frame=frame, fps=fps,
                                   width=full_w, height=full_h, y0=y0)
            else:
                ctx = FrameContext(tc=tc, frame=frame, fps=fps,
                                   width=w0 or sink.width,
                                   height=h0 or sink.height)
            layers = list(layers)
            if float_chain:
                # run the chain in float layers: quantise once at entry and
                # once at the sink instead of per effect — lets XLA fuse the
                # whole chain (and beats the reference's per-filter u8
                # round-trip on quality). Comps are stored bf16 between
                # effects (math upcasts to f32 inside each effect), halving
                # inter-stage HBM traffic for <=+/-1 LSB at the sink.
                from ..constants import (Palette as _P, has_alpha as _ha,
                                         is_rgb_palette as _rgb)

                # inter-stage comp dtype: bf16 halves HBM traffic at
                # <=+/-3 LSB vs f32; f32 matches the fused pallas sweep
                # exactly (parity tests set LIVES_TPU_CHAIN_DTYPE=f32)
                comp_dt = jnp.float32 if _pref(
                    "chain_dtype") == "f32" else jnp.bfloat16

                def to_float(l):
                    fl = convert_layer(
                        l, _P.RGBAFLOAT if _ha(l.palette) else _P.RGBFLOAT)
                    return fl.replace(planes=tuple(
                        p.astype(comp_dt) for p in fl.planes))
                layers = [to_float(l) if _rgb(l.palette) else l
                          for l in layers]
            if not layers:
                layers = [None]
            new_states = []
            # cconx: alpha out-channels exported earlier in the chain feed
            # later instances' alpha in-slots — all inside this one trace
            # (the reference copies channel pixel_data between instances
            # per frame, cconx_chain_data effects-data.c:2283)
            alpha_store: dict[tuple[int, str], Any] = {}
            for i, ((filt, static, in_tr, out_tr, enabled), tp, st) in \
                    enumerate(zip(chain_spec, traced_params, states)):
                a_ins = None
                for (si, name, di, slot) in cconx:
                    if di == i + start and (si, name) in alpha_store:
                        a_ins = a_ins or {}
                        a_ins[slot] = alpha_store[(si, name)]
                inst = Instance(filter=filt, values={**static, **tp},
                                state=st, enabled=enabled,
                                in_tracks=in_tr, out_tracks=out_tr)
                layers = apply_instance(inst, layers, ctx, alpha_ins=a_ins)
                new_states.append(inst.state)
                for nm, lay in inst.out_channels.items():
                    alpha_store[(i + start, nm)] = lay
            out = layers[0]
            if emit_comp:
                # suffix-kernel handoff: float comp, no sink step
                from ..constants import Palette as _P2
                comp_dt2 = jnp.float32 if _pref(
                    "chain_dtype") == "f32" else jnp.bfloat16
                if out.palette != int(_P2.RGBFLOAT):
                    out = convert_layer(out, _P2.RGBFLOAT)
                out = out.replace(planes=tuple(
                    p.astype(comp_dt2) for p in out.planes))
                return out, new_states
            if origin is not None:
                # band execution: pointwise sink steps only (gamma/palette);
                # geometry belongs to the caller
                if out.gamma != sink.gamma:
                    out = gamma_convert_layer(out, sink.gamma)
                if out.palette != sink.palette:
                    out = convert_layer(out, sink.palette)
            else:
                out = self._to_sink(out)
            return out, new_states

        return frame_fn

    def _cache_put(self, key, tmpl, kind: str = ""):
        """Store a compiled template + record exact ownership for
        invalidate(). `kind` records WHICH build path produced the
        template (diagnostics + engagement asserts in tests — a key
        flag alone only proves candidacy, not that the builder
        succeeded)."""
        self._templates[key] = tmpl
        if kind:
            _TEMPLATE_KIND[key] = kind
        _CACHE_OWNERS.setdefault(_chain_static_key(self.chain),
                                 set()).add(key)

    def invalidate(self):
        """Drop THIS graph's compiled templates (config change; reference
        rebuild_nodemodel, nodemodel.c:7853). The template cache is shared
        process-wide; the ownership index maps this chain's static key to
        exactly the entries it created — clearing everything would
        recompile every other graph (30 s-minutes per template through
        the tunnel)."""
        ck = _chain_static_key(self.chain)
        for key in _CACHE_OWNERS.pop(ck, ()):
            self._templates.pop(key, None)
