"""Batch event-list renderer — the north-star path.

The reference renders timelines strictly one frame at a time
(`render_events`, src/events.c:3802): pull layers, apply the filter map,
write a PNG, repeat. Here the event list is segmented at filter-map
boundaries; within a segment the chain is static, so whole frame *batches*
run as one vmapped XLA computation per chunk (FrameGraph.run_batch), with
per-frame parameter values interpolated host-side into (B,) traced arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterator, Protocol, Sequence

import jax.numpy as jnp
import numpy as np

from ..constants import Palette
from ..effects.host import Instance, get_filter
from ..graph.nodemodel import FrameGraph, SinkSpec
from ..layer import Layer
from .event_list import Event, EventList, EventType, TICKS_PER_SECOND


class FrameSource(Protocol):
    """Supplies decoded source layers per (clip, frame). Batch form returns a
    Layer whose planes carry a leading batch axis."""

    def get_batch(self, clip_ids: Sequence[int],
                  frame_nums: Sequence[int]) -> Layer: ...


@dataclass
class Segment:
    """A run of FRAME events under one constant filter map."""
    frames: list[Event]
    inits: list[Event]       # active FILTER_INIT events, application order


def segment_events(el: EventList) -> list[Segment]:
    """Split the timeline at filter-map changes, track-pattern changes (so
    each segment has a fixed per-track clip lineup), and STATIC-kind
    PARAM_CHANGEs (int/choice/string params retrace the template, so the
    re-render must switch chains exactly where the performer did).

    One incremental pass over the sorted events — the per-frame
    active_inits_at scan made this O(N^2) on long recordings."""
    from ..graph.nodemodel import _STATIC_KINDS
    segs: list[Segment] = []
    cur: list[Event] = []
    cur_ids: tuple | None = None
    cur_clips: tuple | None = None
    cur_snapshot: list[Event] = []
    inits_by_id: dict[str, Event] = {}
    order: list[str] | None = None
    pending_split = False
    kind_cache: dict[tuple[str, str], str] = {}
    # DEINITs rank AFTER the FRAME at the same tc, but active_inits_at
    # semantics include every event at <= tc: precompute each init's
    # deinit tc so a frame at that tc already sees it inactive
    INF = float("inf")
    deinit_tc: dict[str, int] = {}
    for e in el.events:
        if e.type == EventType.FILTER_DEINIT:
            d = e.props.get("init_event")
            if d is not None and d not in deinit_tc:
                deinit_tc[d] = e.tc

    def active_list(tc):
        alive = {k: v for k, v in inits_by_id.items()
                 if deinit_tc.get(k, INF) > tc}
        if order is not None:
            out = [alive[i] for i in order if i in alive]
            out += [v for k, v in alive.items() if k not in order]
            return out
        return list(alive.values())

    def static_change(e) -> bool:
        init = inits_by_id.get(e.props.get("init_event"))
        if init is None:
            return False
        key = (init.props["filter"], e.props["param"])
        if key not in kind_cache:
            try:
                kind_cache[key] = get_filter(key[0]).param(key[1]).kind
            except KeyError:
                kind_cache[key] = "num"
        return kind_cache[key] in _STATIC_KINDS

    for e in el.events:
        if e.type == EventType.FILTER_INIT:
            if e.props.get("audio"):
                continue  # audio filters mix in the audio path; letting
                # them into the active set would split video segments
                # (and cost a template compile) at avol boundaries
            inits_by_id[e.event_id] = e
        elif e.type == EventType.FILTER_DEINIT:
            pass  # handled via deinit_tc (same-tc semantics)
        elif e.type == EventType.FILTER_MAP:
            order = e.props.get("init_events")
        elif e.type == EventType.PARAM_CHANGE and static_change(e):
            pending_split = True
        elif e.type == EventType.FRAME:
            act = active_list(e.tc)
            ids = tuple(i.event_id for i in act)
            clips = tuple(e.clips)
            if cur and (ids != cur_ids or clips != cur_clips
                        or pending_split):
                segs.append(Segment(frames=cur, inits=cur_snapshot))
                cur = []
            if not cur:
                cur_snapshot = act
                cur_ids, cur_clips = ids, clips
            pending_split = False
            cur.append(e)
    if cur:
        segs.append(Segment(frames=cur, inits=cur_snapshot))
    return segs


def _chain_for(inits: list[Event], el: EventList,
               start_tc: int | None = None
               ) -> "tuple[list[Event], list[Instance]]":
    """Instances for a segment's active inits. Filters absent from the
    registry (e.g. imported reference layouts naming plugins we don't
    ship) are skipped with a warning rather than failing the render —
    the reference's loader does the same for missing plugins.
    Returns (kept_inits, chain) aligned pairwise (param interpolation
    zips them)."""
    kept, chain = [], []
    for init in inits:
        if init.props.get("audio"):
            continue  # audio-only filters (avol) mix in the audio path
        name = init.props["filter"]
        try:
            f = get_filter(name)
        except KeyError:
            import warnings
            warnings.warn(f"skipping unknown filter {name!r} "
                          "(not in the registry)")
            continue
        values = dict(init.props.get("values", {}))
        if start_tc is not None:
            # fold in recorded STATIC-kind param changes effective at the
            # segment start (traced kinds interpolate per frame instead)
            from ..graph.nodemodel import _STATIC_KINDS
            for e in el.events:
                if e.tc > start_tc:
                    break
                if (e.type == EventType.PARAM_CHANGE
                        and e.props.get("init_event") == init.event_id):
                    try:
                        kind = f.param(e.props["param"]).kind
                    except KeyError:
                        continue
                    if kind in _STATIC_KINDS:
                        values[e.props["param"]] = e.props["value"]
        inst = Instance(filter=f, values=values,
                        in_tracks=tuple(init.props.get("in_tracks", (0,))),
                        out_tracks=tuple(init.props.get("out_tracks", (0,))))
        kept.append(init)
        chain.append(inst)
    return kept, chain


def _cconx_for(kept: list[Event]) -> list[tuple]:
    """In-template channel wiring recorded on init events (player
    _annotate_rec_cconx): [[src_init_event_id, out_channel, slot], ...]
    on the DESTINATION init -> (src_idx, name, dst_idx, slot) over the
    kept chain. The render re-applies the performance's cconx exactly
    (reference: cconx_chain_data under is_rendering, effects-data.c:2295)."""
    idx = {init.event_id: i for i, init in enumerate(kept)}
    edges = []
    for di, init in enumerate(kept):
        for src_eid, name, slot in init.props.get("cconx", ()):
            si = idx.get(src_eid)
            if si is not None and si < di:
                edges.append((si, name, di, slot))
    return edges


def _interp_arrays(el: EventList, inits: list[Event],
                   chain: list[Instance], tcs: list[int]):
    """Per-instance dicts of per-frame traced param arrays.

    Vectorised: pchains are indexed once and evaluated with np.interp for
    the whole batch (the per-frame interp_param scan was the renderer's
    host-side bottleneck — 40x the device cost at 10 tracks). Returns HOST
    numpy arrays: run_batch packs them into a single device transfer, and a
    device round-trip here would cost a tunnel sync per param."""
    tcs_arr = np.asarray(tcs, np.float64)
    # index all PARAM_CHANGE events once
    pchains: dict[tuple[str, str], list] = {}
    for e in el.events:
        if e.type == EventType.PARAM_CHANGE:
            pchains.setdefault(
                (e.props["init_event"], e.props["param"]), []).append(
                (e.tc, e.props["value"]))
    out = []
    for init, inst in zip(inits, chain):
        d = {}
        from ..graph.nodemodel import _STATIC_KINDS
        for p in inst.filter.params:
            if p.kind in _STATIC_KINDS:
                continue
            base = init.props.get("values", {}).get(p.name, p.default)
            chain_pts = pchains.get((init.event_id, p.name))
            if not chain_pts:
                d[p.name] = np.full(len(tcs), base, np.float32)
                continue
            numeric = all(isinstance(v, (int, float))
                          for _, v in chain_pts)
            if not numeric:
                vals = [el.interp_param(init, p.name, tc) for tc in tcs]
                d[p.name] = np.asarray(vals, np.float32)
                continue
            xp = np.asarray([init.tc] + [t for t, _ in chain_pts],
                            np.float64)
            fp = np.asarray([base if base is not None
                             else chain_pts[0][1]]
                            + [v for _, v in chain_pts], np.float64)
            # np.interp needs increasing xp; event insertion keeps tc order,
            # but an init-time change (same tc) must win over the base value
            keep = np.concatenate([xp[1:] > xp[:-1], [True]])
            d[p.name] = np.interp(tcs_arr, xp[keep],
                                  fp[keep]).astype(np.float32)
        out.append(d)
    return out


def render_events(el: EventList, source: FrameSource,
                  sink: SinkSpec | None = None,
                  batch_size: int = 32,
                  fps: float | None = None) -> Iterator[tuple[list[int], Layer]]:
    """Render an event list; yields (tc_list, batched output Layer) chunks.

    Successor of render_events/render_to_clip (events.c:3802,4994)."""
    fps = fps or el.fps
    sink = sink or SinkSpec(width=el.width, height=el.height)
    segs = segment_events(el)
    if segs:
        # a trailing audio terminator bounds the timeline's audio; it is
        # not a frame of video content (multitrack block-end off marker)
        from .event_list import is_audio_terminator
        if is_audio_terminator(segs[-1].frames[-1]):
            segs[-1].frames.pop()
            if not segs[-1].frames:
                segs.pop()
    for seg in segs:
        inits, chain = _chain_for(seg.inits, el, seg.frames[0].tc)
        graph = FrameGraph(chain, sink, fps=fps, cconx=_cconx_for(inits))
        n_tracks = max((len(f.clips) for f in seg.frames), default=0)
        for ofs in range(0, len(seg.frames), batch_size):
            chunk = seg.frames[ofs: ofs + batch_size]
            tcs = [f.tc for f in chunk]
            # int64: FRAME events recorded from live playback carry 63-bit
            # clip unique_ids
            cids = np.full((n_tracks, len(chunk)), -1, np.int64)
            fnums = np.zeros((n_tracks, len(chunk)), np.int64)
            for j, f in enumerate(chunk):
                for t in range(min(n_tracks, len(f.clips))):
                    cids[t, j] = f.clips[t]
                    fnums[t, j] = f.frames[t]
            params = _interp_arrays(el, inits, chain, tcs)
            tcs_s = np.asarray(tcs, np.float64) / TICKS_PER_SECOND
            frame_idx = np.asarray(
                [round(tc * fps / TICKS_PER_SECOND) for tc in tcs], np.int32)
            if hasattr(source, "traced_layer"):
                # traceable source: generation happens inside the plan
                # template (one dispatch per chunk; XLA fuses the LOAD step
                # into the chain)
                out = graph.run_batch([], tcs_s.astype(np.float32),
                                      frame_idx, params, source=source,
                                      src_args=(cids, fnums))
            else:
                if hasattr(source, "get_tracks_batch"):
                    layers = source.get_tracks_batch(cids, fnums)
                else:
                    layers = [source.get_batch(list(cids[t]),
                                               list(fnums[t]))
                              for t in range(n_tracks)]
                out = graph.run_batch(layers, tcs_s.astype(np.float32),
                                      frame_idx, params)
            yield tcs, out


def render_to_arrays(el: EventList, source: FrameSource,
                     sink: SinkSpec | None = None,
                     batch_size: int = 32,
                     progress_cb=None) -> tuple[np.ndarray, list[int]]:
    """Convenience: render everything, return (stacked RGB frames, tcs).
    `progress_cb(frames_done)` fires after each batch (the render
    progress dialog's hook)."""
    outs, all_tcs = [], []
    for tcs, lay in render_events(el, source, sink, batch_size):
        outs.append(np.asarray(lay.planes[0]))
        all_tcs.extend(tcs)
        if progress_cb is not None:
            progress_cb(len(all_tcs))
    return np.concatenate(outs, 0), all_tcs


class ClipFrameSource:
    """FrameSource over real clips keyed by the unique_ids that live
    recordings store in FRAME events (player record path). The bridge used
    by render_recording / crash-recovery re-renders
    (deal_with_render_choice, events.c:5955)."""

    def __init__(self, clips_by_uid: dict, palette: int | None = None):
        from ..constants import Palette as _P
        self.clips = dict(clips_by_uid)
        self.palette = palette or int(_P.RGB24)

    def get_batch(self, clip_ids, frame_nums) -> Layer:
        import jax.numpy as jnp

        from ..constants import Palette as _P
        from ..layer import layer_blank
        from ..ops.colorspace import convert_layer
        # collect on HOST, upload ONCE: per-frame device transfers cost
        # ~ms each on the remote-attached TPU (CLAUDE.md) — one packed
        # (B,C,H,W) array replaces B separate uploads + stacks
        arrs = []
        for c, f in zip(clip_ids, frame_nums):
            clip = self.clips.get(int(c))
            if clip is None:
                ref_clip = next(iter(self.clips.values()), None)
                w = getattr(ref_clip, "width", 64)
                h = getattr(ref_clip, "height", 64)
                lay = layer_blank(w, h, self.palette)
            else:
                lay = convert_layer(clip.get_frame(int(f)), self.palette)
            arrs.append(np.asarray(lay.planes[0]))
        return Layer(planes=(jnp.asarray(np.stack(arrs)),),
                     palette=self.palette)


def render_recording(el: EventList, clips_by_uid: dict,
                     sink: SinkSpec | None = None, fps: float | None = None,
                     batch_size: int = 32):
    """Render a recorded performance (quantised to its fps grid) against
    the clips it referenced. Returns (frames array, tcs)."""
    q = el.quantise(fps or el.fps or 25.0)
    src = ClipFrameSource(clips_by_uid)
    return render_to_arrays(q, src, sink, batch_size)
