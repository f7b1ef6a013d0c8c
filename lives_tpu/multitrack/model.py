"""Headless multitrack editor model.

Successor of the reference multitrack engine (`src/multitrack.c`, 20k LoC of
which ~15k is GTK UI). The key design fact carries over exactly
(multitrack.h:756-773): a *block* is only a **view** — the event list is the
single source of truth and every edit is an event-list rewrite. Undo is a
bounded ring of serialized event lists (the reference's snapshot model).

The timeline is a frame grid at the event list's fps (the reference
quantises inserted clips to the timeline fps too, via resample.c).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Any, Optional, Sequence

import numpy as np

from ..events.event_list import (EventList, EventType, TICKS_PER_SECOND,
                                 filter_deinit_event, filter_init_event,
                                 filter_map_event, frame_event,
                                 param_change_event)


class Gravity(enum.IntEnum):
    """multitrack.h:101-117 insert gravity modes."""
    NORMAL = 0
    LEFT = 1


@dataclass(frozen=True)
class Block:
    """A contiguous run of one clip on one track — a view, never stored."""
    track: int
    start: int          # timeline frame index
    length: int
    clip: int
    offset: int         # first clip frame used

    @property
    def end(self) -> int:
        return self.start + self.length


class Multitrack:
    def __init__(self, fps: float = 25.0, width: int = 1920,
                 height: int = 1080, n_tracks: int = 2,
                 undo_depth: int = 32):
        self.el = EventList(fps=fps, width=width, height=height)
        self.n_tracks = n_tracks
        self.gravity = Gravity.NORMAL
        # per-track audio volumes (the avol filter model,
        # events.c:2636 add_track_to_avol_init)
        self.track_volumes: dict[int, float] = {}
        self._undo: list[str] = []
        self._redo: list[str] = []
        self._undo_depth = undo_depth

    # -- grid helpers ------------------------------------------------------
    def _tpf(self) -> float:
        return TICKS_PER_SECOND / self.el.fps

    def frame_tc(self, i: int) -> int:
        return int(round(i * self._tpf()))

    def tc_frame(self, tc: int) -> int:
        return int(round(tc / self._tpf()))

    def _frame_event_at(self, i: int):
        tc = self.frame_tc(i)
        for e in self.el.events:
            if e.type == EventType.FRAME and e.tc == tc:
                return e
            if e.tc > tc:
                break
        return None

    def _ensure_frame_event(self, i: int):
        e = self._frame_event_at(i)
        if e is None:
            e = frame_event(self.frame_tc(i), [-1] * self.n_tracks,
                            [0] * self.n_tracks)
            self.el.insert(e)
        # widen track arrays if needed
        while len(e.props["clips"]) < self.n_tracks:
            e.props["clips"].append(-1)
            e.props["frames"].append(0)
        return e

    @property
    def n_frames(self) -> int:
        evs = self.el.frame_events()
        return self.tc_frame(evs[-1].tc) + 1 if evs else 0

    # -- undo (bounded event-list snapshots) -------------------------------
    def _checkpoint(self):
        self._undo.append(self.el.to_json())
        if len(self._undo) > self._undo_depth:
            self._undo.pop(0)
        self._redo.clear()

    def undo(self) -> bool:
        if not self._undo:
            return False
        self._redo.append(self.el.to_json())
        self.el = EventList.from_json(self._undo.pop())
        return True

    def redo(self) -> bool:
        if not self._redo:
            return False
        self._undo.append(self.el.to_json())
        self.el = EventList.from_json(self._redo.pop())
        return True

    # -- track ops ---------------------------------------------------------
    def add_track(self) -> int:
        self.n_tracks += 1
        return self.n_tracks - 1

    # -- block ops (all are event-list rewrites) ---------------------------
    def insert_block(self, track: int, clip: int, start: int, length: int,
                     offset: int = 0) -> Block:
        """Place clip frames on a track (in_block insertion,
        multitrack.c insert handlers)."""
        self._checkpoint()
        if self.gravity == Gravity.LEFT:
            blocks = [b for b in self.blocks(track) if b.end <= start]
            start = blocks[-1].end if blocks else 0
        for k in range(length):
            e = self._ensure_frame_event(start + k)
            e.props["clips"][track] = clip
            e.props["frames"][track] = offset + k
        return Block(track, start, length, clip, offset)

    def delete_block(self, block: Block):
        self._checkpoint()
        for k in range(block.start, block.end):
            e = self._frame_event_at(k)
            if e is not None and block.track < len(e.props["clips"]):
                e.props["clips"][block.track] = -1
                e.props["frames"][block.track] = 0
        self._prune_empty()

    def move_block(self, block: Block, new_track: int,
                   new_start: int) -> Block:
        self._checkpoint()
        saved = self._undo.pop()  # merge both rewrites into one undo step
        self.delete_block(block)
        self._undo.pop()
        nb = self.insert_block(new_track, block.clip, new_start,
                               block.length, block.offset)
        self._undo[-1] = saved
        return nb

    def split_block(self, block: Block, at: int) -> tuple[Block, Block]:
        """Split at timeline frame `at` (inside the block)."""
        a = Block(block.track, block.start, at - block.start, block.clip,
                  block.offset)
        b = Block(block.track, at, block.end - at, block.clip,
                  block.offset + (at - block.start))
        return a, b

    def _prune_empty(self):
        drop = [e for e in self.el.events
                if e.type == EventType.FRAME
                and all(c < 0 for c in e.props["clips"])]
        for e in drop:
            # keep grid continuity inside the timeline: only prune tail
            pass
        # only trailing empties are removed (timeline keeps inner gaps)
        evs = self.el.frame_events()
        while evs and all(c < 0 for c in evs[-1].props["clips"]):
            self.el.remove(evs[-1])
            evs.pop()

    def blocks(self, track: int) -> list[Block]:
        """Derive block views by scanning the event list."""
        out: list[Block] = []
        cur: Optional[list] = None  # [start, clip, offset, len]
        for e in self.el.frame_events():
            i = self.tc_frame(e.tc)
            clips = e.props["clips"]
            c = clips[track] if track < len(clips) else -1
            f = e.props["frames"][track] if track < len(clips) else 0
            if cur is not None:
                contiguous = (i == cur[0] + cur[3]
                              and c == cur[1] and f == cur[2] + cur[3])
                if contiguous:
                    cur[3] += 1
                    continue
                out.append(Block(track, cur[0], cur[3], cur[1], cur[2]))
                cur = None
            if c >= 0:
                cur = [i, c, f, 1]
        if cur is not None:
            out.append(Block(track, cur[0], cur[3], cur[1], cur[2]))
        return out

    # -- effects -----------------------------------------------------------
    def add_effect(self, filter_name: str, tracks: Sequence[int],
                   start: int, length: int,
                   values: dict | None = None) -> str:
        """Attach an effect over [start, start+length) (per-block/region fx,
        multitrack fx model). Returns the init event id."""
        self._checkpoint()
        tc0 = self.frame_tc(start)
        tc1 = self.frame_tc(start + length)
        init = filter_init_event(tc0, filter_name, in_tracks=list(tracks),
                                 out_tracks=[tracks[0]],
                                 values=dict(values or {}))
        self.el.insert(init)
        self.el.insert(filter_deinit_event(tc1, init.event_id))
        self._rebuild_filter_maps()
        return init.event_id

    def remove_effect(self, init_id: str):
        self._checkpoint()
        drop = [e for e in self.el.events
                if (e.type in (EventType.FILTER_INIT,)
                    and e.event_id == init_id)
                or (e.type in (EventType.FILTER_DEINIT,
                               EventType.PARAM_CHANGE)
                    and e.props.get("init_event") == init_id)]
        for e in drop:
            self.el.remove(e)
        self._rebuild_filter_maps()

    def set_keyframe(self, init_id: str, frame: int, param: str, value):
        """Keyframed param (pchain entry)."""
        self._checkpoint()
        self.el.insert(param_change_event(self.frame_tc(frame), init_id,
                                          param, value))

    def _rebuild_filter_maps(self):
        """Regenerate FILTER_MAP events at every init/deinit boundary
        (reference filter-map maintenance, events.c:1014-1753)."""
        for e in [e for e in self.el.events
                  if e.type == EventType.FILTER_MAP]:
            self.el.remove(e)
        bounds = sorted({e.tc for e in self.el.events
                         if e.type in (EventType.FILTER_INIT,
                                       EventType.FILTER_DEINIT)})
        for tc in bounds:
            active = self.el.active_inits_at(tc)
            self.el.insert(filter_map_event(
                tc, [i.event_id for i in active]))

    # -- render ------------------------------------------------------------
    def render(self, source, sink=None, batch_size: int = 32):
        """Render the timeline (render_to_clip path) via the batch
        renderer; returns (frames array, tcs)."""
        from ..events.renderer import render_to_arrays
        from ..graph.nodemodel import SinkSpec
        sink = sink or SinkSpec(width=self.el.width, height=self.el.height)
        return render_to_arrays(self.el, source, sink, batch_size)

    def set_track_volume(self, track: int, vol: float):
        self.track_volumes[track] = float(vol)

    def render_audio(self, clips: dict, arate: int = 44100,
                     channels: int = 2):
        """Mix the timeline's audio with per-track volumes
        (render_audio_segment + avol, audio.c:1686)."""
        from ..audio.engine import render_audio as _render
        return _render(self.el, clips, arate, channels,
                       vols=self.track_volumes or None)

    # -- layout save/load --------------------------------------------------
    def save_layout(self, path: str):
        """JSON (debug container) by default; `.lay`/`.bin` or any
        non-.json suffix writes the reference's binary Weed format
        (events/weed_binary.py) for interop with real LiVES layouts."""
        import pathlib
        p = pathlib.Path(path)
        if p.suffix.lower() == ".json":
            p.write_text(self.el.to_json())
        else:
            from ..events.weed_binary import save_event_list_binary
            with open(p, "wb") as fh:
                save_event_list_binary(self.el, fh)

    @classmethod
    def load_layout(cls, path: str, n_tracks: int | None = None
                    ) -> "Multitrack":
        import pathlib
        raw = pathlib.Path(path).read_bytes()
        if raw[:1] in (b"{", b"["):  # JSON debug container
            el = EventList.from_json(raw.decode())
        else:
            import io as _io
            from ..events.weed_binary import load_event_list_binary
            el = load_event_list_binary(_io.BytesIO(raw))
        mt = cls(fps=el.fps, width=el.width, height=el.height)
        mt.el = el
        mt.n_tracks = n_tracks or max(
            (len(e.props.get("clips", [])) for e in el.events
             if e.type == EventType.FRAME), default=2)
        return mt
