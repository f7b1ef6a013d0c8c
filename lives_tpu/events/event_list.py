"""Event lists: recorded/edited timelines (reference `src/events.c`,
`libweed/weed-events.h:38-44`).

Numeric event-type values and tick resolution match the Weed event ABI so
serialized timelines are semantically interoperable. Events are plain
dataclasses in a list kept sorted by (tc, sort-rank); FRAME events carry
per-track (clip, frame) pairs; FILTER_INIT/DEINIT bracket an effect's
lifetime; FILTER_MAP orders active inits; PARAM_CHANGE events form per-init
"pchains" used for interpolation during rendering (reference
`interpolate_params`, effects-weed.c:10448).
"""

from __future__ import annotations

import bisect
import enum
import json
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterable, Sequence

TICKS_PER_SECOND = 100_000_000  # WEED_TICKS_PER_SECOND


class EventType(enum.IntEnum):
    UNDEFINED = 0
    FRAME = 1
    FILTER_INIT = 2
    FILTER_DEINIT = 3
    FILTER_MAP = 4
    PARAM_CHANGE = 5
    MARKER = 6


# events at equal tc apply in this order (inits/maps precede the frame)
_TYPE_RANK = {EventType.FILTER_INIT: 0, EventType.PARAM_CHANGE: 1,
              EventType.FILTER_MAP: 2, EventType.FRAME: 3,
              EventType.FILTER_DEINIT: 4, EventType.MARKER: 5,
              EventType.UNDEFINED: 6}


@dataclass
class Event:
    tc: int                       # ticks (1e-8 s)
    type: EventType
    props: dict[str, Any] = field(default_factory=dict)
    event_id: str = field(default_factory=lambda: uuid.uuid4().hex[:16])

    @property
    def _rank(self):
        return (self.tc, _TYPE_RANK[self.type])

    # convenience accessors for FRAME events
    @property
    def clips(self) -> list[int]:
        return self.props.get("clips", [])

    @property
    def frames(self) -> list[int]:
        return self.props.get("frames", [])


def frame_event(tc: int, clips: Sequence[int], frames: Sequence[int],
                **props) -> Event:
    return Event(tc, EventType.FRAME,
                 dict(clips=list(clips), frames=list(frames), **props))


def filter_init_event(tc: int, filter_name: str,
                      in_tracks: Sequence[int] = (0,),
                      out_tracks: Sequence[int] = (0,),
                      values: dict | None = None, **props) -> Event:
    return Event(tc, EventType.FILTER_INIT,
                 dict(filter=filter_name, in_tracks=list(in_tracks),
                      out_tracks=list(out_tracks),
                      values=dict(values or {}), **props))


def filter_deinit_event(tc: int, init_event_id: str) -> Event:
    return Event(tc, EventType.FILTER_DEINIT, dict(init_event=init_event_id))


def filter_map_event(tc: int, init_event_ids: Sequence[str]) -> Event:
    return Event(tc, EventType.FILTER_MAP,
                 dict(init_events=list(init_event_ids)))


def param_change_event(tc: int, init_event_id: str, param: str,
                       value: Any) -> Event:
    return Event(tc, EventType.PARAM_CHANGE,
                 dict(init_event=init_event_id, param=param, value=value))


def marker_event(tc: int, **props) -> Event:
    return Event(tc, EventType.MARKER, dict(props))


class EventList:
    """An ordered timeline of events + global header (fps, geometry, audio).

    The single source of truth for recordings and multitrack layouts
    (reference multitrack.h:756-773: blocks are only *views* onto this).
    """

    def __init__(self, fps: float = 25.0, width: int = 0, height: int = 0,
                 audio_rate: int = 44100, audio_channels: int = 2):
        self.fps = fps
        self.width = width
        self.height = height
        self.audio_rate = audio_rate
        self.audio_channels = audio_channels
        self.events: list[Event] = []

    # -- CRUD (reference events.c:246-1151) --------------------------------
    def insert(self, ev: Event) -> Event:
        # fast path: live recording appends in tc order — rebuilding the
        # rank list per insert is O(N) on the player's per-frame path
        if not self.events or ev._rank >= self.events[-1]._rank:
            self.events.append(ev)
            return ev
        keys = [e._rank for e in self.events]
        idx = bisect.bisect_right(keys, ev._rank)
        self.events.insert(idx, ev)
        return ev

    def extend(self, evs: Iterable[Event]):
        for e in evs:
            self.insert(e)

    def remove(self, ev: Event):
        self.events.remove(ev)

    def get(self, event_id: str) -> Event | None:
        for e in self.events:
            if e.event_id == event_id:
                return e
        return None

    def __len__(self):
        return len(self.events)

    def __iter__(self):
        return iter(self.events)

    @property
    def duration_ticks(self) -> int:
        return self.events[-1].tc if self.events else 0

    # -- navigation --------------------------------------------------------
    def frame_events(self) -> list[Event]:
        return [e for e in self.events if e.type == EventType.FRAME]

    def get_frame_event_at(self, tc: int, exact: bool = False) -> Event | None:
        """Last FRAME event at or before tc (reference events.c:792)."""
        best = None
        for e in self.events:
            if e.type != EventType.FRAME:
                continue
            if e.tc == tc:
                return e
            if e.tc > tc:
                break
            best = e
        return None if exact else best

    def active_inits_at(self, tc: int) -> list[Event]:
        """FILTER_INIT events whose [init, deinit) interval covers tc,
        ordered by the most recent FILTER_MAP at or before tc."""
        inits: dict[str, Event] = {}
        order: list[str] | None = None
        for e in self.events:
            if e.tc > tc:
                break
            if e.type == EventType.FILTER_INIT:
                inits[e.event_id] = e
            elif e.type == EventType.FILTER_DEINIT:
                inits.pop(e.props["init_event"], None)
            elif e.type == EventType.FILTER_MAP:
                order = e.props["init_events"]
        if order is not None:
            out = [inits[i] for i in order if i in inits]
            out += [v for k, v in inits.items() if k not in order]
            return out
        return list(inits.values())

    def pchain(self, init_event_id: str, param: str) -> list[Event]:
        """Ordered PARAM_CHANGE events for one (init, param)."""
        return [e for e in self.events
                if e.type == EventType.PARAM_CHANGE
                and e.props["init_event"] == init_event_id
                and e.props["param"] == param]

    def interp_param(self, init: Event, param: str, tc: int):
        """Linear interpolation along the pchain at tc (reference
        interpolate_params). Falls back to the init's stored value."""
        chain = self.pchain(init.event_id, param)
        base = init.props["values"].get(param)
        if not chain:
            return base
        prev_tc, prev_v = init.tc, base
        for e in chain:
            v = e.props["value"]
            if e.tc <= tc:
                prev_tc, prev_v = e.tc, v
                continue
            if prev_v is None:
                return v
            if isinstance(v, (int, float)) and isinstance(prev_v, (int, float)) \
                    and e.tc > prev_tc:
                t = (tc - prev_tc) / (e.tc - prev_tc)
                return prev_v + (v - prev_v) * t
            return prev_v
        return prev_v

    # -- quantisation (reference resample.c:536 quantise_events) -----------
    def quantise(self, new_fps: float) -> "EventList":
        """Re-time FRAME events onto a new_fps grid. Source pick is
        floor/hold-last (the latest source frame at or before each grid
        tc — the reference quantise_events walks the same way); per-frame
        props (audio_clips/audio_seeks from recordings) are preserved."""
        out = EventList(fps=new_fps, width=self.width, height=self.height,
                        audio_rate=self.audio_rate,
                        audio_channels=self.audio_channels)
        tick_per_frame = TICKS_PER_SECOND / new_fps
        frames = self.frame_events()
        others = [e for e in self.events if e.type != EventType.FRAME]
        if frames:
            end_tc = frames[-1].tc
            n_out = int(round(end_tc / tick_per_frame)) + 1
            fi = 0
            for i in range(n_out):
                tc = int(round(i * tick_per_frame))
                while fi + 1 < len(frames) and frames[fi + 1].tc <= tc:
                    fi += 1
                src = frames[fi]
                import copy as _copy
                extra = {k: _copy.deepcopy(v) for k, v in src.props.items()
                         if k not in ("clips", "frames")}
                out.insert(frame_event(tc, src.clips, src.frames, **extra))
        import copy as _copy
        for e in others:
            out.insert(Event(e.tc, e.type, _copy.deepcopy(e.props),
                             e.event_id))
        return out

    # -- serialisation (reference weed_plant_serialise :10969; we use a
    #    versioned JSON container with the same leaf names) ----------------
    def to_json(self) -> str:
        return json.dumps({
            "format": "lives_tpu_event_list",
            "version": 1,
            "weed_event_api_version": 122,
            "fps": self.fps, "width": self.width, "height": self.height,
            "audio_rate": self.audio_rate,
            "audio_channels": self.audio_channels,
            "events": [
                {"tc": e.tc, "type": int(e.type), "event_id": e.event_id,
                 "props": e.props}
                for e in self.events],
        })

    @classmethod
    def from_json(cls, s: str) -> "EventList":
        d = json.loads(s)
        if d.get("format") != "lives_tpu_event_list":
            raise ValueError("not a lives_tpu event list")
        el = cls(fps=d["fps"], width=d["width"], height=d["height"],
                 audio_rate=d["audio_rate"],
                 audio_channels=d["audio_channels"])
        for ed in d["events"]:
            el.events.append(Event(ed["tc"], EventType(ed["type"]),
                                   ed["props"], ed["event_id"]))
        # canonical (tc, rank) order: navigation break-early scans assume
        # it, and external/hand-edited files may group events by type
        el.events.sort(key=lambda e: e._rank)
        return el
