"""Realtime player: clock, frame targeting, trickplay, rte keys, recording.

Successor of `src/player.c` (`process_one` :2185, `calc_new_playback_position`
:1831, `load_frame_image` :918) and the rte key system (`src/effects.c:1251`,
`src/mainwindow.h:223-232`: 64 keys x 32 modes).

Structure: a Player owns foreground/background clip sources, a KeyMap of
toggleable effect instances, and a sink. Each cycle it converts wall-clock
ticks to a target frame (fps may be negative or fractional — trickplay),
pulls source layers, runs the jitted FrameGraph for the current key chain
(rebuilt lazily on key toggles, like rebuild_nodemodel at safe points), and
hands the result to the sink. With `record=True` it logs FRAME / FILTER_INIT
/ FILTER_DEINIT / PARAM_CHANGE events with real timecodes into an EventList
for later batch re-rendering.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Optional, Sequence

import numpy as np

from ..constants import Gamma, Palette
from ..effects.host import Instance, get_filter, instantiate
from ..events.event_list import (EventList, TICKS_PER_SECOND,
                                 filter_deinit_event, filter_init_event,
                                 filter_map_event, frame_event,
                                 param_change_event)
from ..graph.nodemodel import FrameGraph, SinkSpec
from ..layer import Layer, layer_blank
from .sinks import NullSink, Sink

N_KEYS = 64          # prefs::rte_keys_virtual ceiling (mainwindow.h:228)
MODES_PER_KEY = 32   # mainwindow.h:229


class _PrecacheMiss(Exception):
    """A frame the precache worker is decoding was not ready: the
    serving loop drops the frame instead of waiting (player.c getahead
    drop policy)."""


class KeyMap:
    """64 effect keys x up to 32 modes each; a key holds filter names, one
    mode active, toggling a key enables its active mode's instance."""

    def __init__(self):
        self.slots: list[list[str]] = [[] for _ in range(N_KEYS)]
        self.mode: list[int] = [0] * N_KEYS
        self.active: list[bool] = [False] * N_KEYS
        self.instances: list[Optional[Instance]] = [None] * N_KEYS
        # per-(key, mode) param defaults applied on instantiation —
        # the reference's resources/fxdefs.perkey
        self.defaults: dict[tuple[int, int], dict] = {}

    def set_key(self, key: int, mode: int, filter_name: str):
        get_filter(filter_name)  # validate
        slot = self.slots[key]
        while len(slot) <= mode:
            slot.append("")
        slot[mode] = filter_name

    def toggle(self, key: int, on: bool | None = None) -> bool:
        """rte_key_toggle (effects.c:1251). Returns new state."""
        state = (not self.active[key]) if on is None else on
        if state and not self.instances[key]:
            name = self.current_filter(key)
            if not name:
                return False
            dflt = self.defaults.get((key, self.mode[key]), {})
            self.instances[key] = instantiate(name, **dflt)
        self.active[key] = state
        return state

    def next_mode(self, key: int):
        slot = self.slots[key]
        if slot:
            self.mode[key] = (self.mode[key] + 1) % len(slot)
            self.instances[key] = None  # re-instantiate on next enable

    def prev_mode(self, key: int):
        slot = self.slots[key]
        if slot:
            self.mode[key] = (self.mode[key] - 1) % len(slot)
            self.instances[key] = None

    def current_filter(self, key: int) -> str:
        slot = self.slots[key]
        m = self.mode[key]
        return slot[m] if m < len(slot) else ""

    def active_chain(self) -> list[Instance]:
        out = []
        for k in range(N_KEYS):
            if self.active[k] and self.instances[k]:
                out.append(self.instances[k])
        return out

    def chain_key(self):
        # must agree with active_chain() (keys without a materialised
        # instance are NOT in the chain) and must distinguish instance
        # identity: re-instantiation (mode change / new defaults) makes a
        # new graph — the compiled template is still shared via the
        # process-wide cache, only the cheap wrapper rebuilds
        return tuple((k, self.current_filter(k), id(self.instances[k]))
                     for k in range(N_KEYS)
                     if self.active[k] and self.instances[k])

    #: substrings of reference Weed hashnames -> our filter names, used when
    #: importing a reference default.keymap
    REF_FILTER_MAP = {
        "rotozoom": "rotozoom", "lifetv": "life", "firetv": "fire",
        "blurzoom": "blurzoom", "mirror": "mirror", "kaleidoscope":
        "kaleidoscope", "rippletv": "ripple", "warptv": "warptv",
        "negat": "negate", "posterise": "posterize", "posterize":
        "posterize", "blur": "gaussian_blur", "vertigo": "vertigo",
        "edge": "edge", "rgbdelay": "rgb_delay", "noise":
        "noise", "plasma": "plasma", "bump2d": "bump2d", "bump": "lens",
        "onedtv": "onedtv",
        "nervous": "nervous", "textfun": "textfun", "colorkey":
        "chroma_key",
        # simple_blend.c modes
        "negative luma overlay": "luma_key", "luma overlay": "luma_key",
        "chroma blend": "crossfade", "simple_blend": "crossfade",
        # multi_blends.c modes (ours share the names)
        "blend_screen": "blend_screen", "blend_overlay": "blend_overlay",
        "blend_lighten": "blend_lighten", "blend_darken": "blend_darken",
        "blend_dodge": "blend_dodge", "blend_burn": "blend_burn",
        "blend_add": "blend_add", "blend_subtract": "blend_subtract",
        "blend_multiply": "blend_multiply",
        "blend_difference": "blend_difference",
        # other plugin families
        "slide_over": "slide_over", "tvpic": "tvpic",
        "puretext": "livetext", "scribbler": "scribbler",
        "videowall": "videowall", "compositor": "compositor",
        # weed-builder scripts (weed-plugins/scripts/)
        "ccorrect": "colour_balance", "alien_overlay": "alien_overlay",
        "targeted_zoom": "targeted_zoom", "revtv": "revtv",
        "pan_and_zoom": "targeted_zoom", "comic": "comic",
    }

    def load_reference_keymap(self, path) -> int:
        """Import a reference `default.keymap` (lines `key|WeedHashname`),
        mapping known plugin hashnames onto our filters. Returns mapped
        count; unknown filters are skipped."""
        from ..effects.host import list_filters
        have = set(list_filters())
        n = 0
        for line in open(path, errors="replace"):
            line = line.strip()
            if "|" not in line or not line[0].isdigit():
                continue
            key_s, hashname = line.split("|", 1)
            key = int(key_s) - 1
            if not 0 <= key < N_KEYS:
                continue
            h = hashname.lower()
            for frag, ours in self.REF_FILTER_MAP.items():
                if frag in h and ours in have:
                    self.set_key(key, len(self.slots[key]), ours)
                    n += 1
                    break
        return n

    # -- persistence (reference default.keymap / rte_window save) ----------
    def save(self, path):
        import json
        data = [{"key": k, "modes": [m for m in self.slots[k] if m]}
                for k in range(N_KEYS) if any(self.slots[k])]
        dflts = [{"key": k, "mode": m, "values": v}
                 for (k, m), v in sorted(self.defaults.items()) if v]
        with open(path, "w") as fh:
            json.dump({"format": "lives_tpu_keymap", "version": 2,
                       "keys": data, "defaults": dflts}, fh, indent=1)

    def load(self, path):
        import json
        with open(path) as fh:
            d = json.load(fh)
        if d.get("format") != "lives_tpu_keymap":
            raise ValueError("not a keymap file")
        self.__init__()
        for entry in d["keys"]:
            for m, name in enumerate(entry["modes"]):
                self.set_key(entry["key"], m, name)
        for entry in d.get("defaults", []):
            self.defaults[(entry["key"], entry["mode"])] = entry["values"]

    def set_key_defaults(self, key: int, mode: int, **values):
        """Persistable per-key/mode param defaults (fxdefs.perkey)."""
        get_filter(self.slots[key][mode])  # validate the slot exists
        self.defaults[(key, mode)] = dict(values)
        if self.mode[key] == mode:
            self.instances[key] = None  # re-instantiate with new defaults


@dataclass
class PlayerState:
    playing: bool = False
    fg_clip: Any = None          # object with get_frame(n)/frames/fps
    bg_clip: Any = None
    pb_fps: float = 25.0         # may be negative (reverse) / scaled
    bg_pb_fps: float = 0.0       # bg clip rate; 0 = follow pb_fps
    frame: int = 0               # current frame (0-based)
    loop: bool = True
    ping_pong: bool = False
    blend_amount: float = 0.5    # fg/bg mix (blend factor, effects-weed.c:8815)
    sel_start: int = 0
    sel_end: int = -1            # -1 = clip end
    nervous: bool = False        # random-walk trickplay (player.c:1013)


class Player:
    def __init__(self, sink: Sink | None = None,
                 sink_spec: SinkSpec | None = None, fps: float = 25.0):
        self.sink = sink or NullSink()
        self.sink_spec = sink_spec or SinkSpec()
        self.state = PlayerState(pb_fps=fps)
        self.keymap = KeyMap()
        self._graphs: dict[Any, FrameGraph] = {}
        self._clock0: float | None = None
        self._frame0: float = 0.0
        self.record = False
        self.event_list: EventList | None = None
        self._nervous_rng = np.random.default_rng()
        self._rec_inits: dict[int, Any] = {}
        self._scrap_generators = False
        self._scrap_recs: dict[int, Any] = {}
        self.rec_scrap_clips: dict[int, Any] = {}
        self.last_recording: EventList | None = None
        # stats ladder (diagnostics.c:97 get_inst_fps)
        self.frames_shown = 0
        self.frames_dropped = 0
        self._frame_times: list[float] = []
        # pipelined sink: keep up to N frames in flight before the sink
        # consumes them (hides device->host round-trip; 0 = synchronous)
        self.pipeline_depth = 0
        self._pending: list[tuple[Any, float]] = []
        # batched display fetch: pop the pipeline in groups of K frames,
        # stack them device-side in one jitted op and fetch the stack in
        # ONE host transfer, then hand host-backed Layers to the sink.
        # On a remote attachment every device->host fetch costs a full
        # RPC round trip (~30-40 ms on this tunnel) regardless of size;
        # amortising it over K frames is what takes the live loop past
        # the per-frame RPC ceiling (reference analogue: the display
        # plugin consuming frames from the player's queue at its own
        # cadence, videoplugin.h:145). 0 = fetch per frame.
        self.fetch_batch = 0
        self._fetch_fns: dict[Any, Any] = {}
        # async chain rebuild: new key chains compile in the background
        # while the previous graph keeps serving frames (the reference
        # rebuilds the nodemodel at safe points, player.c:2655). Default
        # ON: a mid-performance template compile is the single worst
        # live-path stall (30 s-minutes through a remote attachment)
        self.async_compile = True
        # pre-build templates for one-toggle-away configs at safe points
        # (the reference pre-builds nodemodels, player.c:2655) so a key
        # toggle usually swaps to an already-compiled graph instantly
        self.prewarm_compile = True
        self._prewarm_seen: set = set()
        self._last_layers: list = []
        self._served_key: Any = None
        # per-frame latency ladder (layers.h:78-85 status timestamps +
        # diagnostics.c:97): attach a diagnostics.FrameLadder to collect
        # queued->loaded->applied->displayed stage times per frame
        self.ladder = None
        self._compile_thread = None
        self._compile_key: Any = None      # chain key compiling right now
        self._compile_adopt = False        # adopt-on-finish flag (upgradable)
        # predictive frame cache (pred_frame/precache, player.c:2185-2230)
        self.precache_depth = 0
        self._precache: dict[tuple, Any] = {}
        import threading as _th
        self._pc_cv = _th.Condition()
        self._pc_stop = False
        self._inflight: set = set()
        # realtime policy on a precache miss whose frame the worker is
        # already decoding: drop the frame (never block the serving loop
        # on a synchronous decode — the reference's getahead/pred_frame
        # drop-never-wait behaviour). First frame always renders.
        self.drop_on_miss = True
        # frames per batched look-ahead dispatch: each dispatch pays a
        # full tunnel RPC (~37 ms here), so bigger chunks lift the
        # decode ceiling (2-frame chunks cap at ~38 fps; 8-frame at ~80).
        # Fixed sizes {4, chunk} only — every distinct batch size jits
        # its own device template
        self.precache_chunk = 8
        # adaptive quality under load (reference "effort", prefs->pbq_adaptive)
        self.adaptive_quality = False
        self.effort = 0
        self._lbox_wanted: bool | None = None  # user's letterbox intent
        # clock source: "system" (monotonic) or "audio" (the audio
        # feeder's clip position — reference soundcard time source)
        self.time_source = "system"
        # external transport glue (audio/jack.py JackTransport): master
        # mode mirrors start/stop/seek onto the JACK transport
        self.transport = None
        self._precache_thread = None
        self._precache_req: list = []
        # optional realtime audio feeder (audio/fx.AudioPlayer), attached by
        # attach_audio(); OSC /audio namespace controls it
        self.audio = None
        # optional data connections (effects/data.py): audio-analyser /
        # out-param values pushed into active instances each frame
        # (pconx_chain_data before each instance runs, effects-weed.c:3322)
        self.datacons = None
        # frame listeners: called (frame, tc) after each shown frame —
        # the OSC server wires FRAME_SYNCH notifications here
        # (reference lives_notify, player.c:1295)
        self.frame_listeners: list = []
        # optional subtitle overlay (text.SubtitleOverlay) composited
        # after the chain, before the sink (reference subtitle path)
        self.subtitles = None

    def attach_audio(self, sink=None, rate: int = 44100):
        """Attach the realtime audio feeder (pull-model, velocity-matched)."""
        from ..audio.fx import AudioPlayer
        self.audio = AudioPlayer(self, sink, rate=rate)
        return self.audio

    def load_subtitles(self, path, **style):
        """Attach .srt/.sub subtitles composited during playback
        (reference reload_subs, clip_load_save.c:1752)."""
        from ..text import SubtitleOverlay, load_srt, load_sub
        subs = load_srt(path) if str(path).lower().endswith(".srt") \
            else load_sub(path, fps=abs(self.state.pb_fps) or 25.0)
        self.subtitles = SubtitleOverlay(subs, **style)
        return self.subtitles

    # -- clock / frame targeting ------------------------------------------
    def _now_ticks(self) -> int:
        return int(time.monotonic() * TICKS_PER_SECOND)

    def set_pb_fps(self, fps: float):
        """Trickplay: rebase the clock so scratching is continuous
        (player.c calc_new_playback_position semantics)."""
        self._rebase()
        self.state.pb_fps = fps

    def _rebase(self):
        if self._clock0 is not None:
            self._frame0 = self._target_frame_f()
            self._clock0 = time.monotonic()

    def _target_frame_f(self) -> float:
        # soundcard time source (reference time_source=soundcard,
        # player.c): the audio feeder's clip position IS the clock, so
        # video can never drift from audio
        if self.time_source == "audio" and self.audio is not None \
                and getattr(self.audio, "_data", None) is not None:
            st = self.state
            base = getattr(st.fg_clip, "fps", 25.0) or 25.0
            return self.audio._pos / self.audio._src_rate * base
        if callable(self.time_source):
            # external transport clock (jack transport slave,
            # src/jack.c transport model): seconds -> clip frames at the
            # clip's base rate; trickplay rate is the transport's business
            st = self.state
            base = getattr(st.fg_clip, "fps", 25.0) or 25.0
            return float(self.time_source()) * base
        if self._clock0 is None:
            return float(self.state.frame)
        dt = time.monotonic() - self._clock0
        return self._frame0 + dt * self.state.pb_fps

    def clamp_frame(self, f: float) -> int:
        """Loop/ping-pong/selection bounds (player.c:1678 clamp_frame)."""
        st = self.state
        clip = st.fg_clip
        n = clip.frames if clip is not None else 1
        lo = st.sel_start
        hi = st.sel_end if st.sel_end >= 0 else n - 1
        span = max(hi - lo + 1, 1)
        import math
        if st.ping_pong:
            m = math.floor(f - lo) % (2 * span)
            return lo + (m if m < span else 2 * span - 1 - m)
        if st.loop:
            return lo + math.floor(f - lo) % span
        return max(lo, min(math.floor(f), hi))

    # -- clip switching + autotransition (player.c:1001 set_trans_amt,
    #    prefs->autotrans_key/mode/amt) ------------------------------------
    def set_autotrans(self, key: int | None, duration: float = 1.0):
        """Configure automatic transitions on clip switch: `key` is an
        rte key holding a 2-input transition; switching the fg clip
        during playback puts the old clip on the bg track and ramps the
        blend from old to new over `duration` seconds."""
        self.autotrans_key = key
        self.autotrans_duration = max(float(duration), 1e-3)

    def switch_fg(self, clip):
        """Switch the foreground clip (the OSC /clip/select path). With
        autotransition configured and playback running, the switch rides
        a timed crossfade instead of a hard cut."""
        st = self.state
        old = st.fg_clip
        key = getattr(self, "autotrans_key", None)
        if key is None or not st.playing or old is None or old is clip:
            st.fg_clip = clip
            return
        st.bg_clip = old
        st.fg_clip = clip
        # crossfade amount weights the FG input: 0 = all old (bg track),
        # ramping to 1 = all new
        st.blend_amount = 0.0
        self._autotrans_t0 = time.monotonic()
        if not self.keymap.active[key]:
            self.key_toggle(key, True)
        if self.audio is not None and (
                hasattr(clip, "read_audio")
                or getattr(clip, "audio_source", None) is not None):
            self.audio.load_clip_audio(clip)

    def _autotrans_step(self):
        t0 = getattr(self, "_autotrans_t0", None)
        if t0 is None:
            return
        dur = getattr(self, "autotrans_duration", 1.0)
        amt = min((time.monotonic() - t0) / dur, 1.0)
        self.state.blend_amount = amt
        if amt >= 1.0:
            # transition complete: release the bg track + key
            self._autotrans_t0 = None
            key = getattr(self, "autotrans_key", None)
            if key is not None and self.keymap.active[key]:
                self.key_toggle(key, False)
            self.state.bg_clip = None
            self.state.blend_amount = 0.5

    # -- rte keys ----------------------------------------------------------
    def key_toggle(self, key: int, on: bool | None = None):
        was = self.keymap.active[key]
        state = self.keymap.toggle(key, on)
        if state == was:
            return state  # idempotent enable/disable: nothing to record
        el = self.event_list   # snapshot vs record_stop on another thread
        if self.record and el is not None:
            tc = self._rec_tc()
            if state:
                inst = self.keymap.instances[key]
                init = filter_init_event(
                    tc, inst.filter.name,
                    in_tracks=list(inst.in_tracks),
                    out_tracks=list(inst.out_tracks),
                    values=dict(inst.values))
                el.insert(init)
                self._rec_inits[key] = init
                self._refresh_rec_map(tc, el)
            else:
                init = self._rec_inits.pop(key, None)
                if init is not None:
                    el.insert(
                        filter_deinit_event(tc, init.event_id))
                    self._refresh_rec_map(tc, el)
        return state

    def set_key_param(self, key: int, name: str, value):
        inst = self.keymap.instances[key]
        if inst is None:
            return
        inst.set(**{name: value})
        el = self.event_list   # snapshot vs record_stop on another thread
        if self.record and el is not None and key in self._rec_inits:
            el.insert(param_change_event(
                self._rec_tc(), self._rec_inits[key].event_id, name, value))

    def _refresh_rec_map(self, tc: int, el=None):
        el = el if el is not None else self.event_list
        if el is None:
            return
        ids = [i.event_id for i in self._rec_inits.values()]
        automix = getattr(self, "_rec_automix", None)
        if automix is not None:
            ids.append(automix.event_id)
        el.insert(filter_map_event(tc, ids))
        self._annotate_rec_cconx()

    def _annotate_rec_cconx(self):
        """Stamp channel-connection wiring onto recorded init events so a
        re-render rebuilds the same in-template cconx (the reference keeps
        datacons as global state a render re-applies, effects-data.c:2295
        get_new_inst_for_keymode under is_rendering). Connection edits are
        not timestamped — like the reference's datacons.map, the wiring is
        per-performance state, re-annotated at each map refresh."""
        if self.datacons is None or self.event_list is None:
            return
        by_inst = {}
        for k, init in self._rec_inits.items():
            inst = self.keymap.instances[k]
            if inst is not None:
                by_inst[id(inst)] = init
        for init in self._rec_inits.values():
            init.props.pop("cconx", None)
        for c in getattr(self.datacons, "chan_conns", ()):
            src_init = by_inst.get(id(c.src))
            dst_init = by_inst.get(id(c.dst))
            if src_init is None or dst_init is None:
                continue
            dst_init.props.setdefault("cconx", []).append(
                [src_init.event_id, c.out_channel, c.in_slot])

    # -- recording ---------------------------------------------------------
    def record_start(self, width: int = 0, height: int = 0,
                     backup_path=None, backup_every: float = 5.0,
                     scrap_generators: bool = True):
        """backup_path: autosave the recording there periodically so a crash
        never loses a performance (reference backup_recording,
        events.c:5547 + deal_with_render_choice(is_recovery)).
        scrap_generators: capture live-source (generator) output to MJPEG
        scrap clips so re-renders replay the performance exactly
        (reference scrap-file role); recorded FRAME events then reference
        the scrap clip. rec_scrap_clips after record_stop maps their
        unique_ids to clips — merge it into the clips_by_uid you hand to
        render_recording."""
        if self.record:
            # restarting mid-take must not leak the old take's encode
            # workers or silently drop its events: finish it properly
            self.record_stop()
        for clip in self.rec_scrap_clips.values():
            if hasattr(clip, "close"):
                clip.close()   # release native decoder resources
        self._scrap_generators = scrap_generators
        self._scrap_recs = {}
        self.rec_scrap_clips = {}
        self.event_list = EventList(fps=abs(self.state.pb_fps) or 25.0,
                                    width=width, height=height)
        self._rec_gen = getattr(self, "_rec_gen", 0) + 1
        self.record = True
        self._rec_t0 = self._now_ticks()
        self._rec_backup_path = backup_path
        self._rec_backup_every = backup_every
        self._rec_last_backup = time.monotonic()
        self._backup_count = 0
        if backup_path:
            # fresh JSONL autosave: header line now, events append
            # incrementally (O(new events) per interval)
            import threading
            if not hasattr(self, "_backup_lock"):
                self._backup_lock = threading.Lock()
            try:
                with self._backup_lock, open(backup_path, "w") as fh:
                    fh.write(self.event_list.header_json() + "\n")
            except OSError:
                self._rec_backup_path = None
        # effects already live at record start must appear in the
        # re-render: snapshot the active chain as tc=0 inits + filter map
        # (the reference records from the current rte state too)
        for k in range(N_KEYS):
            if self.keymap.active[k] and self.keymap.instances[k]:
                inst = self.keymap.instances[k]
                init = filter_init_event(
                    0, inst.filter.name,
                    in_tracks=list(inst.in_tracks),
                    out_tracks=list(inst.out_tracks),
                    values={kk: v for kk, v in inst.values.items()
                            if not hasattr(v, "shape")})
                self.event_list.insert(init)
                self._rec_inits[k] = init
        if self._rec_inits:
            self._refresh_rec_map(0)

    def record_stop(self) -> EventList:
        self._annotate_rec_cconx()  # final wiring snapshot
        self.record = False
        self._rec_gen = getattr(self, "_rec_gen", 0) + 1
        el, self.event_list = self.event_list, None
        self._rec_inits.clear()
        self._rec_automix = None
        self._rec_automix_amt = None
        # finalize generator scrap captures into MJPEG clips keyed by
        # the unique_ids the recorded FRAME events reference
        for rec in getattr(self, "_scrap_recs", {}).values():
            # scrap clips land under the workdir (prefs workdir/scrap,
            # like the reference scrap file lives in the working dir) so
            # a saved recording's scrap references outlive the session;
            # fall back to a temp dir when no workdir is configured
            from ..prefs import pref
            base = getattr(self, "scrap_dir", None) or pref("workdir")
            if not base:
                import tempfile
                base = tempfile.mkdtemp(prefix="lives_tpu_scrap_")
            try:
                clip = rec.finalize(
                    Path(base) / "scrap"
                    / (f"scrap_{rec.unique_id:016x}_"
                       f"{int(time.monotonic() * 1000) & 0xFFFFFF:06x}"
                       ".avi"))  # full uid in the name (recovery keys
                # on it); take suffix: never overwrite a file an earlier
                # take's open clip still reads
            except Exception:
                clip = None
            if clip is not None:
                self.rec_scrap_clips[rec.unique_id] = clip
            # encode worker died / finalize failed: FRAME events already
            # reference scrap indices that never materialised — rewrite
            # them back to the live-source reference captured at record
            # time (degrades to approximate replay, never blank frames)
            n_ok = clip.frames if clip is not None else 0
            if el is not None:
                self._rewrite_scrap_refs(el, rec, n_ok)
        self._scrap_recs = {}
        if el is not None:
            # kept for the render-choice surface (api/OSC /record/render)
            # — the reference offers to render after recording stops
            # (deal_with_render_choice, events.c:5101). A stray second
            # stop (el None) must not clobber the saved take.
            self.last_recording = el
            if getattr(self, "_rec_backup_path", None):
                # final autosave with the now-durable scrap references:
                # the take survives a crash between stop and render
                # (deal_with_render_choice(is_recovery)). The render
                # surface removes the file once the take is rendered;
                # discard_recording() drops an unwanted take.
                import threading
                if not hasattr(self, "_backup_lock"):
                    self._backup_lock = threading.Lock()
                try:
                    with self._backup_lock:
                        self._atomic_write(self._rec_backup_path,
                                           el.to_json())
                except OSError:
                    pass
        return el

    @staticmethod
    def _rewrite_scrap_refs(el: EventList, rec, n_ok: int) -> None:
        """Point FRAME events referencing scrap indices >= n_ok back at
        the live-source (clip, frame) captured at record time."""
        if n_ok >= len(rec.origs):
            return
        for e in el:
            cl = getattr(e, "clips", None)
            if not cl:
                continue
            for i, (c, f) in enumerate(zip(cl, e.frames)):
                if c == rec.unique_id and f >= n_ok:
                    e.clips[i], e.frames[i] = rec.origs[f]

    # -- render-choice helpers (shared by api.py and the OSC surface) ------
    def recording_uid_map(self, clips=()) -> dict:
        """clips_by_uid for re-rendering the last take: the given clips,
        the live fg/bg sources (scrap-overflow fallback), and the take's
        scrap clips."""
        uid_map = {}
        for clip in clips:
            uid_map[getattr(clip, "unique_id", id(clip))] = clip
        for st_clip, dflt in ((self.state.fg_clip, 1),
                              (self.state.bg_clip, 2)):
            # fallback uids MUST match what the recording path wrote
            # (frame_event clips: fg getattr default 1, bg default 2)
            if st_clip is not None:
                uid_map.setdefault(getattr(st_clip, "unique_id", dflt),
                                   st_clip)
        uid_map.update(self.rec_scrap_clips)
        return uid_map

    def render_last_recording(self, uid_map: dict, batch_size: int = 8):
        """Render the last take against `uid_map`. Returns (frames, tcs)
        with frames a HOST (N,3,H,W) u8 array — write them to clips as
        host arrays (uploading per frame just to fetch them back costs
        one RPC each through the tunnel)."""
        from ..events.renderer import render_recording as _render
        el = self.last_recording
        if el is None or not len(el.events):
            return None, None
        return _render(el, uid_map, batch_size=batch_size)

    def render_last_recording_batches(self, uid_map: dict,
                                      batch_size: int = 8):
        """Yield (tcs, host (B,3,H,W) u8) chunks of the last take —
        bounded memory: an hour-long 1080p take materialised as ONE
        array is ~500 GB. Callers write each chunk to its destination
        clip as it lands."""
        from ..events.renderer import ClipFrameSource, render_events
        el = self.last_recording
        if el is None or not len(el.events):
            return
        q = el.quantise(el.fps or 25.0)
        src = ClipFrameSource(uid_map)
        for tcs, lay in render_events(q, src, batch_size=batch_size):
            yield tcs, np.asarray(lay.planes[0])

    def preview_last_recording(self, uid_map: dict,
                               max_seconds: float | None = None,
                               batch_size: int = 8) -> int:
        """Paced playback of the last take through this player's sink —
        the render-choice "preview" arm (deal_with_render_choice,
        events.c:5955 / process_events events.c:3236). Refuses while
        playback runs: sinks are not thread-safe against the serving
        loop. Returns frames shown."""
        from ..events.event_list import TICKS_PER_SECOND
        from ..events.renderer import ClipFrameSource, render_events
        if self.state.playing:
            raise RuntimeError("stop playback before previewing a take")
        el = self.last_recording
        if el is None or not len(el.events):
            return 0
        fps = el.fps or 25.0
        q = el.quantise(fps)
        src = ClipFrameSource(uid_map)
        shown = 0
        t0 = time.monotonic()
        inited = False
        try:
            for tcs, lay in render_events(q, src, batch_size=batch_size):
                arr = np.asarray(lay.planes[0])
                if not inited:
                    # the serving loop's stop() tore the sink down
                    # (exit_screen): previews run their own lifecycle
                    self.sink.init_screen(arr.shape[-1], arr.shape[-2],
                                          fps)
                    inited = True
                for i, tc in enumerate(tcs):
                    delay = t0 + shown / fps - time.monotonic()
                    if delay > 0:
                        time.sleep(delay)
                    self.sink.play_frame(
                        Layer(planes=(arr[i],),
                              palette=int(Palette.RGB24)),
                        float(tc) / TICKS_PER_SECOND)  # seconds, like
                    shown += 1                         # the live loop
                    if max_seconds is not None and \
                            time.monotonic() - t0 >= max_seconds:
                        return shown
            return shown
        finally:
            if inited:
                self.sink.exit_screen()

    def _record_automix(self, active: bool):
        """Record the fg/bg auto-blend as a crossfade init + amount
        pchain — without this, a performance's bg blending (blend factor
        scratching, autotransitions) silently vanished from re-renders
        (the reference records the blend through its recorded filter
        maps)."""
        el = self.event_list
        amt = float(self.state.blend_amount)
        if active:
            init = getattr(self, "_rec_automix", None)
            if init is None:
                init = filter_init_event(
                    self._rec_tc(), "crossfade", in_tracks=[0, 1],
                    out_tracks=[0], values={"amount": amt})
                el.insert(init)
                self._rec_automix = init
                self._rec_automix_amt = amt
                self._refresh_rec_map(init.tc)
            elif amt != self._rec_automix_amt:
                el.insert(param_change_event(self._rec_tc(),
                                             init.event_id, "amount",
                                             amt))
                self._rec_automix_amt = amt
        else:
            init = getattr(self, "_rec_automix", None)
            if init is not None:
                el.insert(filter_deinit_event(self._rec_tc(),
                                              init.event_id))
                self._rec_automix = None
                self._refresh_rec_map(self._rec_tc())

    def _rec_tc(self) -> int:
        return self._now_ticks() - self._rec_t0

    def _append_backup(self, el: EventList) -> None:
        """Append events recorded since the last backup to the JSONL
        autosave, substituting live-source references for scrap indices
        that are not durable yet (a crash mid-take replays from
        sources). O(new events); runs on the serving thread."""
        path = self._rec_backup_path
        if path is None or el is None:
            return
        n = len(el.events)
        start = getattr(self, "_backup_count", 0)
        if start > n:
            start = 0   # list was rebuilt: fall back to a full rewrite
        recs = {rec.unique_id: rec for rec in self._scrap_recs.values()}
        lines = []
        for e in el.events[start:n]:
            cl = getattr(e, "clips", None)
            if cl and recs:
                sub = list(cl)
                frs = list(e.frames)
                changed = False
                for i, (c, f) in enumerate(zip(sub, frs)):
                    rec = recs.get(c)
                    if rec is not None and f < len(rec.origs):
                        sub[i], frs[i] = rec.origs[f]
                        changed = True
                if changed:
                    import copy as _copy
                    e = _copy.copy(e)
                    e.props = dict(e.props)
                    e.props["clips"] = sub
                    e.props["frames"] = frs
            lines.append(EventList.event_json(e))
        if not lines:
            self._backup_count = n
            return
        try:
            mode = "a" if start else "w"
            with self._backup_lock, open(path, mode) as fh:
                if mode == "w":
                    fh.write(el.header_json() + "\n")
                fh.write("\n".join(lines) + "\n")
                fh.flush()
            self._backup_count = n
        except OSError:
            pass

    @staticmethod
    def _atomic_write(path, text: str) -> None:
        """tmp + os.replace: a crash mid-write must never destroy the
        previous good autosave (the exact window the file exists for)."""
        import os
        tmp = str(path) + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, str(path))

    def discard_recording(self) -> bool:
        """Drop the last take, its autosave, and its scrap clips — the
        "discard" arm of the render choice (deal_with_render_choice,
        events.c:5955). Returns True when something was discarded."""
        import os
        import threading
        had = self.last_recording is not None
        self.last_recording = None
        for clip in self.rec_scrap_clips.values():
            # a discarded take's scrap capture is dead weight: close the
            # decoder and remove the AVI (the reference recycles the
            # scrap file the same way)
            src = getattr(clip, "source_uri", "") or getattr(
                getattr(clip, "cdata", None), "uri", "")
            if hasattr(clip, "close"):
                clip.close()
            if src:
                try:
                    os.unlink(src)
                except OSError:
                    pass
            had = True
        self.rec_scrap_clips = {}
        path = getattr(self, "_rec_backup_path", None)
        if path:
            if not hasattr(self, "_backup_lock"):
                self._backup_lock = threading.Lock()
            with self._backup_lock:
                try:
                    os.unlink(path)
                    had = True
                except OSError:
                    pass
        return had

    # -- playback ----------------------------------------------------------
    def start(self):
        self.state.playing = True
        self._clock0 = time.monotonic()
        self._frame0 = float(self.state.frame)
        clip = self.state.fg_clip
        if clip is not None:
            w = self.sink_spec.width or clip.width
            h = self.sink_spec.height or clip.height
            self.sink.init_screen(w, h, abs(self.state.pb_fps))
            if getattr(self.sink, "fetches_frames", True):
                # Prewarm the device->host transfer path: the FIRST
                # fetch in a process compiles a transfer program through
                # the attachment (~20 s measured; ~0.1 s per further
                # shape). Pay it here, not on frame 1 of the serving
                # loop (same philosophy as safe-point template prewarm).
                try:
                    blank = layer_blank(w, h, int(self.sink_spec.palette))
                    for p in blank.planes:
                        np.asarray(p)
                except Exception:
                    pass
            if self.audio is not None and (
                    hasattr(clip, "read_audio")
                    or getattr(clip, "audio_source", None) is not None):
                self.audio.load_clip_audio(clip)
                self.audio.start()
        if getattr(self, "transport", None) is not None:
            # jack transport master (jack_pb_start, player.c:2288)
            self.transport.on_play()

    def stop(self):
        self.state.playing = False
        if getattr(self, "transport", None) is not None:
            self.transport.on_stop()
        for o, t in self._pending:
            self.sink.play_frame(o, t)
        self._pending.clear()
        # silence audio first (joining a long background compile below must
        # not extend audible playback)
        if self.audio is not None:
            self.audio.stop()
        # stop the precache worker loop
        self._pc_stop = True
        with self._pc_cv:
            self._pc_cv.notify_all()
        # let in-flight background work land (killing a thread inside an
        # XLA call at interpreter teardown aborts the process)
        for th in (self._compile_thread, self._precache_thread):
            if th is not None and th.is_alive():
                th.join(timeout=60)
        self.sink.exit_screen()

    def _cconx_sig(self):
        """Channel-connection topology over keymap slots — part of the
        graph cache key (a cconx edit is a config change: the reference
        rebuilds the nodemodel, nodemodel.c:7853)."""
        dc = self.datacons
        if dc is None or not getattr(dc, "chan_conns", None):
            return ()
        pos = {id(inst): k for k, inst in enumerate(self.keymap.instances)
               if inst is not None}
        return tuple((pos.get(id(c.src)), c.out_channel,
                      pos.get(id(c.dst)), c.in_slot)
                     for c in dc.chan_conns)

    def _chain_cache_key(self):
        # bg presence changes the built chain (_build_graph appends the
        # crossfade), so it must be part of the cache key: a graph cached
        # without a bg clip must not serve once one is selected (and vice
        # versa — the cached crossfade would index a missing track 1)
        return (self.keymap.chain_key(), self.state.bg_clip is not None,
                self._cconx_sig())

    def _graph_for_chain(self) -> FrameGraph:
        key = self._chain_cache_key()
        g = self._graphs.get(key)
        if g is None:
            g = self._build_graph(key)
        return g

    def _build_graph(self, key, register: bool = True) -> FrameGraph:
        chain = list(self.keymap.active_chain())
        # fg/bg blend: if a bg clip is present and no transition in the
        # chain consumes track 1, append the blend (player fg/bg mix)
        uses_bg = any(len(i.in_tracks) > 1 for i in chain)
        auto_mix = None
        if self.state.bg_clip is not None and not uses_bg:
            auto_mix = instantiate("crossfade", amount=self.state.blend_amount)
            auto_mix.in_tracks = (0, 1)
            chain.append(auto_mix)
        # cconx: resolve channel connections between chain members to
        # in-template wiring (forward edges only — the chain applies in
        # key order, like the reference's key-order effect application)
        cconx = []
        if self.datacons is not None:
            idx = {id(inst): i for i, inst in enumerate(chain)}
            for c in getattr(self.datacons, "chan_conns", ()):
                si, di = idx.get(id(c.src)), idx.get(id(c.dst))
                if si is not None and di is not None and si < di:
                    cconx.append((si, c.out_channel, di, c.in_slot))
        g = FrameGraph(chain, self.sink_spec,
                       fps=abs(self.state.pb_fps) or 25.0,
                       cconx=cconx)
        # blend_amount is a traced param: keep a handle so process_one can
        # refresh it per frame without recompiling
        g.auto_mix = auto_mix
        if register:
            # NOT registered for async/prewarm builds: _select_graph's
            # "already-compiled chain" fast path must only ever see graphs
            # whose template is warm — registering before the warm-up run
            # made the frame AFTER a toggle adopt the cold graph and block
            # on its compile (the toggle-storm p99 spike)
            self._graphs[key] = g
        return g

    def _bg_frame(self, target: int) -> int:
        """Background clip frame for fg frame `target`: follows the fg
        clock unless an independent bg rate is set (the reference's
        /clip/background/fps namespace)."""
        st = self.state
        ratio = st.bg_pb_fps / st.pb_fps if st.bg_pb_fps and st.pb_fps \
            else 1.0
        return int(target * ratio) % max(st.bg_clip.frames, 1)

    # -- precache (player.c pred_frame / srcgroup clone model) -------------
    def _pull(self, clip, n):
        # stateless generator clips pass through as GenSlot(clip, n): the
        # FrameGraph generates frame n INSIDE the run template with the
        # clip's own clock (in-template LOAD — one dispatch per frame, no
        # HBM round trip for the source frame, and bitwise get_frame(n)
        # semantics so scratch/bg-rate/record-replay stay frame-accurate).
        # Checked before the precache so the template config stays stable.
        from ..graph.nodemodel import FrameGraph as _FG, GenSlot
        if _FG._is_genclip(clip):
            return GenSlot(clip, n)
        if self._is_stateful_gen(clip):
            # stateful generators (beat_rings, milk_* presets) evolve
            # their feedback state per pull: frame n is NOT a pure
            # function of n, so caching/lookahead would serve stale
            # feedback and double-advance the state from the worker
            # thread. Pull live, on this thread only (the reference's
            # generator instances are likewise rendered per tick,
            # effects-weed.c:7572).
            return clip.get_frame(n)
        # LRU cache, not a consume-once queue: disk-clip frames are
        # immutable, so a hit stays cached (a looping clip that fits the
        # bound re-decodes NOTHING after the first cycle — pop-on-hit
        # forced every frame of a 12-frame loop through the decoder
        # forever and the worker fell behind at 60 fps). Re-insert on
        # hit so the insertion-order eviction approximates LRU.
        key = self._ck(clip, n)
        lay = self._precache.pop(key, None)
        if lay is not None:
            self._precache[key] = lay
            return lay
        dec = getattr(getattr(clip, "cdata", None), "decoder", None)
        if self.drop_on_miss and self.frames_shown > 0 \
                and self.precache_depth > 0 \
                and (key in self._inflight
                     or (dec is not None
                         and hasattr(dec, "get_frames_device"))):
            # the worker is (or will be) on it: skip this frame rather
            # than stall the loop with a synchronous decode (~21 ms at
            # 1080p, and it cascades — once the playhead escapes the
            # window entirely, inline decodes starve the worker further)
            raise _PrecacheMiss(key)
        lay = self._decode_frame(clip, n)
        if self.precache_depth:
            self._precache[key] = lay
        return lay

    @staticmethod
    def _is_stateful_gen(clip) -> bool:
        from ..effects.host import FILTER_STATEFUL
        inst = getattr(clip, "inst", None)
        return (inst is not None and inst.filter.is_generator
                and bool(inst.filter.flags & FILTER_STATEFUL))

    @staticmethod
    def _ck(clip, n):
        # cache key: clip identity + content generation (clips.py
        # Clip.version bumps on put_frame / frame-index rewrites, so an
        # edit can never serve a stale cached frame) + frame number
        return (id(clip), getattr(clip, "version", 0), n)

    def _decode_frame(self, clip, n):
        """Frame pull with the compressed-domain lane (MJPG): the decoder
        entropy-decodes on the host and the device does dequant+IDCT —
        the frame reaches the chain without a raw-pixel upload
        (io/jpeg_ingest.py; measured 2.1x live fps at 1080p through this
        attachment). Live chain consumers are device-side, so this is a
        pure win there; host consumers (re-render packers) keep
        get_frame. Shared by _pull and the precache worker."""
        from ..prefs import pref
        dec = getattr(getattr(clip, "cdata", None), "decoder", None)
        if dec is not None and hasattr(dec, "get_frame_device") \
                and str(pref("mjpeg_device_decode", "1")) != "0" \
                and getattr(clip, "is_virtual_frame", lambda _n: True)(n):
            try:
                fi = getattr(clip, "frame_index", None)
                dn = int(fi[n]) if fi is not None else n
                return dec.get_frame_device(dn)
            except Exception:
                pass
        return clip.get_frame(n)

    def _request_precache(self, target: int):
        import threading
        st = self.state
        from ..graph.nodemodel import FrameGraph as _FG
        direction = 1 if st.pb_fps >= 0 else -1
        # fg None = generated in-template, nothing to decode — but the
        # bg clip must still publish (a genclip fg + decoder bg used to
        # early-return here, so the bg was never precached and
        # drop_on_miss dropped every frame forever)
        fgc = None if (_FG._is_genclip(st.fg_clip)
                       or self._is_stateful_gen(st.fg_clip)) else st.fg_clip
        bg = None
        if st.bg_clip is not None and not _FG._is_genclip(st.bg_clip) \
                and not self._is_stateful_gen(st.bg_clip):
            # the bg window follows the REAL bg mapping (independent
            # rate/direction via _bg_frame), not the fg stride
            bgs = tuple(dict.fromkeys(
                self._bg_frame(self.clamp_frame(target + direction * k))
                for k in range(0, self.precache_depth + 1)))
            bg = (st.bg_clip, bgs)
        if fgc is None and bg is None:
            return
        self._pc_state = (fgc, int(target), direction, bg)
        with self._pc_cv:
            self._pc_cv.notify()
        if self._precache_thread is None or \
                not self._precache_thread.is_alive():
            self._pc_stop = False
            self._precache_thread = threading.Thread(
                target=self._precache_worker, daemon=True)
            self._precache_thread.start()

    def _precache_worker(self):
        """Free-running look-ahead decoder (the reference's pred_frame /
        srcgroup clone model, player.c:2185-2230). The main loop only
        publishes (clip, playhead, direction); the worker keeps the
        whole window decoded on its own clock, so it can decode FASTER
        than playback and catch up after a seek — a worker paced by
        per-frame requests can never recover a deficit (measured: the
        lane locked one frame late and dropped every other frame).

        Decodes in FIXED batch sizes (4 and precache_chunk, padded by
        repeating the last frame) so the device decoder jits exactly two
        templates per geometry — arbitrary window sizes compiled a new
        template per size (1.4 s stalls mid-performance)."""
        while not self._pc_stop:
            state = getattr(self, "_pc_state", None)
            if state is None:
                with self._pc_cv:
                    self._pc_cv.wait(0.5)
                continue
            clip, target, direction, bg = state
            if clip is not None:
                wanted = [self.clamp_frame(target + direction * k)
                          for k in range(0, self.precache_depth + 1)]
                missing = [f for f in wanted
                           if self._ck(clip, f) not in self._precache]
                nframes = getattr(clip, "frames", 0) or 1
            else:
                missing = []            # generated-in-template fg
                nframes = 1
            # the bg clip rides along: its window was computed by the
            # main thread through the real bg mapping (independent
            # rate/direction)
            if bg is not None:
                bclip, bgs = bg
                bmiss = [f for f in bgs
                         if self._ck(bclip, f) not in self._precache]
            else:
                bmiss = []
            # expensive seeks first (decplugin estimate_delay,
            # decplugin.h:305) — but the playhead's own frame always
            # goes first: it is the one being dropped on right now
            dec = getattr(getattr(clip, "cdata", None), "decoder",
                          None) if clip is not None else None
            if dec is not None and hasattr(dec, "estimate_delay"):
                missing.sort(key=lambda f: (f != target,
                                            -dec.estimate_delay(target, f)))
            # lead compensation: when the playhead outruns the decode
            # latency (the target is STILL missing two cycles in a row),
            # decode farthest-first — frames that land are then ahead of
            # the playhead and get shown, instead of landing behind it
            # and being skipped (graceful ~latency-bound degradation
            # instead of a collapse to ~0 fps)
            target_missing = clip is not None and \
                self._ck(clip, target) not in self._precache
            if target_missing and getattr(self, "_pc_behind", False):
                missing.sort(
                    key=lambda f: -min(abs(f - target),
                                       nframes - abs(f - target)))
            self._pc_behind = target_missing
            self._inflight = {self._ck(clip, f) for f in missing} \
                | ({self._ck(bg[0], f) for f in bmiss} if bg else set())
            near = any(min(abs(f - target), nframes - abs(f - target)) <= 2
                       for f in missing)
            if bg is not None and bmiss:
                bclip = bg[0]
                for j in range(0, len(bmiss), 4):
                    chunk = bmiss[j:j + 4]
                    pad = list(chunk)
                    while len(pad) < 4:
                        pad.append(pad[-1])
                    lays = self._decode_frames_batched(bclip, pad)
                    for f, lay in zip(chunk, lays or []):
                        self._precache[self._ck(bclip, f)] = lay
                    if lays is None:
                        for f in chunk:
                            k = self._ck(bclip, f)
                            if k not in self._precache:
                                try:
                                    self._precache[k] = \
                                        self._decode_frame(bclip, f)
                                except Exception:
                                    pass
                            self._inflight.discard(k)
                    else:
                        for f in chunk:
                            self._inflight.discard(self._ck(bclip, f))
            if (not missing and not bmiss) \
                    or (not bmiss and len(missing) < 4 and not near):
                # hysteresis: far-horizon singletons accumulate into one
                # batched dispatch instead of paying a padded dispatch
                # RPC every tick (~28 ms/frame -> ~19 ms/frame amortised)
                with self._pc_cv:
                    if getattr(self, "_pc_state", None) == state:
                        self._pc_cv.wait(0.05)
                continue
            csz = max(4, int(self.precache_chunk))
            batched_ok = True
            while missing and not self._pc_stop:
                n = csz if len(missing) >= csz else 4
                chunk = missing[:n]
                missing = missing[n:]
                pad = list(chunk)
                while len(pad) < n:
                    pad.append(pad[-1])      # fixed template sizes
                lays = self._decode_frames_batched(clip, pad) \
                    if batched_ok else None
                if lays is None:
                    batched_ok = False
                    for f in chunk:
                        k = self._ck(clip, f)
                        if k not in self._precache:
                            try:
                                self._precache[k] = \
                                    self._decode_frame(clip, f)
                            except Exception:
                                pass
                        self._inflight.discard(k)
                    continue
                for f, lay in zip(chunk, lays):
                    k = self._ck(clip, f)
                    self._precache[k] = lay
                    self._inflight.discard(k)
            # bound the cache (racy vs _pull's pop-reinsert on the main
            # thread: a KeyError here would silently kill the worker)
            while len(self._precache) > 4 * self.precache_depth:
                try:
                    self._precache.pop(next(iter(self._precache)), None)
                except (StopIteration, RuntimeError):
                    break

    def _decode_frames_batched(self, clip, fs):
        """Whole-window compressed-domain decode for the precache worker;
        None when the clip has no batched device lane (caller falls back
        to per-frame decodes)."""
        from ..prefs import pref
        dec = getattr(getattr(clip, "cdata", None), "decoder", None)
        if dec is None or not hasattr(dec, "get_frames_device") \
                or str(pref("mjpeg_device_decode", "1")) == "0":
            return None
        virt = getattr(clip, "is_virtual_frame", lambda _n: True)
        if not all(virt(f) for f in fs):
            return None
        try:
            fi = getattr(clip, "frame_index", None)
            dns = [int(fi[f]) if fi is not None else f for f in fs]
            return dec.get_frames_device(dns)
        except Exception:
            return None

    def _fetch_host_layers(self, group):
        """Materialise a group of pipelined output Layers on the host in
        ONE transfer: stack each plane index across the group inside a
        jitted op, fetch the stacks, and rebuild per-frame Layers whose
        planes are host ndarrays (every Sink.play_frame `np.asarray`
        then costs nothing). One RPC round trip per plane index per
        group instead of one per frame."""
        import dataclasses as _dc

        import jax
        import jax.numpy as jnp

        outs = [o for o, _ in group]
        n = len(outs)
        n_planes = len(outs[0].planes)
        sig = tuple((p.shape, str(p.dtype)) for p in outs[0].planes)
        if any(tuple((p.shape, str(p.dtype)) for p in o.planes) != sig
               for o in outs[1:]):
            return group  # mixed shapes mid-group (config change): as-is
        key = (n, sig)
        fn = self._fetch_fns.get(key)
        if fn is None:
            def stack(*flat):
                return tuple(
                    jnp.stack(flat[pi::n_planes])
                    for pi in range(n_planes))
            fn = jax.jit(stack)
            self._fetch_fns[key] = fn
        flat = [p for o in outs for p in o.planes]
        hosts = [np.asarray(s) for s in fn(*flat)]
        return [(_dc.replace(o, planes=tuple(h[i] for h in hosts)), t)
                for i, (o, t) in enumerate(group)]

    # -- async chain rebuild ----------------------------------------------
    def _warm_graph_async(self, graph, key, layers, adopt: bool):
        """Compile a graph's template off-thread on a warm-up frame;
        register it (and optionally adopt it as served) only once warm.
        One compile at a time: compiles through a remote attachment take
        30 s-minutes and the single host core must keep serving."""
        import threading

        self._compile_key = key
        self._compile_adopt = adopt

        def compile_job(lys=list(layers)):
            try:
                import jax
                # warm-up frame: do NOT mirror state back into the
                # Instance objects (shared with the live graph — an
                # unsynchronized cross-thread write, and the adopted
                # graph must not have consumed a phantom frame)
                out = graph.run(lys, tc=0.0, frame=0, mirror_state=False)
                jax.block_until_ready(out.planes)
                self._graphs[key] = graph
                # re-read the adopt flag AFTER the warm-up: a prewarm
                # compile gets upgraded by _select_graph when the user
                # toggles to this exact chain while it is in flight
                if self._compile_adopt:
                    self._served_key = key
            except Exception:
                if self._compile_adopt:
                    self._served_key = key  # fall through to sync path
            finally:
                self._compile_key = None
                self._compile_thread = None

        self._compile_thread = threading.Thread(target=compile_job,
                                                daemon=True)
        self._compile_thread.start()

    def _select_graph(self, layers):
        self._last_layers = list(layers)
        desired = self._chain_cache_key()
        if not self.async_compile or self._served_key is None \
                or desired == self._served_key:
            g = self._graph_for_chain()
            self._served_key = desired
            return g
        cached = self._graphs.get(desired)
        if cached is not None:
            # toggling back to an already-compiled chain: switch instantly
            self._served_key = desired
            return cached
        # chain changed: compile the new template off-thread, keep serving
        # the old graph meanwhile
        if self._compile_thread is None or not self._compile_thread.is_alive():
            new_graph = self._build_graph(desired, register=False)
            self._warm_graph_async(new_graph, desired, layers, adopt=True)
        elif self._compile_key == desired:
            # the desired chain is already compiling as a prewarm:
            # upgrade it to adopt-on-finish instead of compiling twice
            self._compile_adopt = True
        served = self._graphs.get(self._served_key)
        if served is None:  # effort transition cleared the cache
            served = self._build_graph(self._served_key) \
                if self._served_key else self._graph_for_chain()
        return served

    def _prewarm_step(self):
        """Safe-point pre-compilation (reference: nodemodel pre-build at
        safe points, player.c:2655): while idle, background-compile the
        graph for ONE config reachable by a single key toggle, so the
        toggle itself swaps to a warm template. Runs at most one compile
        at a time and remembers attempted configs."""
        if not (self.async_compile and self.prewarm_compile):
            return
        if self._compile_thread is not None \
                and self._compile_thread.is_alive():
            return
        if not self._last_layers:
            return
        km = self.keymap
        for k in range(N_KEYS):
            if not km.current_filter(k):
                continue
            was = km.active[k]
            if not was and km.instances[k] is None:
                if not km.toggle(k, True):
                    continue
                km.active[k] = False
            km.active[k] = not was
            try:
                key = self._chain_cache_key()
                if key in self._graphs or key in self._prewarm_seen:
                    continue
                self._prewarm_seen.add(key)
                g = self._build_graph(key, register=False)
                self._warm_graph_async(g, key, self._last_layers,
                                       adopt=False)
                return  # one prewarm per safe point
            finally:
                km.active[k] = was

    def process_one(self) -> bool:
        """One player cycle (player.c:2185). Returns False when stopped."""
        st = self.state
        if not st.playing or st.fg_clip is None:
            return False
        t_start = time.monotonic()
        self._autotrans_step()
        target = self.clamp_frame(self._target_frame_f())
        if st.nervous:
            # nervous-mode trickplay (player.c:1013): random walk +/-10
            # around the playhead, only for clips that can seek backwards;
            # out-of-range jumps fall back to the clock frame. The jittered
            # frame IS the shown frame, so recordings capture it and
            # re-renders reproduce the performance deterministically.
            can_rev = getattr(st.fg_clip, "can_reverse", True)
            n = getattr(st.fg_clip, "frames", 0) or 0
            if can_rev and n > 1:
                cand = target + int(self._nervous_rng.integers(-10, 11))
                if 0 <= cand < n:
                    target = cand
        if target == st.frame and self.frames_shown > 0:
            return True  # nothing new to show
        if self.frames_shown > 0:
            # frames the clock passed over without being shown (player.c
            # frame-drop accounting feeding the stats overlay)
            step = abs(target - st.frame)
            n = st.fg_clip.frames if st.fg_clip is not None else 1
            wrapped = min(step, abs(n - step))
            if wrapped > 1:
                self.frames_dropped += wrapped - 1
        prev_frame = st.frame
        st.frame = target
        if self.ladder is not None:
            self.ladder.begin()
        try:
            layers = [self._pull(st.fg_clip, target)]
            if st.bg_clip is not None:
                layers.append(self._pull(st.bg_clip,
                                         self._bg_frame(target)))
        except _PrecacheMiss as miss:
            # frame not decoded yet: drop it (never block the serving
            # loop on a synchronous decode) and let the clock move on —
            # the worker finishes it for a later retry or the next frame
            st.frame = prev_frame
            key = miss.args[0]
            if key != getattr(self, "_last_missed", None):
                self.frames_dropped += 1     # count each frame once
                self._last_missed = key
            if self.precache_depth:
                self._request_precache(target)
            if self.ladder is not None:
                self.ladder.end()
            # donate the GIL to the decode worker instead of spinning
            # (the miss loop otherwise starves the thread that clears it)
            time.sleep(0.002)
            return True
        # this target pulled fine: a later re-miss of the same frame key
        # is a NEW drop episode and must count again
        self._last_missed = None
        if self.ladder is not None:
            self.ladder.mark("loaded")
        graph = self._select_graph(layers)
        if self.datacons is not None:
            for inst in self.keymap.active_chain():
                self.datacons.chain_data(inst)
        mix = getattr(graph, "auto_mix", None)
        if mix is not None:  # live blend factor (traced param: no recompile)
            mix.values["amount"] = st.blend_amount
        if self.precache_depth:
            self._request_precache(target)
        tc = target / abs(st.pb_fps or 25.0)
        out = graph.run(layers, tc=tc, frame=target)
        if self.ladder is not None:
            self.ladder.mark("applied")
        if self.subtitles is not None:
            # subtitles index CLIP time (frame/clip fps), not the
            # playback-rate clock — scratching must not shift captions
            clip_fps = getattr(st.fg_clip, "fps", 25.0) or 25.0
            out = self.subtitles.apply(out, target / clip_fps)
        if self.pipeline_depth > 0:
            self._pending.append((out, tc))
            ok = True
            k = self.fetch_batch
            if k > 1:
                # pop in groups of K: one stacked host fetch per group
                # (adds up to K-1 frames of display latency on top of
                # pipeline_depth; the RPC cost divides by K)
                while len(self._pending) >= self.pipeline_depth + k:
                    group = self._pending[:k]
                    del self._pending[:k]
                    for o, t in self._fetch_host_layers(group):
                        ok = self.sink.play_frame(o, t)
            else:
                while len(self._pending) > self.pipeline_depth:
                    o, t = self._pending.pop(0)
                    ok = self.sink.play_frame(o, t)
        else:
            ok = self.sink.play_frame(out, tc)
        if self.ladder is not None:
            self.ladder.mark("displayed")
            self.ladder.end()
        el = self.event_list   # snapshot: record_stop may null it from
        # the OSC thread mid-section (the insert below must not race)
        if self.record and el is not None:
            # record against the PERFORMANCE state, not the served graph:
            # with async_compile the old graph (still carrying auto_mix)
            # keeps serving after bg_clip is dropped, which must not delay
            # the recorded deinit to the template-swap frame
            uses_bg = any(len(i.in_tracks) > 1
                          for i in self.keymap.active_chain())
            self._record_automix(st.bg_clip is not None and not uses_bg)
            clips = [getattr(st.fg_clip, "unique_id", 1)]
            frames = [target]
            src_uid = clips[0]  # pre-scrap fg reference (audio follows it)
            if st.bg_clip is not None:
                clips.append(getattr(st.bg_clip, "unique_id", 2))
                frames.append(self._bg_frame(target))
            if self._scrap_generators:
                # live sources (generators) scrap their pulled output so
                # the re-render replays EXACTLY what was performed —
                # preset switches, trickplay state and all — instead of
                # re-running the source (reference save_to_scrap_file,
                # frameloader.c:1212). Frames ride the device JPEG
                # encode lane; on queue overflow the recording falls
                # back to the live source reference (approximate).
                srcs = [st.fg_clip] + ([st.bg_clip]
                                       if st.bg_clip is not None else [])
                for i, sclip in enumerate(srcs):
                    if not (hasattr(sclip, "inst")
                            or getattr(sclip, "scrap_on_record", False)):
                        continue
                    if not hasattr(layers[i], "planes"):
                        # stateless generators ride as GenSlot markers
                        # (rendered in-template, never materialised
                        # host-side): pure functions of (n, params), so
                        # the clip reference itself replays exactly —
                        # nothing to scrap
                        continue
                    rec = self._scrap_recs.get(id(sclip))
                    if rec is None:
                        from ..io.scrap import MJPEGScrapRecorder
                        rec = MJPEGScrapRecorder(
                            sclip.width, sclip.height,
                            fps=abs(st.pb_fps) or 25.0)
                        self._scrap_recs[id(sclip)] = rec
                    idx = rec.put(layers[i])
                    if idx is not None:
                        # remember the live-source reference per index:
                        # if the encode worker fails mid-take,
                        # record_stop rewrites the affected FRAME events
                        # back to this
                        rec.origs.append((clips[i], frames[i]))
                        clips[i] = rec.unique_id
                        frames[i] = idx
            extra = {}
            if self.audio is not None and \
                    getattr(self.audio, "_data", None) is not None:
                # audio state per frame (reference records audio_clips/
                # audio_seeks pairs — track -1 = the performance audio,
                # events.c:5665 — so scratch performances re-render with
                # the audio they made). Audio follows the SOURCE clip,
                # not the (video-only) scrap clip substituted above.
                base = getattr(st.fg_clip, "fps", 25.0) or 25.0
                vel = (st.pb_fps or base) / base
                extra["audio_clips"] = [-1, src_uid]
                extra["audio_seeks"] = [self.audio._pos
                                        / self.audio._src_rate, vel]
            el.insert(
                frame_event(self._rec_tc(), clips, frames, **extra))
            if getattr(self, "_rec_backup_path", None) and \
                    time.monotonic() - self._rec_last_backup \
                    > self._rec_backup_every:
                # incremental JSONL append: O(new events) per interval —
                # a full-list serialize grew linearly with take length
                # and stuttered hour-long takes on the single host core
                self._append_backup(el)
                self._rec_last_backup = time.monotonic()
        self.frames_shown += 1
        for cb in self.frame_listeners:
            try:
                cb(target, tc)
            except Exception:
                pass
        self._frame_times.append(time.monotonic() - t_start)
        if len(self._frame_times) > 256:
            self._frame_times = self._frame_times[-128:]
        if self.adaptive_quality:
            self._update_effort()
        self._prewarm_step()  # safe point: frame delivered
        # generator preset auto-cycle (projectM presetDuration role):
        # time-based switch at a safe point, after the frame was shown
        fg = self.state.fg_clip
        if fg is not None and getattr(fg, "autocycle_secs", 0.0):
            try:
                fg.maybe_autocycle(time.monotonic())
            except Exception:
                pass
        return ok

    def _update_effort(self):
        """Degrade/restore playback quality to hold fps (the reference's
        effort machinery, player.c effort updates / prefs->pbq_adaptive).

        Ladder (cumulative):
          0: full quality (smooth resize, letterbox honoured)
          1: bilinear resize
          2: nearest resize, letterboxing dropped (plain stretch — the
             reference degrades letterbox quality the same way)
          3: + precache paused and free-run frame dropping (never wait
             for skipped targets; the clock jumps, drops are counted)
        """
        budget = 1.0 / max(abs(self.state.pb_fps), 1.0)
        recent = self._frame_times[-8:]
        if not recent:
            return
        avg = sum(recent) / len(recent)
        old = self.effort
        if avg > budget * 1.1 and self.effort < 3:
            self.effort += 1
        elif avg < budget * 0.5 and self.effort > 0:
            self.effort -= 1
        if old != self.effort:
            import dataclasses
            method = "smooth" if self.effort == 0 else \
                ("bilinear" if self.effort == 1 else "nearest")
            if self._lbox_wanted is None:  # first transition: remember
                self._lbox_wanted = self.sink_spec.letterbox
            self.sink_spec = dataclasses.replace(
                self.sink_spec, method=method,
                letterbox=self._lbox_wanted and self.effort < 2)
            if self.effort >= 3:
                self._precache_saved = self.precache_depth or \
                    getattr(self, "_precache_saved", 0)
                self.precache_depth = 0
            elif getattr(self, "_precache_saved", 0):
                self.precache_depth = self._precache_saved
            self._graphs.clear()  # re-template at the new quality
            self._prewarm_seen.clear()  # prewarmed configs gone with them

    def play_n_cycles(self, n: int, realtime: bool = False):
        """Drive n cycles (tests / headless playback)."""
        for _ in range(n):
            if not self.process_one():
                break
            if realtime:
                time.sleep(max(0.0, 1.0 / max(abs(self.state.pb_fps), 1)
                               - (self._frame_times[-1]
                                  if self._frame_times else 0)))

    # -- stats (diagnostics.c get_inst_fps / get_stats_msg) ---------------
    def stats(self) -> dict:
        ft = self._frame_times[-64:]
        return {
            "frames_shown": self.frames_shown,
            "frames_dropped": self.frames_dropped,
            "inst_fps": (1.0 / (sum(ft) / len(ft))) if ft else 0.0,
            "p99_ms": (float(np.percentile(ft, 99)) * 1e3) if ft else 0.0,
        }
