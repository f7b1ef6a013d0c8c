"""Embeddable application API — the liblives successor.

Mirrors the class surface of `/root/reference/src/liblives.hpp:402-915`
(`livesApp`, `clip`, `set`, `effectKey`, `effectKeyMap`, `player`,
`multitrack`) as idiomatic Python over the TPU engine. Callbacks are plain
callables registered per notify event (liblives marshals them onto the GTK
idle loop; here they run on the caller's thread or the OSC thread).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Optional

from .graph.nodemodel import SinkSpec
from .io.clips import Clip as _Clip, create_clip, open_clip
from .multitrack import Multitrack
from .osc.server import NOTIFY, OSCServer
from .player import CollectSink, NullSink, Player
from .player.sinks import Sink


class LiVESClip:
    """liblives `clip` (liblives.hpp:~520): metadata + frame access."""

    def __init__(self, app: "LiVESApp", clip: _Clip, cnum: int):
        self._app = app
        self._clip = clip
        self.number = cnum

    @property
    def frames(self):
        return self._clip.frames

    @property
    def fps(self):
        return self._clip.fps

    @property
    def width(self):
        return self._clip.width

    @property
    def height(self):
        return self._clip.height

    @property
    def name(self):
        return self._clip.name

    @property
    def unique_id(self):
        return self._clip.unique_id

    def select(self):
        self._app.player._player.state.fg_clip = self._clip
        return True

    def select_background(self):
        self._app.player._player.state.bg_clip = self._clip
        return True

    def raw(self) -> _Clip:
        return self._clip


class EffectKey:
    """liblives `effectKey`: one of the 64 rte keys."""

    def __init__(self, app: "LiVESApp", key: int):
        self._app = app
        self.key = key

    def map(self, filter_name: str, mode: int = 0):
        self._app.player._player.keymap.set_key(self.key, mode, filter_name)

    @property
    def enabled(self) -> bool:
        return self._app.player._player.keymap.active[self.key]

    def set_enabled(self, on: bool):
        self._app.player._player.key_toggle(self.key, on)

    def next_mode(self):
        self._app.player._player.keymap.next_mode(self.key)

    def set_parameter(self, name: str, value):
        self._app.player._player.set_key_param(self.key, name, value)


class EffectKeyMap:
    """liblives `effectKeyMap`: indexable key collection."""

    def __init__(self, app: "LiVESApp"):
        self._app = app

    def __getitem__(self, key: int) -> EffectKey:
        return EffectKey(self._app, key)

    def clear(self):
        km = self._app.player._player.keymap
        for k in range(len(km.active)):
            if km.active[k]:
                self._app.player._player.key_toggle(k, False)


class LiVESPlayer:
    """liblives `player`."""

    def __init__(self, app: "LiVESApp", sink: Sink | None = None):
        self._app = app
        self._player = Player(sink=sink or NullSink())

    def play(self):
        self._player.start()
        self._app._notify(NOTIFY.PLAYBACK_STARTED, "")
        return True

    def stop(self):
        self._player.stop()
        self._app._notify(NOTIFY.PLAYBACK_STOPPED, "")
        return True

    @property
    def playing(self):
        return self._player.state.playing

    def set_fps(self, fps: float):
        self._player.set_pb_fps(fps)

    @property
    def fps(self):
        return self._player.state.pb_fps

    def tick(self, n: int = 1):
        """Advance n player cycles (headless pump)."""
        self._player.play_n_cycles(n)


class ClipSet:
    """liblives `set`: the loaded clip collection, savable under a name
    (reference sethandler.c)."""

    def __init__(self, app: "LiVESApp"):
        self._app = app
        self.name = ""

    @property
    def num_clips(self):
        return len(self._app._clips)

    def __getitem__(self, i: int) -> LiVESClip:
        return self._app._clips[i]

    def save(self, name: str):
        from .sets import save_set
        save_set(self._app, name)
        self.name = name
        self._app._notify(NOTIFY.CLIPSET_SAVED, name)
        return True


class LiVESApp:
    """liblives `livesApp`: the top-level embeddable application object."""

    def __init__(self, workdir: str | Path | None = None,
                 sink: Sink | None = None, osc_port: int | None = None):
        import tempfile
        self.workdir = Path(workdir or tempfile.mkdtemp(prefix="lives_tpu_"))
        self.workdir.mkdir(parents=True, exist_ok=True)
        self._clips: list[LiVESClip] = []
        self.player = LiVESPlayer(self, sink)
        self.effect_key_map = EffectKeyMap(self)
        self.set = ClipSet(self)
        self.multitrack = Multitrack()
        self._callbacks: dict[int, list[Callable]] = {}
        self.osc: Optional[OSCServer] = None
        if osc_port is not None:
            self.osc = OSCServer(self.player._player, port=osc_port)
            self.osc.start()

    # -- clips -------------------------------------------------------------
    def open_file(self, uri: str) -> LiVESClip:
        from .sets import add_to_recovery
        clip = open_clip(uri, self.workdir)
        add_to_recovery(self.workdir, clip.clip_dir)
        c = LiVESClip(self, clip, len(self._clips) + 1)
        self._clips.append(c)
        if self.osc:
            self.osc.clips[c.number] = clip
        if self.player._player.state.fg_clip is None:
            c.select()
        self._notify(NOTIFY.CLIP_OPENED, str(c.number))
        return c

    def new_clip(self, width: int, height: int, fps: float = 25.0,
                 name: str = "") -> LiVESClip:
        clip = create_clip(self.workdir, width, height, fps, name)
        c = LiVESClip(self, clip, len(self._clips) + 1)
        self._clips.append(c)
        if self.osc:
            self.osc.clips[c.number] = clip
        return c

    def close_clip(self, c: LiVESClip):
        self._clips.remove(c)
        self._notify(NOTIFY.CLIP_CLOSED, str(c.number))

    # -- callbacks (liblives appendListener) -------------------------------
    def add_callback(self, notify_event: int, fn: Callable[[str], None]):
        self._callbacks.setdefault(notify_event, []).append(fn)

    def _notify(self, event: int, data: str = ""):
        if self.osc:
            self.osc.notify(event, data)
        for fn in self._callbacks.get(event, []):
            fn(data)

    def quit(self):
        self._notify(NOTIFY.APP_QUIT, "")
        if self.osc:
            self.osc.stop()
