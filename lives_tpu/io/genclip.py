"""Generator clips: a zero-input filter instance acting as a clip source
(reference CLIP_TYPE_GENERATOR, `weed_generator_start`
effects-weed.c:7739)."""

from __future__ import annotations

import jax

from ..effects.host import FrameContext, instantiate
from ..layer import Layer


class GeneratorClip:
    """Clip-like object backed by a generator filter; frames are pure
    functions of (frame number, params) and render jitted on device."""

    def __init__(self, filter_name: str, width: int, height: int,
                 fps: float = 25.0, frames: int = 1 << 30,
                 audio_source=None, **values):
        self.inst = instantiate(filter_name, **values)
        if self.inst.filter.n_in != 0:
            raise ValueError(f"{filter_name} is not a generator")
        # switch() may run on the OSC/webui thread while the player
        # thread is inside get_frame: the lock keeps the (filter, fn,
        # state) triple consistent (a stale state write-back after a
        # switch would feed the new filter the old pytree)
        import threading
        self._lock = threading.Lock()
        self.width, self.height = width, height
        self.fps = fps
        self.frames = frames
        self.name = filter_name
        # process-stable: recorded/autosaved FRAME events reference this
        # uid and must resolve after a restart (crash recovery)
        from ..utils.uid import stable_uid
        self.unique_id = stable_uid("gen", filter_name, width, height)
        self._fn = None
        self._state = None  # stateful generator state (threads host-side)
        # audio-generator sources (reference: generator instances may carry
        # audio out-channels, e.g. fourKlives / tone_gen): any object with
        # render_at(pos, n) -> (n, ch) float32 and .rate; the player's
        # AudioPlayer streams from it (audio/fx.py load_clip_audio)
        self.audio_source = audio_source
        self.arate = getattr(audio_source, "rate", 0) or 0
        self.achans = (getattr(audio_source, "channels", 2)
                       if audio_source is not None else 0)

    def switch(self, filter_name: str, **values):
        """Swap the backing generator filter in place — projectM preset
        switching (projectM.cpp nextPreset role): same clip slot, new
        program. The jitted fn, state, and precache entries all rebuild
        lazily (`version` bump invalidates cache keys)."""
        inst = instantiate(filter_name, **values)
        if inst.filter.n_in != 0:
            raise ValueError(f"{filter_name} is not a generator")
        with self._lock:
            self.inst = inst
            self.name = filter_name
            self._fn = None
            self._state = None
            self.version = getattr(self, "version", 0) + 1

    def cycle(self, step: int = 1) -> int:
        """Advance the preset playlist (set by /clip/open/milkdir) and
        switch in place. Returns the new position."""
        pl = getattr(self, "playlist", None)
        if not pl:
            raise RuntimeError("clip has no preset playlist")
        self.playlist_pos = (getattr(self, "playlist_pos", 0)
                             + int(step)) % len(pl)
        self.switch(pl[self.playlist_pos])
        return self.playlist_pos

    def maybe_autocycle(self, now: float) -> bool:
        """Time-based preset auto-switch (projectM's soft-cut default:
        presetDuration seconds per preset). The player calls this once
        per shown frame; it switches when `autocycle_secs` is set and
        elapsed. Returns True when a switch happened."""
        secs = getattr(self, "autocycle_secs", 0.0)
        if not secs or not getattr(self, "playlist", None):
            return False
        last = getattr(self, "_last_cycle", None)
        if last is None:
            self._last_cycle = now
            return False
        if now - last < secs:
            return False
        self._last_cycle = now
        self.cycle()
        return True

    def read_audio(self):
        """Clip-audio protocol (transcode / clipboard copy consume this).
        Unbounded generators (the frames=1<<30 default sentinel) render one
        minute; finite clips render their full duration."""
        import numpy as np
        if self.audio_source is None:
            return np.zeros((0, 2), np.float32)
        dur = 60.0 if self.frames >= (1 << 29) else self.frames / self.fps
        return self.audio_source.render_at(0, int(dur * self.arate))

    def _build(self):
        from ..effects.host import FILTER_STATEFUL
        filt = self.inst.filter
        w, h, fps = self.width, self.height, self.fps
        if filt.flags & FILTER_STATEFUL:
            # stateful generators (beat_rings, milk_* presets): the state
            # pytree lives on the clip and threads through a 4-arg jit —
            # frames must be pulled in order for the feedback to evolve
            # (matching the reference's live generator instance semantics,
            # effects-weed.c:7739: one instance, one evolving state)
            def fn(tc, frame, params, state):
                ctx = FrameContext(tc=tc, frame=frame, fps=fps,
                                   width=w, height=h)
                return filt.process([], params, ctx, state)
        else:
            def fn(tc, frame, params, state):
                ctx = FrameContext(tc=tc, frame=frame, fps=fps,
                                   width=w, height=h)
                return filt.process([], params, ctx), None

        return jax.jit(fn)

    def get_frame(self, n: int) -> Layer:
        import jax.numpy as jnp
        from ..constants import Palette
        from ..effects.host import FILTER_STATEFUL
        with self._lock:
            filt = self.inst.filter
            if self._fn is None:
                self._fn = self._build()
            if (filt.flags & FILTER_STATEFUL) and self._state is None \
                    and filt.init_state is not None:
                self._state = filt.init_state(self.width, self.height,
                                              int(Palette.RGB24))
            params = {k: (jnp.float32(v) if isinstance(v, (int, float))
                          and self.inst.filter.param(k).kind not in
                          ("int", "string", "string_list", "bool") else v)
                      for k, v in self.inst.param_values().items()}
            layer, state = self._fn(jnp.float32(n / self.fps),
                                    jnp.int32(n), params, self._state)
            if filt.flags & FILTER_STATEFUL:
                self._state = state
        return layer
