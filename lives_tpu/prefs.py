"""Preferences: disk-backed config with live/deferred split.

Successor of `src/preferences.c` (~300 string-keyed prefs; `prefs` /
`future_prefs` double-buffer — deferred prefs apply at restart,
preferences.h:1080+). Here: a typed dataclass of the engine-relevant subset,
a string-keyed overflow dict for everything else, JSON on disk, and the same
live/deferred pattern (`set(..., deferred=True)` lands in `future`; `apply_
future()` is the "restart").
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


@dataclass
class Prefs:
    # engine
    pb_quality: int = 2             # 1=low 2=med 3=high (PB_QUALITY_*)
    pbq_adaptive: bool = True       # adaptive quality under load
    rte_keys_virtual: int = 64
    nfx_threads: int = 8            # batch width hint (was pthread count)
    # playback
    def_fps: float = 25.0
    loop_mode: bool = True
    # rendering
    render_batch_size: int = 48
    img_type: str = "png"
    # colour
    screen_gamma: float = 1.4
    yuv_clamping: int = 0
    # audio
    audio_rate: int = 44100
    audio_channels: int = 2
    # paths
    workdir: str = ""
    weed_plugin_path: str = ""      # extra filter module dirs
    # devices
    osc_port: int = 49999
    # everything else (string-keyed, reference PREF_* namespace)
    extra: dict[str, Any] = field(default_factory=dict)

    def get(self, key: str, default=None):
        if hasattr(self, key):
            return getattr(self, key)
        return self.extra.get(key, default)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        extra = d.pop("extra")
        d.update(extra)
        return d


class PrefsStore:
    """prefs + future_prefs double buffer, JSON-backed."""

    FIELDS = {f.name for f in dataclasses.fields(Prefs)} - {"extra"}

    def __init__(self, path: str | Path | None = None):
        self.path = Path(path) if path else None
        self.prefs = Prefs()
        self.future: dict[str, Any] = {}
        if self.path and self.path.exists():
            self.load()

    def set(self, key: str, value, deferred: bool = False):
        if deferred:
            self.future[key] = value
            return
        if key in self.FIELDS:
            setattr(self.prefs, key, value)
        else:
            self.prefs.extra[key] = value

    def get(self, key: str, default=None):
        return self.prefs.get(key, default)

    def apply_future(self):
        """Apply deferred prefs (the reference does this at restart)."""
        for k, v in self.future.items():
            self.set(k, v)
        self.future.clear()

    def save(self):
        if not self.path:
            return
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(
            {"prefs": self.prefs.to_dict(), "future": self.future},
            indent=1))

    def load(self):
        d = json.loads(self.path.read_text())
        stored = d.get("prefs", {})
        for k, v in stored.items():
            self.set(k, v)
        self.future = d.get("future", {})
