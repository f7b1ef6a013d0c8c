"""Output sinks — the playback-plugin boundary (reference
`plugins/playback/video/videoplugin.h`: `play_frame(layer, tc)` :145,
palette negotiation :104-110).

A sink declares the palettes it accepts; the player's frame graph converts
on-device and only the final bytes cross to host.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from ..constants import Palette
from ..layer import Layer, layer_to_bytes


class Sink:
    """Base sink. `palette_list` drives sink-side palette negotiation."""

    palette_list: tuple[int, ...] = (Palette.RGB24,)

    def init_screen(self, width: int, height: int, fps: float):
        pass

    def play_frame(self, layer: Layer, tc: float) -> bool:
        raise NotImplementedError

    def exit_screen(self):
        pass


class NullSink(Sink):
    """Discards frames after forcing materialisation (benchmark sink)."""

    def __init__(self):
        self.count = 0

    def play_frame(self, layer: Layer, tc: float) -> bool:
        import jax
        jax.block_until_ready(layer.planes)
        self.count += 1
        return True


class CollectSink(Sink):
    """Keeps frames in memory (tests)."""

    def __init__(self, max_frames: int = 1 << 30):
        self.frames: list[np.ndarray] = []
        self.tcs: list[float] = []
        self.max_frames = max_frames

    def play_frame(self, layer: Layer, tc: float) -> bool:
        if len(self.frames) < self.max_frames:
            self.frames.append(np.asarray(layer.planes[0]))
            self.tcs.append(tc)
        return True


class PNGSink(Sink):
    """Writes numbered PNGs (render-to-images path)."""

    def __init__(self, out_dir: str | Path):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.n = 0

    def play_frame(self, layer: Layer, tc: float) -> bool:
        from PIL import Image
        arr = np.moveaxis(np.asarray(layer.planes[0]), 0, -1)
        Image.fromarray(arr).save(self.out_dir / f"{self.n + 1:08d}.png")
        self.n += 1
        return True


class Y4MSink(Sink):
    """Streams YUV4MPEG2 (reference yuv4mpeg_stream / lives2lives output
    plugins)."""

    palette_list = (Palette.YUV420P,)

    def __init__(self, path: str):
        self.path = path
        self._fh = None
        self.fps = 25.0

    def init_screen(self, width: int, height: int, fps: float):
        self.fps = fps
        num, den = int(round(fps * 1001)), 1001
        if abs(fps - round(fps)) < 1e-6:
            num, den = int(round(fps)), 1
        self._fh = open(self.path, "wb")
        self._fh.write(f"YUV4MPEG2 W{width} H{height} F{num}:{den} Ip A1:1 "
                       f"C420jpeg\n".encode())

    def play_frame(self, layer: Layer, tc: float) -> bool:
        self._fh.write(b"FRAME\n")
        for p in layer.planes[:3]:
            self._fh.write(np.asarray(p).tobytes())
        return True

    def exit_screen(self):
        if self._fh:
            self._fh.close()
