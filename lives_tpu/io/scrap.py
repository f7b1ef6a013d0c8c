"""Scrap file: raw recorded frame stream (reference `src/frameloader.c:
1212,1313` scrap write/read; used to capture generator/stream output during
a performance so re-render doesn't need to re-run live sources).

Format: a header json line, then per frame a fixed-size record of planar
payload (layout derived from palette + geometry). Fixed records make the
file seekable and compatible with the native frame cache's stride reader.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..constants import CHROMA_SUBSAMPLING, Palette, is_yuv_palette
from ..layer import Layer, layer_from_bytes, layer_to_bytes


def _frame_size(palette: int, w: int, h: int) -> int:
    pal = Palette(palette)
    if pal == Palette.RGB24:
        return w * h * 3
    if pal in (Palette.RGBA32, Palette.BGRA32, Palette.ARGB32):
        return w * h * 4
    if pal == Palette.YUV420P:
        return w * h * 3 // 2
    if pal == Palette.YUV422P:
        return w * h * 2
    if pal in (Palette.YUV444P,):
        return w * h * 3
    raise ValueError(f"scrap: unsupported palette {pal}")


class ScrapWriter:
    def __init__(self, path: str | Path, width: int, height: int,
                 palette: int = Palette.RGB24, fps: float = 25.0):
        self.path = Path(path)
        self.width, self.height = width, height
        self.palette = int(palette)
        self.frame_size = _frame_size(palette, width, height)
        self._fh = open(self.path, "wb")
        hdr = json.dumps({"magic": "lives_tpu_scrap", "version": 1,
                          "width": width, "height": height,
                          "palette": self.palette, "fps": fps,
                          "frame_size": self.frame_size})
        self._fh.write(hdr.encode() + b"\n")
        self.data_start = self._fh.tell()
        self.nframes = 0

    def write(self, layer: Layer):
        data = layer_to_bytes(layer)
        if len(data) != self.frame_size:
            raise ValueError("scrap: geometry/palette mismatch")
        self._fh.write(data)
        self.nframes += 1

    def close(self):
        self._fh.close()


class ScrapReader:
    """Clip-like reader over a scrap file (usable as a Player source and by
    the native prefetcher via its fixed stride)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._fh = open(self.path, "rb")
        hdr = json.loads(self._fh.readline())
        if hdr.get("magic") != "lives_tpu_scrap":
            raise ValueError("not a scrap file")
        self.width = hdr["width"]
        self.height = hdr["height"]
        self.palette = hdr["palette"]
        self.fps = hdr["fps"]
        self.frame_size = hdr["frame_size"]
        self.data_start = self._fh.tell()
        import os
        self._fh.seek(0, os.SEEK_END)
        self.frames = (self._fh.tell() - self.data_start) // self.frame_size
        self.unique_id = hash(str(path)) & ((1 << 63) - 1)

    def get_frame(self, n: int) -> Layer:
        n = max(0, min(n, self.frames - 1))
        self._fh.seek(self.data_start + n * self.frame_size)
        buf = self._fh.read(self.frame_size)
        return layer_from_bytes(buf, self.width, self.height, self.palette)

    def close(self):
        self._fh.close()


class ScrapSink:
    """Player sink that tees frames into a scrap file."""

    palette_list = (Palette.RGB24,)

    def __init__(self, path: str | Path, inner=None):
        self.path = path
        self.inner = inner
        self._writer = None

    def init_screen(self, width: int, height: int, fps: float):
        self._writer = ScrapWriter(self.path, width, height,
                                   Palette.RGB24, fps)
        if self.inner:
            self.inner.init_screen(width, height, fps)

    def play_frame(self, layer: Layer, tc: float) -> bool:
        from ..ops.colorspace import convert_layer
        if self._writer is None:
            self._writer = ScrapWriter(self.path, layer.width, layer.height,
                                       Palette.RGB24)
        self._writer.write(convert_layer(layer, Palette.RGB24))
        return self.inner.play_frame(layer, tc) if self.inner else True

    def exit_screen(self):
        if self._writer:
            self._writer.close()
        if self.inner:
            self.inner.exit_screen()
