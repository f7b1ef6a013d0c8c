"""Clip model + on-disk clip format (reference `src/cliphandler.h:428`,
`docs/clip_format.txt`, `src/cvirtual.c`, `src/frameloader.c`).

A clip directory holds:
  header.lives   tagged text header (same <tag>value</tag> format and keys
                 as the reference, header_version 104)
  00000001.png…  real frames (numbered images)
  frame_index    little-endian int32 array: entry >= 0 -> decoder frame,
                 -1 -> numbered image (cvirtual.c:245 layout)
  audio          raw pcm (interleaved)

Virtual frames are served straight from a decoder; `realize()` materialises
them to images (reference `virtual_to_images`, cvirtual.c:1127).
"""

from __future__ import annotations

import enum
import random
import re
import struct
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

from ..constants import Gamma, Palette
from ..layer import Layer
from .decoders import ClipData, Decoder, try_decoders

try:
    from PIL import Image
    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

HEADER_VERSION = 104


class ClipType(enum.IntEnum):
    """cliphandler.h:86-95."""
    DISK = 0          # all frames are images on disk
    FILE = 1          # has virtual frames served by a decoder
    GENERATOR = 2
    NULL_VIDEO = 3
    YUV4MPEG = 4
    LIVES2LIVES = 5
    VIDEODEV = 6


@dataclass
class Clip:
    """lives_clip_t successor."""
    handle: str
    clip_dir: Path
    clip_type: ClipType = ClipType.DISK
    frames: int = 0
    fps: float = 25.0
    pb_fps: float = 0.0
    width: int = 0
    height: int = 0
    bpp: int = 24
    unique_id: int = field(default_factory=lambda: random.getrandbits(63))
    name: str = ""
    achans: int = 0
    arate: int = 0
    asampsize: int = 16
    asigned: bool = True
    aendian: int = 0
    gamma: int = Gamma.SRGB
    img_type: str = "png"
    frame_index: Optional[np.ndarray] = None   # int32; None = all images
    cdata: Optional[ClipData] = None
    #: original media uri — persisted so reload/recovery can reattach the
    #: decoder for virtual frames (reference stores file_name in the
    #: header, cliphandler.h)
    source_uri: str = ""
    # content generation: bumped whenever frame n -> pixels changes
    # (put_frame, index rewrites); frame caches key on it
    version: int = 0

    def close(self):
        """Release the decoder's native resources (close_clip analogue).
        Explicit close matters: the cdata<->decoder reference cycle defers
        GC, and libav contexts are ~MBs each."""
        if self.cdata is not None and self.cdata.decoder is not None:
            try:
                self.cdata.decoder.close()
            except Exception:
                pass

    # -- frame access ------------------------------------------------------
    def is_virtual_frame(self, n: int) -> bool:
        """cvirtual.c:1717. n is 0-based here (reference is 1-based)."""
        return self.frame_index is not None and self.frame_index[n] >= 0

    def image_path(self, n: int) -> Path:
        return self.clip_dir / f"{n + 1:08d}.{self.img_type}"

    def get_frame(self, n: int) -> Layer:
        """pull_frame successor (frameloader.c:2686): decoder frame or
        image file, as planar Layer."""
        import jax.numpy as jnp
        n = max(0, min(n, self.frames - 1)) if self.frames else 0
        if self.is_virtual_frame(n):
            return self.cdata.decoder.get_frame(int(self.frame_index[n]))
        if not HAVE_PIL:
            raise RuntimeError("PIL unavailable for image frames")
        with Image.open(self.image_path(n)) as im:
            has_a = "A" in im.getbands()
            arr = np.asarray(im.convert("RGBA" if has_a else "RGB"))
        pal = Palette.RGBA32 if has_a else Palette.RGB24
        return Layer(planes=(jnp.asarray(np.moveaxis(arr, -1, 0).copy()),),
                     palette=int(pal), gamma=int(self.gamma))

    def put_frame(self, n: int, layer: Layer):
        """Write a frame image (layer_to_png successor, frameloader.c:1985).
        tmp + os.replace: never truncate an existing image in place — a
        crash mid-write must not corrupt the frame, and undo snapshots
        hardlink image inodes (clipedit.snapshot_edit_undo)."""
        import os
        from ..ops.colorspace import convert_layer
        rgb = convert_layer(layer, Palette.RGB24)
        arr = np.moveaxis(np.asarray(rgb.planes[0]), 0, -1)
        dst = self.image_path(n)
        tmp = dst.with_suffix(dst.suffix + ".tmp")
        fmt = {"jpg": "JPEG", "jpeg": "JPEG"}.get(self.img_type.lower(),
                                                  self.img_type.upper())
        Image.fromarray(arr).save(tmp, format=fmt)
        os.replace(tmp, dst)
        if self.frame_index is not None:
            self.frame_index[n] = -1
        self.version += 1

    # -- frame_index ops (cvirtual.c) --------------------------------------
    def create_frame_index(self, all_virtual: bool = True):
        """cvirtual.c:133."""
        self.frame_index = (np.arange(self.frames, dtype=np.int32)
                            if all_virtual
                            else np.full(self.frames, -1, np.int32))

    def delete_frames(self, start: int, count: int):
        if self.frame_index is not None:
            self.frame_index = np.delete(self.frame_index,
                                         slice(start, start + count))
        self.frames -= count
        self.version += 1

    def insert_frames(self, at: int, entries: np.ndarray):
        if self.frame_index is None:
            self.create_frame_index(all_virtual=False)
        self.frame_index = np.insert(self.frame_index, at,
                                     entries.astype(np.int32))
        self.frames += len(entries)
        self.version += 1

    def reverse(self):
        """reverse_frame_index (cvirtual.c)."""
        if self.frame_index is not None:
            self.frame_index = self.frame_index[::-1].copy()
        self.version += 1

    def realize(self, start: int = 0, end: int | None = None,
                progress=None):
        """virtual_to_images (cvirtual.c:1127): materialise decoder frames
        to numbered images."""
        end = self.frames if end is None else end
        for n in range(start, end):
            if self.is_virtual_frame(n):
                self.put_frame(n, self.get_frame(n))
                if progress:
                    progress(n, end)

    # -- audio -------------------------------------------------------------
    @property
    def audio_path(self) -> Path:
        return self.clip_dir / "audio"

    def read_audio(self) -> np.ndarray:
        """(n, channels) float32 in [-1,1] from the raw pcm file."""
        if not self.audio_path.exists() or self.achans == 0:
            return np.zeros((0, max(self.achans, 1)), np.float32)
        raw = self.audio_path.read_bytes()
        if self.asampsize == 16:
            dt = "<i2" if self.aendian == 0 else ">i2"
            a = np.frombuffer(raw, dt).astype(np.float32) / 32768.0
        else:
            a = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        n = len(a) // self.achans
        return a[: n * self.achans].reshape(n, self.achans)

    def write_audio(self, data: np.ndarray, arate: int | None = None):
        data = np.atleast_2d(np.asarray(data, np.float32))
        if data.shape[0] < data.shape[1]:
            data = data.T
        self.achans = data.shape[1]
        if arate:
            self.arate = arate
        # symmetric with read_audio's /32768 so read->edit->write round
        # trips are sample-exact (chained Audio-menu ops must not decay
        # the track by 1 LSB per edit); +1.0 clamps to 32767
        i16 = np.clip(np.rint(data * 32768.0), -32768, 32767).astype("<i2")
        self.audio_path.write_bytes(i16.tobytes())
        self.asampsize, self.aendian, self.asigned = 16, 0, True

    # -- header ------------------------------------------------------------
    def save_header(self):
        t = []

        def tag(k, v):
            t.append(f"<{k}>\n{v}\n</{k}>")

        tag("header_version", HEADER_VERSION)
        tag("bpp", self.bpp)
        tag("frames", self.frames)
        tag("width", self.width)
        tag("height", self.height)
        tag("unique_id", self.unique_id)
        tag("fps", repr(self.fps))
        tag("pb_fps", repr(self.pb_fps))
        tag("audio_channels", self.achans)
        tag("audio_rate", self.arate)
        tag("audio_sample_size", self.asampsize)
        tag("audio_signed", "true" if self.asigned else "false")
        tag("audio_endian", self.aendian)
        tag("clipname", self.name)
        tag("img_type", self.img_type)
        tag("gamma_type", int(self.gamma))
        tag("clip_type", int(self.clip_type))
        if self.source_uri:
            tag("source_uri", self.source_uri)
        (self.clip_dir / "header.lives").write_text("\n".join(t) + "\n")
        if self.frame_index is not None:
            (self.clip_dir / "frame_index").write_bytes(
                self.frame_index.astype("<i4").tobytes())

    @classmethod
    def load(cls, clip_dir: str | Path) -> "Clip":
        clip_dir = Path(clip_dir)
        text = (clip_dir / "header.lives").read_text()

        def get(k, default=None, conv=str):
            m = re.search(rf"<{k}>\s*\n?(.*?)\n?\s*</{k}>", text, re.S)
            return conv(m.group(1).strip()) if m else default

        c = cls(handle=clip_dir.name, clip_dir=clip_dir)
        c.bpp = get("bpp", 24, int)
        c.frames = get("frames", 0, int)
        c.width = get("width", 0, int)
        c.height = get("height", 0, int)
        c.unique_id = get("unique_id", 0, int)
        c.fps = get("fps", 25.0, float)
        c.pb_fps = get("pb_fps", 0.0, float)
        c.achans = get("audio_channels", 0, int)
        c.arate = get("audio_rate", 0, int)
        c.asampsize = get("audio_sample_size", 16, int)
        c.asigned = get("audio_signed", "true") == "true"
        c.aendian = get("audio_endian", 0, int)
        c.name = get("clipname", "")
        c.img_type = get("img_type", "png")
        c.gamma = get("gamma_type", int(Gamma.SRGB), int)
        c.clip_type = ClipType(get("clip_type", 0, int))
        c.source_uri = get("source_uri", "")
        fi = clip_dir / "frame_index"
        if fi.exists():
            c.frame_index = np.frombuffer(fi.read_bytes(), "<i4").copy()
        if c.source_uri and c.frame_index is not None \
                and (c.frame_index >= 0).any():
            # virtual frames need their decoder back (reload_clip role,
            # clip_load_save.c:2208); a vanished source leaves cdata
            # None and check_integrity rejects the clip
            try:
                c.cdata = try_decoders(c.source_uri)
            except Exception:
                c.cdata = None
        return c

    def check_integrity(self) -> bool:
        """check_clip_integrity (cvirtual.c:532): frame_index entries in
        range, images present for -1 entries."""
        if self.frame_index is not None:
            if len(self.frame_index) != self.frames:
                return False
            if self.cdata is None and (self.frame_index >= 0).any():
                return False   # virtual frames but no decoder to serve them
            if self.cdata and (self.frame_index >= self.cdata.nframes).any():
                return False
            for n in np.nonzero(self.frame_index < 0)[0][:64]:
                if not self.image_path(int(n)).exists():
                    return False
        return True


# ---------------------------------------------------------------------------
# Opening / creating clips (clip_load_save.c:3570 open_file)
# ---------------------------------------------------------------------------

_handle_counter = 0


def _new_handle() -> str:
    global _handle_counter
    _handle_counter += 1
    return f"clip{_handle_counter:05d}_{random.getrandbits(24):06x}"


def open_clip(uri: str, workdir: str | Path) -> Clip:
    """Open a media URI: decoder claims it -> CLIP_TYPE_FILE with an
    all-virtual frame index; else raises (the reference would fall back to
    frame extraction via mplayer/ffmpeg)."""
    workdir = Path(workdir)
    cd = try_decoders(uri)
    if cd is None:
        raise ValueError(f"no decoder claims {uri!r}")
    handle = _new_handle()
    clip_dir = workdir / handle
    clip_dir.mkdir(parents=True, exist_ok=True)
    c = Clip(handle=handle, clip_dir=clip_dir, clip_type=ClipType.FILE,
             frames=cd.nframes, fps=cd.fps, width=cd.width,
             height=cd.height, name=Path(uri).name, cdata=cd,
             source_uri=str(uri))
    c.create_frame_index(all_virtual=True)
    if cd.decoder and cd.achans:
        if cd.decoder.rip_audio(str(c.audio_path)):
            c.achans, c.arate = cd.achans, cd.arate
    c.save_header()
    return c


def create_clip(workdir: str | Path, width: int, height: int,
                fps: float = 25.0, name: str = "") -> Clip:
    """New empty (to-be-rendered-into) clip."""
    workdir = Path(workdir)
    handle = _new_handle()
    clip_dir = workdir / handle
    clip_dir.mkdir(parents=True, exist_ok=True)
    c = Clip(handle=handle, clip_dir=clip_dir, clip_type=ClipType.DISK,
             width=width, height=height, fps=fps, name=name)
    c.save_header()
    return c


def md5_frame(clip: Clip, n: int) -> str:
    """Frame identity hash (reference md5_frame, frameloader.c:2189):
    virtual frames hash (decoder uri, decoder frame); image frames hash
    the file bytes. Used for duplicate detection and cache identity."""
    import hashlib
    if clip.is_virtual_frame(n):
        key = f"{clip.cdata.uri}#{int(clip.frame_index[n])}".encode()
        return hashlib.md5(key).hexdigest()
    p = clip.image_path(n)
    return hashlib.md5(p.read_bytes()).hexdigest()
