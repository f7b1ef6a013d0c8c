"""Decoder services — the decplugin contract, host-side.

Mirrors the reference decoder-plugin API (`/root/reference/lives-plugins/
plugins/decoders/decplugin.h`): a decoder claims a URI and returns clip data
(`get_clip_data`), then serves frames by index (`get_frame`), estimates seek
cost (`estimate_delay`, decplugin.h:305) to drive the player's prefetcher,
and can rip audio. Decoders run on host CPU; their output feeds the TPU
ingest path as planar Layers.

Built-in decoders (no external binaries): numbered image sequences (PIL),
YUV4MPEG2 streams (exact fit for the planar YUV420 device layout), and
MJPEG/raw AVI. Compressed codecs (H.264/HEVC/Theora/VP8/VP9/MPEG-4/DV in
mkv/mp4/avi/ogg/webm/ts/flv/asf) decode through the IN-PROCESS libav
bridge (`io/av.py` + native/avbridge.cpp); an ffmpeg-subprocess decoder
additionally registers when the binary exists.
"""

from __future__ import annotations

import os
import re
import shutil
import struct
import subprocess
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from ..constants import Gamma, Palette, YUVClamping, YUVSampling, YUVSubspace
from ..layer import Layer

try:
    from PIL import Image
    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False


@dataclass
class ClipData:
    """lives_clip_data_t analogue (decplugin.h:~180-267)."""
    uri: str
    nframes: int = 0
    fps: float = 25.0
    width: int = 0
    height: int = 0
    palette: int = Palette.RGB24
    yuv_clamping: int = YUVClamping.CLAMPED
    yuv_sampling: int = YUVSampling.DEFAULT
    yuv_subspace: int = YUVSubspace.YCBCR
    gamma: int = Gamma.SRGB
    par: float = 1.0            # pixel aspect ratio
    arate: int = 0
    achans: int = 0
    asamps: int = 16
    asigned: bool = True
    interlace: int = 0
    # seek model (adv_timing_t analogue, decplugin.h:70-88)
    kframe_dist: int = 1        # keyframe spacing; 1 = all intra
    const_time_per_frame: float = 0.001

    decoder: "Decoder | None" = None


class Decoder:
    """Base decoder. Subclasses claim URIs and serve frames."""

    name = "base"

    @classmethod
    def get_clip_data(cls, uri: str) -> Optional[ClipData]:
        """Return ClipData if this decoder can handle uri, else None."""
        return None

    def get_frame(self, n: int) -> Layer:
        raise NotImplementedError

    def rip_audio(self, path: str) -> bool:
        """Extract raw pcm audio to path; False if no audio."""
        return False

    def estimate_delay(self, from_frame: int, to_frame: int) -> float:
        """Seek+decode cost estimate in seconds (decplugin.h:305)."""
        cd = self.cdata
        if to_frame >= from_frame and to_frame - from_frame < cd.kframe_dist:
            return (to_frame - from_frame) * cd.const_time_per_frame
        back = to_frame % max(cd.kframe_dist, 1)
        return (back + 1) * cd.const_time_per_frame

    def close(self):
        pass


_DECODERS: list[type[Decoder]] = []


def register_decoder(cls: type[Decoder]) -> type[Decoder]:
    _DECODERS.append(cls)
    return cls


def try_decoders(uri: str) -> Optional[ClipData]:
    """Probe decoders in order (reference try_decoder_plugins,
    src/plugins.c:2647)."""
    for cls in _DECODERS:
        try:
            cd = cls.get_clip_data(uri)
        except Exception:
            cd = None
        if cd is not None:
            return cd
    return None


# ---------------------------------------------------------------------------
# Image sequence decoder (the reference's CLIP_TYPE_DISK path)
# ---------------------------------------------------------------------------

@register_decoder
class ImageSeqDecoder(Decoder):
    """Directory of numbered images (00000001.png ...)."""

    name = "imageseq"

    def __init__(self, cdata: ClipData, files: list[Path]):
        self.cdata = cdata
        self.files = files

    @classmethod
    def get_clip_data(cls, uri: str):
        p = Path(uri)
        if not (HAVE_PIL and p.is_dir()):
            return None
        # numeric sort: unpadded sequences (1, 2, ..., 10) must not play
        # in lexicographic order
        files = sorted([f for f in p.iterdir()
                        if re.fullmatch(r"\d+\.(png|jpg|jpeg)", f.name)],
                       key=lambda f: int(f.stem))
        if not files:
            return None
        with Image.open(files[0]) as im:
            w, h = im.size
        cd = ClipData(uri=uri, nframes=len(files), width=w, height=h,
                      palette=int(Palette.RGB24), fps=25.0)
        cd.decoder = cls(cd, files)
        return cd

    def get_frame(self, n: int) -> Layer:
        with Image.open(self.files[n]) as im:
            has_a = im.mode in ("RGBA", "LA", "PA")
            im = im.convert("RGBA" if has_a else "RGB")
            arr = np.asarray(im)
        chans = np.moveaxis(arr, -1, 0)
        pal = Palette.RGBA32 if has_a else Palette.RGB24
        import jax.numpy as jnp
        return Layer(planes=(jnp.asarray(chans),), palette=int(pal),
                     gamma=int(Gamma.SRGB))


# ---------------------------------------------------------------------------
# YUV4MPEG2 decoder (reference src/lives-yuv4mpeg.c ingest path)
# ---------------------------------------------------------------------------

@register_decoder
class Y4MDecoder(Decoder):
    name = "yuv4mpeg"

    #: frames of readahead issued to the native cache per access
    READAHEAD = 8

    def __init__(self, cdata: ClipData, path: Path, data_start: int,
                 frame_size: int, header_skip: int, offsets=None):
        self.cdata = cdata
        self.path = path
        self.data_start = data_start
        self.frame_size = frame_size
        self.header_skip = header_skip
        #: per-frame payload offsets when FRAME headers vary in length
        #: (YUV4MPEG2 allows per-frame parameters, e.g. ``FRAME Ix\n``);
        #: None = constant stride fast path
        self.offsets = offsets
        self._fh = open(path, "rb")
        import threading
        self._lock = threading.Lock()  # precache + main thread share _fh
        self._cache = None
        if offsets is None:
            self.enable_prefetch()

    def enable_prefetch(self, n_slots: int = 32, workers: int = 2):
        """Route reads through the native async frame cache
        (native/framecache.cpp) when the toolchain allows; silently stays
        on plain python IO otherwise."""
        try:
            from ..native import FrameCache
            fc = FrameCache(n_slots, self.frame_size, workers)
            ok = fc.open_stream(str(self.path),
                                self.data_start + self.header_skip,
                                self.frame_size,
                                self.frame_size + self.header_skip,
                                self.cdata.nframes)
            self._cache = fc if ok else None
        except Exception:
            self._cache = None

    @classmethod
    def get_clip_data(cls, uri: str):
        p = Path(uri)
        if not (p.is_file() and p.suffix.lower() in (".y4m", ".yuv4mpeg")):
            return None
        with open(p, "rb") as fh:
            header = fh.readline()
            if not header.startswith(b"YUV4MPEG2"):
                return None
            w = h = 0
            fps = 25.0
            for tok in header.split()[1:]:
                t = tok.decode()
                if t[0] == "W":
                    w = int(t[1:])
                elif t[0] == "H":
                    h = int(t[1:])
                elif t[0] == "F":
                    num, den = t[1:].split(":")
                    fps = int(num) / int(den)
                elif t[0] == "C" and not t[1:].startswith("420"):
                    return None  # only 420 for now
            data_start = fh.tell()
            frame_size = w * h * 3 // 2
            # scan every FRAME header: the spec allows per-frame parameters,
            # so header length may vary — in that case fall back to an
            # explicit per-frame offset index (sequential parse)
            import os as _os
            file_size = _os.fstat(fh.fileno()).st_size
            offsets = []
            header_skip = None
            constant = True
            while True:
                frame_hdr = fh.readline()
                if not frame_hdr:
                    break
                if not frame_hdr.startswith(b"FRAME"):
                    return None
                if header_skip is None:
                    header_skip = len(frame_hdr)
                elif len(frame_hdr) != header_skip:
                    constant = False
                pos = fh.tell()
                # seeking past EOF "succeeds" on regular files: bound by
                # the real file size so a truncated last frame is excluded
                if pos + frame_size > file_size:
                    break
                offsets.append(pos)
                fh.seek(pos + frame_size)
            if header_skip is None:
                return None
            nframes = len(offsets)
        cd = ClipData(uri=uri, nframes=nframes, width=w, height=h, fps=fps,
                      palette=int(Palette.YUV420P),
                      yuv_clamping=int(YUVClamping.CLAMPED))
        cd.decoder = cls(cd, p, data_start, frame_size, header_skip,
                         offsets=None if constant else offsets)
        return cd

    def get_frame(self, n: int) -> Layer:
        import jax.numpy as jnp
        buf = None
        if self._cache is not None:
            self._cache.request(n, min(self.READAHEAD,
                                       self.cdata.nframes - n))
            buf = self._cache.get(n)
        if buf is None:
            if self.offsets is not None:
                ofs = self.offsets[n]
            else:
                ofs = self.data_start \
                    + n * (self.frame_size + self.header_skip) \
                    + self.header_skip
            with self._lock:
                self._fh.seek(ofs)
                buf = self._fh.read(self.frame_size)
        w, h = self.cdata.width, self.cdata.height
        y = np.frombuffer(buf[: w * h], np.uint8).reshape(h, w)
        cs = (w // 2) * (h // 2)
        u = np.frombuffer(buf[w * h: w * h + cs], np.uint8
                          ).reshape(h // 2, w // 2)
        v = np.frombuffer(buf[w * h + cs:], np.uint8).reshape(h // 2, w // 2)
        return Layer(planes=(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)),
                     palette=int(Palette.YUV420P),
                     clamping=self.cdata.yuv_clamping,
                     subspace=self.cdata.yuv_subspace)

    def close(self):
        self._fh.close()


class Y4MStreamSource:
    """Sequential YUV4MPEG2 reader for non-seekable inputs (named pipes /
    stdin) — the reference's yuv4mpeg fifo ingest (src/lives-yuv4mpeg.c).
    Clip-like: get_frame(n) returns the NEXT frame in the stream."""

    def __init__(self, fh_or_path):
        self._fh = open(fh_or_path, "rb") if isinstance(fh_or_path,
                                                        (str, Path)) \
            else fh_or_path
        header = self._fh.readline()
        if not header.startswith(b"YUV4MPEG2"):
            raise ValueError("not a YUV4MPEG2 stream")
        self.width = self.height = 0
        self.fps = 25.0
        for tok in header.split()[1:]:
            t = tok.decode()
            if t[0] == "W":
                self.width = int(t[1:])
            elif t[0] == "H":
                self.height = int(t[1:])
            elif t[0] == "F":
                num, den = t[1:].split(":")
                self.fps = int(num) / int(den)
        self.frames = 1 << 30
        self.unique_id = 0x59344D  # 'Y4M'
        self.scrap_on_record = True  # live feed: recordings scrap frames
        self._last = None

    def get_frame(self, n: int = 0) -> "Layer":
        import jax.numpy as jnp
        line = self._fh.readline()
        if not line.startswith(b"FRAME"):
            if self._last is not None:
                return self._last  # EOF: hold last frame
            raise EOFError("y4m stream ended")
        w, h = self.width, self.height
        buf = self._fh.read(w * h * 3 // 2)
        if len(buf) < w * h * 3 // 2:
            if self._last is not None:
                return self._last  # stream died mid-frame: hold
            raise EOFError("y4m stream ended mid-frame")
        y = np.frombuffer(buf[: w * h], np.uint8).reshape(h, w)
        cs = (w // 2) * (h // 2)
        u = np.frombuffer(buf[w * h: w * h + cs], np.uint8
                          ).reshape(h // 2, w // 2)
        v = np.frombuffer(buf[w * h + cs:], np.uint8).reshape(h // 2, w // 2)
        self._last = Layer(
            planes=(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)),
            palette=int(Palette.YUV420P))
        return self._last

    def close(self):
        self._fh.close()


def write_y4m(path: str, frames_yuv420, fps: float = 25.0):
    """Write (Y,U,V) planar uint8 frame tuples as YUV4MPEG2."""
    first = frames_yuv420[0]
    h, w = first[0].shape
    num, den = int(round(fps * 1001)), 1001
    if abs(fps - round(fps)) < 1e-6:
        num, den = int(round(fps)), 1
    with open(path, "wb") as fh:
        fh.write(f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 C420jpeg\n"
                 .encode())
        for (y, u, v) in frames_yuv420:
            fh.write(b"FRAME\n")
            fh.write(np.asarray(y, np.uint8).tobytes())
            fh.write(np.asarray(u, np.uint8).tobytes())
            fh.write(np.asarray(v, np.uint8).tobytes())


@register_decoder
class WavDecoder(Decoder):
    """RIFF WAVE pcm: audio-only clips (the reference opens audio files as
    zero-video clips with audio)."""

    name = "wav"

    def __init__(self, cdata, path, data_ofs, data_len):
        self.cdata = cdata
        self.path = path
        self.data_ofs = data_ofs
        self.data_len = data_len

    @classmethod
    def get_clip_data(cls, uri: str):
        p = Path(uri)
        if not (p.is_file() and p.suffix.lower() == ".wav"):
            return None
        import mmap
        with open(p, "rb") as fh:
            try:
                data = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ)
            except (ValueError, OSError):
                return None
            try:
                return cls._probe_wav(uri, p, data)
            finally:
                data.close()

    @classmethod
    def _probe_wav(cls, uri, p, data):
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            return None
        pos = 12
        fmt = None
        data_ofs = data_len = 0
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            (sz,) = struct.unpack("<I", data[pos + 4:pos + 8])
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", data[pos + 8:pos + 24])
            elif cid == b"data":
                data_ofs, data_len = pos + 8, sz
            pos += 8 + sz + (sz & 1)
        if fmt is None or not data_len:
            return None
        tag, channels, rate, _, _, bits = fmt
        if tag not in (1, 3) or bits not in (8, 16, 24, 32):
            return None  # 1=PCM, 3=IEEE float; exotic formats -> libav
        cd = ClipData(uri=uri, nframes=0, fps=25.0, width=0, height=0,
                      arate=rate, achans=channels, asamps=16)
        cd.decoder = cls(cd, p, data_ofs, data_len)
        cd.decoder._fmt = (tag, bits)
        return cd

    def get_frame(self, n: int) -> Layer:
        raise RuntimeError("wav clips have no video frames")

    def rip_audio(self, path: str) -> bool:
        """Clip audio is s16le by contract (Clip.read_audio parses '<i2');
        convert 8/24/32-bit PCM and 32-bit float on the way."""
        with open(self.path, "rb") as fh:
            fh.seek(self.data_ofs)
            raw = fh.read(self.data_len)
        tag, bits = getattr(self, "_fmt", (1, 16))
        if tag == 3 and bits == 32:  # IEEE float
            f = np.frombuffer(raw, "<f4")
            pcm = np.clip(f * 32767.0, -32768, 32767).astype("<i2")
        elif bits == 8:              # unsigned 8-bit
            pcm = ((np.frombuffer(raw, np.uint8).astype(np.int16) - 128)
                   << 8).astype("<i2")
        elif bits == 24:
            b = np.frombuffer(raw[: len(raw) - len(raw) % 3], np.uint8)
            b = b.reshape(-1, 3)
            v = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            pcm = (v >> 8).astype("<i2")
        elif bits == 32:             # 32-bit int PCM
            pcm = (np.frombuffer(raw, "<i4") >> 16).astype("<i2")
        else:                        # already s16le
            Path(path).write_bytes(raw)
            return True
        Path(path).write_bytes(pcm.tobytes())
        return True


# ---------------------------------------------------------------------------
# AVI decoder: MJPEG + raw DIB, pure-python RIFF parse
# ---------------------------------------------------------------------------

def write_mjpeg_avi(path, jpeg_frames, width: int, height: int,
                    fps: float = 25.0):
    """Minimal MJPEG AVI writer (RIFF avih/strh/strf + movi 00dc chunks +
    idx1) — enough for AVIDecoder and any libjpeg-based player. Streams:
    `jpeg_frames` may be any iterable (hour-long scrap captures must not
    be buffered whole); the frame count and sizes are backpatched."""

    def chunk(cid, payload):
        pad = b"\0" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    rate = int(round(fps * 1000))

    def avih(n):
        return struct.pack("<IIIIIIIIIIIIII", int(1e6 / fps), 0, 0, 0x10,
                           n, 0, 1, 0, width, height, 0, 0, 0, 0)

    def strh(n):
        return (b"vids" + b"MJPG"
                + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1000, rate,
                              0, n, 0, 0xFFFFFFFF, 0, 0))

    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)

    def hdrl(n):
        return chunk(b"LIST", b"hdrl" + chunk(b"avih", avih(n))
                     + chunk(b"LIST", b"strl" + chunk(b"strh", strh(n))
                             + chunk(b"strf", strf)))

    with open(path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 0))   # size backpatched
        fh.write(b"AVI " + hdrl(0))                # counts backpatched
        movi_start = fh.tell()
        fh.write(b"LIST" + struct.pack("<I", 0) + b"movi")
        idx = bytearray()
        off = 4
        n = 0
        for f in jpeg_frames:
            fh.write(chunk(b"00dc", f))
            idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
            off += 8 + len(f) + (len(f) & 1)
            n += 1
        movi_end = fh.tell()
        fh.write(chunk(b"idx1", bytes(idx)))
        total = fh.tell()
        fh.seek(movi_start + 4)
        fh.write(struct.pack("<I", movi_end - movi_start - 8))
        fh.seek(4)
        fh.write(struct.pack("<I", total - 8))
        fh.seek(12)
        fh.write(hdrl(n))


@register_decoder
class AVIDecoder(Decoder):
    name = "avi"

    def __init__(self, cdata: ClipData, path: Path, offsets: list[tuple[int, int]],
                 fourcc: str, topdown: bool = False):
        self.cdata = cdata
        self.path = path
        self.offsets = offsets
        self.fourcc = fourcc
        # negative biHeight = top-down DIB rows (no flip needed)
        self.topdown = topdown
        self._fh = open(path, "rb")

    @classmethod
    def get_clip_data(cls, uri: str):
        p = Path(uri)
        if not (p.is_file() and p.suffix.lower() == ".avi"):
            return None
        # mmap, not read_bytes: the probe touches only chunk headers, so a
        # 2 GB file pages in KBs instead of loading whole into RAM
        import mmap
        fh = open(p, "rb")
        try:
            data = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ)
        except (ValueError, OSError):
            fh.close()
            return None
        if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
            data.close()
            fh.close()
            return None
        # strh/strf for the vids stream
        try:
            return cls._probe_avi(uri, p, data)
        finally:
            data.close()
            fh.close()

    @classmethod
    def _probe_avi(cls, uri, p, data):
        i = data.find(b"strh")
        if i < 0 or data[i + 8: i + 12] != b"vids":
            return None
        fourcc = data[i + 12: i + 16].decode("latin1").strip("\0 ").upper()
        scale, rate = struct.unpack("<II", data[i + 28: i + 36])
        fps = rate / scale if scale else 25.0
        j = data.find(b"strf", i)
        w, h = struct.unpack("<ii", data[j + 12: j + 20])
        if fourcc not in ("MJPG", "DIB", ""):
            return None  # compressed codecs need ffmpeg
        if fourcc == "MJPG" and not HAVE_PIL:
            return None
        # scan movi chunks
        m = data.find(b"movi")
        offsets = []
        pos = m + 4
        while pos + 8 <= len(data):
            cid = data[pos: pos + 4]
            (sz,) = struct.unpack("<I", data[pos + 4: pos + 8])
            if cid == b"LIST":
                # interleave groups ('rec ') wrap frame chunks: recurse by
                # stepping INTO the list (past its 4-byte type), not over it
                pos += 12
                continue
            if cid[2:4] in (b"db", b"dc"):
                offsets.append((pos + 8, sz))
            if cid == b"idx1" or sz == 0 and cid[:4] == b"\0\0\0\0":
                break
            pos += 8 + sz + (sz & 1)
        if not offsets:
            return None
        cd = ClipData(uri=uri, nframes=len(offsets), width=w, height=abs(h),
                      fps=fps, palette=int(Palette.RGB24))
        cd.decoder = cls(cd, p, offsets, fourcc, topdown=h < 0)
        return cd

    def get_frame_bytes(self, n: int) -> bytes:
        """Raw codec chunk (the JPEG bitstream for MJPG streams) — the
        compressed device-side ingest path (io/jpeg_ingest.py) consumes
        these instead of host-decoded pixels."""
        ofs, sz = self.offsets[n]
        self._fh.seek(ofs)
        return self._fh.read(sz)

    def get_frame_device(self, n: int) -> Layer:
        """Per-frame compressed-domain decode: host entropy pass + device
        dequant/IDCT (io/jpeg_ingest.py) — ~7x less upload than raw
        pixels on remote-attached TPUs. The live player prefers this lane
        for MJPG when available; get_frame keeps the host-decode
        contract. Raises for non-MJPG streams or when the libjpeg bridge
        is absent (caller falls back)."""
        if self.fourcc != "MJPG":
            raise RuntimeError("device decode is MJPG-only")
        src = getattr(self, "_jsrc", None)
        if src is None:
            from .jpeg_ingest import (MJPEGClipSource, load_jpegcoef)
            if load_jpegcoef() is None:
                raise RuntimeError("jpegcoef bridge unavailable")
            src = MJPEGClipSource(self)
            self._jsrc = src
        return self.get_frames_device([n])[0]

    def get_frames_device(self, ns) -> list[Layer]:
        """Batched compressed-domain decode: ONE host entropy-pack pass,
        ONE upload set, ONE device dispatch for the whole batch, split
        into per-frame Layers inside that same jit (3B output buffers,
        zero per-frame dispatches). This is what lets the precache worker
        amortise the tunnel RPC cost across its look-ahead window —
        per-frame get_frame_device pays the full dispatch latency every
        frame. Reference contract: decplugin.h:280 get_frame, widened."""
        if self.fourcc != "MJPG":
            raise RuntimeError("device decode is MJPG-only")
        src = getattr(self, "_jsrc", None)
        if src is None:
            from .jpeg_ingest import (MJPEGClipSource, load_jpegcoef)
            if load_jpegcoef() is None:
                raise RuntimeError("jpegcoef bridge unavailable")
            src = MJPEGClipSource(self)
            self._jsrc = src
        lay = src.get_batch(None, list(ns))
        from .jpeg_ingest import split_layer_batch
        return split_layer_batch(lay)

    def get_frame(self, n: int) -> Layer:
        import io as _io
        import jax.numpy as jnp
        ofs, sz = self.offsets[n]
        self._fh.seek(ofs)
        raw = self._fh.read(sz)
        w, h = self.cdata.width, self.cdata.height
        if self.fourcc == "MJPG":
            with Image.open(_io.BytesIO(raw)) as im:
                arr = np.asarray(im.convert("RGB"))
        else:  # raw DIB: bottom-up BGR rows, 4-byte aligned
            stride = (w * 3 + 3) & ~3
            arr = np.frombuffer(raw[: stride * h], np.uint8
                                ).reshape(h, stride)[:, : w * 3]
            arr = arr.reshape(h, w, 3)[:, :, ::-1]
            if not self.topdown:  # bottom-up rows (positive biHeight)
                arr = arr[::-1]
        chans = np.moveaxis(arr, -1, 0).copy()
        return Layer(planes=(jnp.asarray(chans),),
                     palette=int(Palette.RGB24), gamma=int(Gamma.SRGB))

    def close(self):
        self._fh.close()


# ---------------------------------------------------------------------------
# ffmpeg-backed decoder (only when the binary exists; the reference's
# zzavformat equivalent)
# ---------------------------------------------------------------------------

FFMPEG = shutil.which("ffmpeg")
FFPROBE = shutil.which("ffprobe")


@register_decoder
class FFmpegDecoder(Decoder):
    name = "ffmpeg"

    def __init__(self, cdata: ClipData):
        self.cdata = cdata

    @classmethod
    def get_clip_data(cls, uri: str):
        if not (FFMPEG and FFPROBE and Path(uri).is_file()):
            return None
        try:
            out = subprocess.run(
                [FFPROBE, "-v", "quiet", "-select_streams", "v:0",
                 "-show_entries",
                 "stream=width,height,nb_frames,r_frame_rate",
                 "-of", "csv=p=0", uri],
                capture_output=True, text=True, timeout=30).stdout.strip()
            w, h, fps_s, nf = out.split(",")[:4]
            num, den = fps_s.split("/")
            cd = ClipData(uri=uri, nframes=int(nf) if nf.isdigit() else 0,
                          width=int(w), height=int(h),
                          fps=int(num) / int(den))
            cd.decoder = cls(cd)
            return cd
        except Exception:
            return None

    def get_frame(self, n: int) -> Layer:
        import jax.numpy as jnp
        cd = self.cdata
        t = n / cd.fps
        need = cd.width * cd.height * 3

        def grab(ts):
            return subprocess.run(
                [FFMPEG, "-v", "quiet", "-ss", f"{ts:.6f}", "-i", cd.uri,
                 "-frames:v", "1", "-f", "rawvideo", "-pix_fmt", "rgb24",
                 "-"],
                capture_output=True, timeout=60).stdout

        out = grab(t)
        if len(out) < need and t > 0:
            # VFR tails overshoot the duration: retry a frame earlier,
            # then fall back to black rather than crashing the render
            out = grab(max(t - 1.0 / cd.fps, 0.0))
        if len(out) < need:
            out = bytes(need)
        arr = np.frombuffer(out[:need], np.uint8
                            ).reshape(cd.height, cd.width, 3)
        return Layer(planes=(jnp.asarray(np.moveaxis(arr, -1, 0).copy()),),
                     palette=int(Palette.RGB24))
