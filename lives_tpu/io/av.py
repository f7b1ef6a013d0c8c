"""In-process libav decoder/encoder (ctypes over native/avbridge.cpp).

The reference ships 8 dlopen decoder plugins (mkv/mpegts/asf/flv/ogg/dv/
avformat, `/root/reference/lives-plugins/plugins/decoders/`, contract in
`decplugin.h`: get_clip_data :~180, `get_frame` :280, `rip_audio` :294,
`estimate_delay` :305) plus Perl encoder plugins. This module supplies both
capabilities through one native bridge linked against the system
libavformat/libavcodec — no external binary, decode runs in-process exactly
like the reference's plugins.

Decoded frames surface as planar YUV420P layers with the container's real
range/subspace metadata, so the TPU colour engine (ops/colorspace.py) does
the conversion on device — the host never touches pixels beyond the decode
itself.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from ..constants import (Gamma, Palette, YUVClamping, YUVSubspace)
from ..layer import Layer
from .decoders import ClipData, Decoder, register_decoder

SRC = Path(__file__).resolve().parents[2] / "native" / "avbridge.cpp"
SO = SRC.with_suffix(".so")

_LIB = None
_TRIED = False

#: containers the reference's decoder plugins claim (plus the modern ones)
VIDEO_EXTS = {".mkv", ".mp4", ".m4v", ".mov", ".avi", ".webm", ".ogv",
              ".ogg", ".ogm", ".mpg", ".mpeg", ".ts", ".m2ts", ".mts",
              ".flv", ".asf", ".wmv", ".dv", ".3gp", ".vob", ".divx",
              ".gif",
              ".rm", ".h264", ".264"}


def load_avbridge():
    """Build + load the bridge; None when lib{av*} or g++ are missing."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not SO.exists() or SO.stat().st_mtime < SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                 "-o", str(SO), str(SRC),
                 "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
                 "-lswresample"],
                check=True, capture_output=True, timeout=180)
        lib = ctypes.CDLL(str(SO))
        lib.avb_open.restype = ctypes.c_void_p
        lib.avb_open.argtypes = [ctypes.c_char_p]
        lib.avb_open_mode.restype = ctypes.c_void_p
        lib.avb_open_mode.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.avb_next_frame.restype = ctypes.c_int
        lib.avb_next_frame.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_uint8)]
        lib.avb_info.restype = ctypes.c_int
        lib.avb_info.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int64)]
        lib.avb_codec_name.restype = ctypes.c_char_p
        lib.avb_codec_name.argtypes = [ctypes.c_void_p]
        lib.avb_seek_cost.restype = ctypes.c_int64
        lib.avb_seek_cost.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int64]
        lib.avb_get_frame.restype = ctypes.c_int
        lib.avb_get_frame.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.POINTER(ctypes.c_uint8)]
        lib.avb_rip_audio.restype = ctypes.c_int64
        lib.avb_rip_audio.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.avb_close.argtypes = [ctypes.c_void_p]
        lib.avb_enc_open.restype = ctypes.c_void_p
        lib.avb_enc_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.avb_enc_open2.restype = ctypes.c_void_p
        lib.avb_enc_open2.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.avb_enc_video.restype = ctypes.c_int
        lib.avb_enc_video.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_uint8),
                                      ctypes.c_int]
        lib.avb_enc_audio.restype = ctypes.c_int
        lib.avb_enc_audio.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int16),
                                      ctypes.c_int64]
        lib.avb_enc_close.restype = ctypes.c_int
        lib.avb_enc_close.argtypes = [ctypes.c_void_p]
        lib.avb_have_encoder.restype = ctypes.c_int
        lib.avb_have_encoder.argtypes = [ctypes.c_char_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


@register_decoder
class AVDecoder(Decoder):
    """Compressed-media decoder over the native bridge (H.264/HEVC/Theora/
    VP8/VP9/MPEG-4/MJPEG/DV/WMV in mkv/mp4/avi/ogg/webm/mpegts/flv/asf/dv
    containers — the reference's full decoder-plugin surface)."""

    name = "avformat"

    def __init__(self, cdata: ClipData, handle):
        import threading
        self.cdata = cdata
        self._h = handle
        self._lib = load_avbridge()
        w, h = cdata.width, cdata.height
        self._buf = (ctypes.c_uint8 * (w * h + 2 * (w // 2) * (h // 2)))()
        # one native decoder handle is stateful (seek + warm position):
        # the player's precache thread and main loop both pull frames, so
        # serialise access (the reference instead clones decoders per
        # srcgroup; a lock is the single-clone equivalent)
        self._lock = threading.Lock()

    @classmethod
    def get_clip_data(cls, uri: str) -> Optional[ClipData]:
        p = Path(uri)
        if not (p.is_file() and p.suffix.lower() in VIDEO_EXTS):
            return None
        lib = load_avbridge()
        if lib is None:
            return None
        h = lib.avb_open(str(p).encode())
        if not h:
            return None
        info = (ctypes.c_int64 * 11)()
        lib.avb_info(h, info)
        w, hh, num, den, nframes, has_a, arate, achans, inter, full, bt709 \
            = [int(v) for v in info]
        if w <= 0 or nframes <= 0:
            if has_a and arate > 0:
                # audio-only media: WavDecoder-style clip (video absent)
                cd = ClipData(uri=uri, nframes=0, width=0, height=0,
                              fps=25.0, arate=arate, achans=achans)
                cd.decoder = cls.__new__(cls)
                cd.decoder.cdata = cd
                cd.decoder._h = h
                cd.decoder._lib = lib
                cd.decoder._buf = None
                return cd
            lib.avb_close(h)
            return None
        # keyframe spacing feeds the precache seek-cost ordering
        cost_cold = int(lib.avb_seek_cost(h, -1, nframes - 1))
        cd = ClipData(
            uri=uri, nframes=nframes, width=w, height=hh,
            fps=(num / den) if den else 25.0,
            palette=int(Palette.YUV420P),
            yuv_clamping=int(YUVClamping.UNCLAMPED if full
                             else YUVClamping.CLAMPED),
            yuv_subspace=int(YUVSubspace.BT709 if bt709
                             else YUVSubspace.YCBCR),
            gamma=int(Gamma.SRGB),
            arate=arate, achans=achans, interlace=inter,
            kframe_dist=max(1, cost_cold))
        cd.decoder = cls(cd, h)
        return cd

    @property
    def codec(self) -> str:
        return self._lib.avb_codec_name(self._h).decode()

    def get_frame(self, n: int) -> Layer:
        import jax.numpy as jnp
        cd = self.cdata
        n = max(0, min(int(n), cd.nframes - 1))
        with self._lock:
            if not self._lib.avb_get_frame(self._h, n, self._buf):
                raise IOError(f"avbridge: decode of frame {n} failed")
            w, h = cd.width, cd.height
            a = np.frombuffer(self._buf, np.uint8)
            y = a[: w * h].reshape(h, w).copy()
            cs = (w // 2) * (h // 2)
            u = a[w * h: w * h + cs].reshape(h // 2, w // 2).copy()
            v = a[w * h + cs:].reshape(h // 2, w // 2).copy()
        return Layer(planes=(jnp.asarray(y), jnp.asarray(u),
                             jnp.asarray(v)),
                     palette=int(Palette.YUV420P),
                     clamping=cd.yuv_clamping, subspace=cd.yuv_subspace)

    def rip_audio(self, path: str) -> bool:
        if not self.cdata.arate:
            return False
        lock = getattr(self, "_lock", None)
        if lock is None:  # audio-only clips built via __new__
            return self._lib.avb_rip_audio(self._h, str(path).encode()) > 0
        with lock:
            return self._lib.avb_rip_audio(self._h,
                                           str(path).encode()) > 0

    def estimate_delay(self, from_frame: int, to_frame: int) -> float:
        cost = int(self._lib.avb_seek_cost(self._h, from_frame, to_frame))
        return cost * self.cdata.const_time_per_frame

    def close(self):
        if getattr(self, "_h", None):
            self._lib.avb_close(self._h)
            self._h = None

    def __del__(self):  # native handles must not outlive the wrapper
        try:
            self.close()
        except Exception:
            pass


# the in-process bridge outranks the ffmpeg-subprocess fallback in the
# probe order (both claim the same containers; in-process is faster and
# always present when libav is)
def _prioritise_over_subprocess():
    from .decoders import _DECODERS
    try:
        from .decoders import FFmpegDecoder
    except ImportError:
        return
    if AVDecoder in _DECODERS and FFmpegDecoder in _DECODERS:
        _DECODERS.remove(AVDecoder)
        _DECODERS.insert(_DECODERS.index(FFmpegDecoder), AVDecoder)


_prioritise_over_subprocess()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

#: container extension -> (muxer-appropriate video codec, audio codec)
ENC_CODECS = {
    "mpegts": ("libx264", "aac"),
    "ogg": ("libtheora", "libvorbis"),
    "mkv": ("libx264", "aac"),
    "mp4": ("libx264", "aac"),
    "webm": ("libvpx", "libvorbis"),
    "ogv": ("libtheora", "libvorbis"),
    "avi": ("mpeg4", "pcm_s16le"),
    "mov": ("libx264", "aac"),
    "ts": ("libx264", "aac"),
    # long-tail reference encoder plugins: lives_gif_encoder
    # (marcos-encoders) and encodedv_encoder
    "gif": ("gif", ""),
    "dv": ("dvvideo", ""),
}


class AVEncodeSession:
    """Streaming encode session: open -> write frames/audio -> close.
    (The reference encoder plugins consume rendered frames the same way.)"""

    def __init__(self, path: str, width: int, height: int, fps: float,
                 vcodec: str | None = None, acodec: str | None = None,
                 arate: int = 0, achans: int = 2, bitrate: int = 0,
                 gop: int = 12, container: str = ""):
        lib = load_avbridge()
        if lib is None:
            raise RuntimeError("avbridge unavailable")
        ext = container or Path(path).suffix.lstrip(".").lower()
        dflt = ENC_CODECS.get(ext, ("libx264", "aac"))
        vcodec = vcodec or dflt[0]
        acodec = acodec or dflt[1]
        if not acodec:
            # container has no sensible audio codec (gif, raw dv):
            # drop audio like the reference gif/dv encoder plugins do
            arate = 0
        from fractions import Fraction
        fr = Fraction(fps).limit_denominator(1001 * 60)
        self._lib = lib
        self._h = lib.avb_enc_open2(
            str(path).encode(), container.encode(), vcodec.encode(),
            width, height,
            fr.numerator, fr.denominator, bitrate, gop,
            acodec.encode() if arate else b"", arate, achans)
        if not self._h:
            raise RuntimeError(f"avbridge: cannot open encoder for {path}")
        self.width, self.height = width, height
        self.achans = achans if arate else 0

    def write_frame(self, arr: np.ndarray):
        """(3,H,W)/(H,W,3) uint8 RGB, or flat I420 bytes."""
        arr = np.asarray(arr, np.uint8)
        if arr.ndim == 3:
            if arr.shape[0] in (3, 4):
                arr = np.moveaxis(arr[:3], 0, -1)
            rgb = np.ascontiguousarray(arr[..., :3])
            buf = rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            ok = self._lib.avb_enc_video(self._h, buf, 1)
        else:
            flat = np.ascontiguousarray(arr.reshape(-1))
            buf = flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            ok = self._lib.avb_enc_video(self._h, buf, 0)
        if not ok:
            raise IOError("avbridge: encode_video failed")

    def write_audio(self, pcm: np.ndarray):
        """(N,) or (N,chans) int16 interleaved samples."""
        pcm = np.ascontiguousarray(np.asarray(pcm, np.int16).reshape(-1))
        if not self._lib.avb_enc_audio(
                self._h,
                pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                pcm.size // max(1, self.achans)):
            raise IOError("audio encode failed")

    def close(self):
        if getattr(self, "_h", None):
            self._lib.avb_enc_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class AVStreamSource:
    """Sequential decoder for live/network media — udp:// MPEG-TS,
    icecast/http, pipes, or any file — without the open-time index scan
    (live streams have no end). Clip-like: `get_frame(n)` returns the NEXT
    frame in stream order, like Y4MStreamSource; the receiving half of the
    reference's network-stream inputs (lives2lives/mpegts class)."""

    def __init__(self, uri: str):
        lib = load_avbridge()
        if lib is None:
            raise RuntimeError("avbridge unavailable")
        self._lib = lib
        self._h = lib.avb_open_mode(str(uri).encode(), 1)
        if not self._h:
            raise IOError(f"cannot open stream {uri!r}")
        info = (ctypes.c_int64 * 11)()
        lib.avb_info(self._h, info)
        self.width, self.height = int(info[0]), int(info[1])
        self.fps = (int(info[2]) / int(info[3])) if info[3] else 25.0
        # colour metadata flags, same positions AVDecoder reads: HD streams
        # are typically BT709 and MJPEG/YUVJ streams full-range — dropping
        # them shifts colours through the conversion engine
        self._clamping = int(YUVClamping.UNCLAMPED if int(info[9])
                             else YUVClamping.CLAMPED)
        self._subspace = int(YUVSubspace.BT709 if int(info[10])
                             else YUVSubspace.YCBCR)
        if self.width <= 0:
            lib.avb_close(self._h)
            self._h = None
            raise IOError(f"no video stream in {uri!r}")
        w, h = self.width, self.height
        self._buf = (ctypes.c_uint8 * (w * h + 2 * (w // 2) * (h // 2)))()
        self.frames = 1 << 30
        self.unique_id = 0x4156  # 'AV'
        self.scrap_on_record = True  # live feed: recordings scrap frames
        self._last: Optional[Layer] = None

    def get_frame(self, n: int = 0) -> Layer:
        import jax.numpy as jnp
        if not self._lib.avb_next_frame(self._h, self._buf):
            if self._last is not None:
                return self._last  # EOF / underrun: hold last frame
            raise EOFError("stream ended")
        w, h = self.width, self.height
        a = np.frombuffer(self._buf, np.uint8)
        cs = (w // 2) * (h // 2)
        lay = Layer(
            planes=(jnp.asarray(a[: w * h].reshape(h, w).copy()),
                    jnp.asarray(a[w * h: w * h + cs]
                                .reshape(h // 2, w // 2).copy()),
                    jnp.asarray(a[w * h + cs:]
                                .reshape(h // 2, w // 2).copy())),
            palette=int(Palette.YUV420P),
            clamping=self._clamping, subspace=self._subspace)
        self._last = lay
        return lay

    def close(self):
        if getattr(self, "_h", None):
            self._lib.avb_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
