"""Encoder plugins — capability-query contract.

The reference drives Perl encoder scripts over a stdout protocol
(`get_capabilities` / `get_formats` / `encode`, src/plugins.c:1813). Here
encoders are classes with the same three-call contract. Built-ins: YUV4MPEG2
stream and PNG image sequence (always available), WAV for audio, and an
ffmpeg encoder that registers only when the binary exists.
"""

from __future__ import annotations

import shutil
import struct
import subprocess
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, Optional

import numpy as np

from ..constants import Palette
from ..layer import Layer

CAP_VIDEO = 1
CAP_AUDIO = 2


@dataclass
class EncFormat:
    name: str
    extension: str
    description: str = ""


class Encoder:
    name = "base"
    #: True when encode() can take device-resident (jax) frame arrays —
    #: callers then skip the raw device->host fetch entirely
    accepts_device_frames = False

    @classmethod
    def get_capabilities(cls) -> int:
        return CAP_VIDEO

    @classmethod
    def get_formats(cls) -> list[EncFormat]:
        return []

    def encode(self, out_path: str, frames: Iterable[np.ndarray],
               fps: float, audio: np.ndarray | None = None,
               arate: int = 44100) -> bool:
        """frames: iterable of (3,H,W) or (H,W,3) uint8 RGB arrays."""
        raise NotImplementedError


_ENCODERS: dict[str, type[Encoder]] = {}


def register_encoder(cls):
    _ENCODERS[cls.name] = cls
    return cls


def get_encoder(name: str) -> Encoder:
    return _ENCODERS[name]()


def list_encoders() -> list[str]:
    return sorted(_ENCODERS)


def _chw(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f)
    return f if f.shape[0] in (3, 4) else np.moveaxis(f, -1, 0)


@register_encoder
class Y4MEncoder(Encoder):
    name = "yuv4mpeg"

    @classmethod
    def get_formats(cls):
        return [EncFormat("yuv4mpeg2", "y4m", "raw YUV420 stream")]

    def encode(self, out_path, frames, fps, audio=None, arate=44100):
        from ..ops.colorspace import convert_layer
        from .decoders import write_y4m
        import jax.numpy as jnp
        planar = []
        for f in frames:
            lay = Layer(planes=(jnp.asarray(_chw(f)[:3]),),
                        palette=int(Palette.RGB24))
            yuv = convert_layer(lay, Palette.YUV420P)
            planar.append(tuple(np.asarray(p) for p in yuv.planes))
        write_y4m(out_path, planar, fps)
        if audio is not None:
            WavEncoder().encode(str(Path(out_path).with_suffix(".wav")),
                                [], fps, audio, arate)
        return True


@register_encoder
class PNGSeqEncoder(Encoder):
    name = "pngseq"

    @classmethod
    def get_formats(cls):
        return [EncFormat("png_sequence", "png", "numbered PNG images")]

    def encode(self, out_path, frames, fps, audio=None, arate=44100):
        from PIL import Image
        d = Path(out_path)
        d.mkdir(parents=True, exist_ok=True)
        for i, f in enumerate(frames):
            arr = np.moveaxis(_chw(f)[:3], 0, -1)
            Image.fromarray(arr).save(d / f"{i + 1:08d}.png")
        return True


@register_encoder
class PDFEncoder(Encoder):
    """One page per frame (the reference pdf_encoder plugin,
    lives-plugins/plugins/encoders/pdf_encoder)."""

    name = "pdf"

    @classmethod
    def get_formats(cls):
        return [EncFormat("pdf", "pdf", "one page per frame")]

    def encode(self, out_path, frames, fps, audio=None, arate=44100):
        from PIL import Image
        imgs = [Image.fromarray(np.moveaxis(_chw(f)[:3], 0, -1))
                for f in frames]
        if not imgs:
            return False
        imgs[0].save(out_path, format="PDF", save_all=True,
                     append_images=imgs[1:],
                     resolution=72.0)
        return True


@register_encoder
class WavEncoder(Encoder):
    name = "wav"

    @classmethod
    def get_capabilities(cls):
        return CAP_AUDIO

    @classmethod
    def get_formats(cls):
        return [EncFormat("wav", "wav", "RIFF WAVE pcm s16le")]

    def encode(self, out_path, frames, fps, audio=None, arate=44100):
        if audio is None:
            return False
        a = np.atleast_2d(np.asarray(audio, np.float32))
        if a.shape[0] < a.shape[1]:
            a = a.T
        ch = a.shape[1]
        pcm = np.clip(a * 32767, -32768, 32767).astype("<i2").tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt " \
            + struct.pack("<IHHIIHH", 16, 1, ch, arate, arate * ch * 2,
                          ch * 2, 16) + b"data" \
            + struct.pack("<I", len(pcm))
        Path(out_path).write_bytes(hdr + pcm)
        return True


if shutil.which("ffmpeg"):
    @register_encoder
    class FFmpegEncoder(Encoder):
        name = "ffmpeg"

        @classmethod
        def get_capabilities(cls):
            return CAP_VIDEO | CAP_AUDIO

        @classmethod
        def get_formats(cls):
            return [EncFormat("h264", "mp4"), EncFormat("vp9", "webm"),
                    EncFormat("mjpeg", "avi")]

        def encode(self, out_path, frames, fps, audio=None, arate=44100):
            frames = list(frames)
            if not frames:
                return False
            c, h, w = _chw(frames[0]).shape
            cmd = [shutil.which("ffmpeg"), "-y", "-f", "rawvideo",
                   "-pix_fmt", "rgb24", "-s", f"{w}x{h}", "-r", str(fps),
                   "-i", "-", out_path]
            proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                    stdout=subprocess.DEVNULL,
                                    stderr=subprocess.DEVNULL)
            for f in frames:
                proc.stdin.write(
                    np.moveaxis(_chw(f)[:3], 0, -1).tobytes())
            proc.stdin.close()
            return proc.wait() == 0


def _have_avbridge() -> bool:
    try:
        from .av import load_avbridge
        return load_avbridge() is not None
    except Exception:
        return False


if _have_avbridge():
    @register_encoder
    class AVEncoder(Encoder):
        """In-process libav encoder (native/avbridge.cpp): H.264/MKV/MP4,
        VP8/WebM, Theora/OGV, MPEG-4/AVI — the reference's
        ffmpeg_encoder/multi_encoder/x264_encoder plugin family
        (lives-plugins/plugins/encoders/) without an external binary."""

        name = "av"

        @classmethod
        def get_capabilities(cls):
            return CAP_VIDEO | CAP_AUDIO

        @classmethod
        def get_formats(cls):
            from .av import ENC_CODECS, load_avbridge
            lib = load_avbridge()
            out = []
            for ext, (vc, _) in ENC_CODECS.items():
                if lib.avb_have_encoder(vc.encode()):
                    out.append(EncFormat(vc, ext))
            return out

        def encode(self, out_path, frames, fps, audio=None, arate=44100):
            from .av import AVEncodeSession
            frames = iter(frames)
            try:
                first = next(frames)
            except StopIteration:
                return False
            f0 = _chw(first)
            c, h, w = f0.shape
            achans = 0
            if audio is not None:
                audio = np.asarray(audio)
                achans = 1 if audio.ndim == 1 else audio.shape[-1]
            sess = AVEncodeSession(out_path, w, h, fps,
                                   arate=arate if achans else 0,
                                   achans=max(achans, 1))
            if sess.achans == 0:
                achans = 0   # container refused audio (gif/dv): video-only
            pcm = None
            if achans:
                pcm = np.clip(audio, -1.0, 1.0) * 32767 \
                    if np.issubdtype(audio.dtype, np.floating) else audio
                pcm = np.asarray(pcm, np.int16).reshape(-1, achans)
            apos = 0
            spf = int(arate / fps) if achans else 0  # samples per frame

            def feed_audio(nframes):
                # interleave audio with video so the muxer's ordering
                # buffer stays bounded on long encodes
                nonlocal apos
                if pcm is None:
                    return
                want = min(int(nframes * spf), len(pcm))
                if want > apos:
                    sess.write_audio(pcm[apos:want])
                    apos = want

            try:
                sess.write_frame(f0)
                n = 1
                feed_audio(1)
                for f in frames:
                    sess.write_frame(_chw(f))
                    n += 1
                    feed_audio(n)
                if pcm is not None and apos < len(pcm):
                    sess.write_audio(pcm[apos:])
            finally:
                sess.close()
            return n > 0


def _have_jpeg_writer() -> bool:
    try:
        from .jpeg_encode import _writer
        return _writer() is not None
    except Exception:
        return False


if _have_jpeg_writer():
    @register_encoder
    class MJPEGDeviceEncoder(Encoder):
        """MJPEG/AVI export through the device encode lane
        (io/jpeg_encode.py): batches of frames FDCT/quantise/sparse-pack
        on the TPU and cross as coefficients; the host runs only the
        entropy encode. For device-resident frames this is ~2x a raw
        fetch + host encode on this attachment's download path; the
        output AVI feeds straight back into the compressed ingest lane.
        Reference role: jpeg stream export (marcos-encoders family)."""

        name = "mjpeg"
        accepts_device_frames = True

        @classmethod
        def get_formats(cls):
            return [EncFormat("mjpeg_avi", "avi", "Motion-JPEG AVI")]

        def __init__(self, quality: int = 90, batch: int = 8):
            self.quality = quality
            self.batch = batch

        def encode(self, out_path, frames, fps, audio=None, arate=44100):
            import jax.numpy as jnp

            from .decoders import write_mjpeg_avi
            from .jpeg_encode import JpegDeviceEncoder
            enc = None
            datas: list[bytes] = []
            buf: list = []

            def flush():
                nonlocal enc
                if not buf:
                    return
                n = len(buf)
                while len(buf) < self.batch:   # fixed template size
                    buf.append(buf[-1])
                if enc is None:
                    c, h, w = buf[0].shape
                    enc = JpegDeviceEncoder(w, h, quality=self.quality,
                                            batch=self.batch)
                datas.extend(enc.encode_batch(jnp.stack(buf))[:n])
                buf.clear()

            w = h = 0
            for f in frames:
                if hasattr(f, "shape") and not isinstance(f, np.ndarray):
                    # device array: CHW by convention (render output);
                    # HWC only when the channel axis is clearly last
                    arr = f
                    if arr.shape[0] not in (3, 4) \
                            and arr.shape[-1] in (3, 4):
                        arr = jnp.moveaxis(arr, -1, 0)
                    arr = arr[:3]
                else:
                    arr = jnp.asarray(_chw(f)[:3])
                h, w = int(arr.shape[-2]), int(arr.shape[-1])
                buf.append(arr)
                if len(buf) >= self.batch:
                    flush()
            flush()
            if not datas:
                return False
            write_mjpeg_avi(out_path, datas, w, h, fps)
            if audio is not None:
                WavEncoder().encode(
                    str(Path(out_path).with_suffix(".wav")), [], fps,
                    audio, arate)
            return True
