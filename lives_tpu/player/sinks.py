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
    fetches_frames = True   # most sinks fetch pixels to host each frame

    def init_screen(self, width: int, height: int, fps: float):
        pass

    def play_frame(self, layer: Layer, tc: float) -> bool:
        raise NotImplementedError

    def exit_screen(self):
        pass


class NullSink(Sink):
    """Discards frames (benchmark sink), forcing materialisation with a
    device-order barrier every `sync_every` frames.

    On a remote attachment `jax.block_until_ready` per frame is a pure
    RPC round trip (~37 ms on this tunnel) that does NOT guarantee
    completion; the honest enforcement is the device-order barrier the
    benchmarks use (fetch one tiny jitted output: in-order execution
    implies all prior work completed). The barrier runs on a small
    helper thread (at most one in flight), so the serving loop is never
    stalled by the barrier RPC while the device queue stays bounded to
    ~sync_every frames of lag — the behaviour of a real display
    consuming asynchronously. `strict=True` barriers inline instead."""

    fetches_frames = False  # no device->host fetch: skip transfer prewarm

    def __init__(self, sync_every: int = 8, strict: bool = False):
        self.count = 0
        self.sync_every = max(1, sync_every)
        self.strict = strict
        self._sync_thread = None

    def play_frame(self, layer: Layer, tc: float) -> bool:
        self.count += 1
        if self.count % self.sync_every == 0 \
                and not isinstance(layer.planes[0], np.ndarray):
            from ..utils import device_barrier
            if self.strict:
                device_barrier()
            elif self._sync_thread is None \
                    or not self._sync_thread.is_alive():
                import threading
                self._sync_thread = threading.Thread(
                    target=device_barrier, daemon=True)
                self._sync_thread.start()
        return True

    def exit_screen(self):
        if self._sync_thread is not None and self._sync_thread.is_alive():
            self._sync_thread.join(timeout=30)


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


class AVStreamSink(Sink):
    """Network / container streaming playback plugin: frames encode through
    the in-process libav bridge to ANY avformat target — `udp://host:port`
    (MPEG-TS, the lives2lives-class network path), `icecast://` /
    `http://` (the reference's icecast_output.c / oggstream.c plugins,
    Theora/OGG), `rtp://`, or a plain file/FIFO.

    Container defaults: udp/rtp -> mpegts+H.264; icecast -> ogg+Theora;
    otherwise guessed from the target's extension."""

    palette_list = (Palette.RGB24,)

    def __init__(self, url: str, fps: float = 25.0, bitrate: int = 0,
                 container: str = "", vcodec: str | None = None):
        self.url = url
        self.fps = fps
        self.bitrate = bitrate
        if not container:
            if url.startswith(("udp://", "rtp://", "srt://")):
                container = "mpegts"
            elif url.startswith(("icecast://", "http://", "https://")):
                container = "ogg"
        self.container = container
        self.vcodec = vcodec
        self._sess = None
        self.frames = 0

    def init_screen(self, width, height, fps):
        from ..io.av import AVEncodeSession
        self.fps = fps or self.fps
        self._sess = AVEncodeSession(self.url, width, height,
                                     self.fps, vcodec=self.vcodec,
                                     bitrate=self.bitrate,
                                     container=self.container)

    def play_frame(self, layer: Layer, tc: float) -> bool:
        arr = np.asarray(layer.planes[0])
        if self._sess is None:
            c, h, w = arr.shape
            self.init_screen(w, h, self.fps)
        self._sess.write_frame(arr)
        self.frames += 1
        return True

    def exit_screen(self):
        if self._sess is not None:
            self._sess.close()
            self._sess = None


class VLoopbackSink(Sink):
    """v4l2loopback output (reference vloopback2.c): raw frames written to
    a /dev/videoN loopback device so any V4L2 consumer (browser, OBS,
    ffmpeg) sees a camera. Cleanly gated: raises when the device is absent
    (this image ships no v4l2loopback module)."""

    palette_list = (Palette.RGB24,)

    V4L2_PIX_FMT_RGB24 = 0x33424752  # 'RGB3'

    def __init__(self, device: str = "/dev/video10"):
        import os
        if not os.path.exists(device):
            raise RuntimeError(f"{device} absent (v4l2loopback not loaded)")
        self.device = device
        self._fd = None
        self.frames = 0

    def init_screen(self, width, height, fps):
        import fcntl
        import os
        import struct as st
        self._fd = os.open(self.device, os.O_WRONLY)
        # VIDIOC_S_FMT with v4l2_format(type=V4L2_BUF_TYPE_VIDEO_OUTPUT=2)
        fmt = st.pack("<I", 2) + st.pack("<IIIII", width, height,
                                         self.V4L2_PIX_FMT_RGB24, 1,
                                         width * 3) \
            + st.pack("<II", width * height * 3, 0) + bytes(200 - 36)
        VIDIOC_S_FMT = 0xC0D05605
        fcntl.ioctl(self._fd, VIDIOC_S_FMT, bytearray(fmt))

    def play_frame(self, layer: Layer, tc: float) -> bool:
        import os
        arr = np.asarray(layer.planes[0])
        os.write(self._fd, np.ascontiguousarray(
            np.moveaxis(arr, 0, -1)).tobytes())
        self.frames += 1
        return True

    def exit_screen(self):
        import os
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None
