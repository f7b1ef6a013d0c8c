"""V4L2 webcam capture (reference `src/videodev.c` via unicap).

Pure-ctypes V4L2 host using mmap streaming IO: negotiate YUYV or MJPEG,
queue buffers, serve the newest frame as a Layer (CLIP_TYPE_VIDEODEV).
Gated on /dev/video* presence — in containers without cameras
`list_devices()` is simply empty.
"""

from __future__ import annotations

import ctypes
import fcntl
import mmap
import os
import select
import struct
from pathlib import Path

import numpy as np

from ..constants import Palette, YUVClamping
from ..layer import Layer, layer_from_bytes

# V4L2 ioctls (videodev2.h)
VIDIOC_QUERYCAP = 0x80685600
VIDIOC_S_FMT = 0xC0D05605
VIDIOC_REQBUFS = 0xC0145608
VIDIOC_QUERYBUF = 0xC0585609
VIDIOC_QBUF = 0xC058560F
VIDIOC_DQBUF = 0xC0585611
VIDIOC_STREAMON = 0x40045612
VIDIOC_STREAMOFF = 0x40045613

V4L2_BUF_TYPE_VIDEO_CAPTURE = 1
V4L2_MEMORY_MMAP = 1
V4L2_PIX_FMT_YUYV = 0x56595559  # 'YUYV'
V4L2_PIX_FMT_MJPEG = 0x47504A4D  # 'MJPG'


def list_devices() -> list[str]:
    return sorted(str(p) for p in Path("/dev").glob("video*"))


class V4L2Source:
    """Clip-like live camera source."""

    def __init__(self, device: str = "/dev/video0", width: int = 640,
                 height: int = 480, n_buffers: int = 4):
        self.device = device
        self.width, self.height = width, height
        self.fps = 30.0
        self.frames = 1 << 30
        from ..utils.uid import stable_uid
        self.unique_id = stable_uid("v4l2", device)
        self.scrap_on_record = True  # live feed: recordings scrap frames
        self.fd = os.open(device, os.O_RDWR | os.O_NONBLOCK)
        self.pixfmt = V4L2_PIX_FMT_YUYV
        self._set_format()
        self._buffers = self._map_buffers(n_buffers)
        self._streamon()

    # struct v4l2_format for VIDEO_CAPTURE: type u32, pad, pix struct
    def _set_format(self):
        fmt = bytearray(208)
        struct.pack_into("<I", fmt, 0, V4L2_BUF_TYPE_VIDEO_CAPTURE)
        struct.pack_into("<IIII", fmt, 8, self.width, self.height,
                         self.pixfmt, 1)  # field=NONE? (1)
        fcntl.ioctl(self.fd, VIDIOC_S_FMT, fmt)
        w, h, pix = struct.unpack_from("<III", fmt, 8)
        self.width, self.height, self.pixfmt = w, h, pix

    def _map_buffers(self, n):
        req = bytearray(20)
        struct.pack_into("<III", req, 0, n, V4L2_BUF_TYPE_VIDEO_CAPTURE,
                         V4L2_MEMORY_MMAP)
        fcntl.ioctl(self.fd, VIDIOC_REQBUFS, req)
        count = struct.unpack_from("<I", req, 0)[0]
        bufs = []
        for i in range(count):
            b = bytearray(88)
            struct.pack_into("<I", b, 0, i)          # index
            struct.pack_into("<I", b, 4, V4L2_BUF_TYPE_VIDEO_CAPTURE)
            struct.pack_into("<I", b, 40, V4L2_MEMORY_MMAP)
            fcntl.ioctl(self.fd, VIDIOC_QUERYBUF, b)
            length = struct.unpack_from("<I", b, 48)[0]
            offset = struct.unpack_from("<I", b, 52)[0]
            mm = mmap.mmap(self.fd, length, mmap.MAP_SHARED,
                           mmap.PROT_READ, offset=offset)
            bufs.append(mm)
            fcntl.ioctl(self.fd, VIDIOC_QBUF, b)
        return bufs

    def _streamon(self):
        fcntl.ioctl(self.fd, VIDIOC_STREAMON,
                    struct.pack("<I", V4L2_BUF_TYPE_VIDEO_CAPTURE))

    def get_frame(self, n: int = 0) -> Layer:
        """Dequeue the newest frame (n ignored: live source)."""
        select.select([self.fd], [], [], 2.0)
        b = bytearray(88)
        struct.pack_into("<I", b, 4, V4L2_BUF_TYPE_VIDEO_CAPTURE)
        struct.pack_into("<I", b, 40, V4L2_MEMORY_MMAP)
        fcntl.ioctl(self.fd, VIDIOC_DQBUF, b)
        idx = struct.unpack_from("<I", b, 0)[0]
        used = struct.unpack_from("<I", b, 44)[0]
        data = self._buffers[idx][:used]
        fcntl.ioctl(self.fd, VIDIOC_QBUF, b)
        if self.pixfmt == V4L2_PIX_FMT_YUYV:
            return layer_from_bytes(bytes(data), self.width, self.height,
                                    Palette.YUYV,
                                    clamping=int(YUVClamping.CLAMPED))
        if self.pixfmt == V4L2_PIX_FMT_MJPEG:
            import io

            import jax.numpy as jnp
            from PIL import Image
            with Image.open(io.BytesIO(bytes(data))) as im:
                arr = np.asarray(im.convert("RGB"))
            return Layer(planes=(jnp.asarray(
                np.moveaxis(arr, -1, 0).copy()),),
                palette=int(Palette.RGB24))
        raise RuntimeError(f"unsupported pixfmt {self.pixfmt:#x}")

    def close(self):
        try:
            fcntl.ioctl(self.fd, VIDIOC_STREAMOFF,
                        struct.pack("<I", V4L2_BUF_TYPE_VIDEO_CAPTURE))
        except OSError:
            pass
        for mm in self._buffers:
            mm.close()
        os.close(self.fd)
