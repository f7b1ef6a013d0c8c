"""Frame streaming over UDP — the LiVES-to-LiVES link.

Successor of `src/stream.c` (L2L packet protocol, receive) and
`lives-plugins/.../lives2lives_stream.c` (send): frames are chunked into
datagrams with a small binary header and reassembled at the receiver; late /
incomplete frames are dropped (newest-wins), which is the correct realtime
policy for a VJ link.

Wire format per datagram (little-endian):
  magic u32 'LTPU' | frame_id u32 | palette u16 | w u16 | h u16 |
  chunk u16 | nchunks u16 | payload
"""

from __future__ import annotations

import socket
import struct
import threading
import time
from typing import Optional

import numpy as np

from .constants import Palette
from .layer import Layer, layer_from_bytes, layer_to_bytes
from .player.sinks import Sink

MAGIC = 0x4C545055  # 'LTPU'
HDR = struct.Struct("<IIHHHHH")
CHUNK_PAYLOAD = 60000


class StreamSender(Sink):
    """Sends played frames to a remote receiver (playback-plugin role)."""

    palette_list = (Palette.RGB24, Palette.YUV420P)

    def __init__(self, host: str = "127.0.0.1", port: int = 48888):
        self.addr = (host, port)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.frame_id = 0

    def play_frame(self, layer: Layer, tc: float) -> bool:
        payload = layer_to_bytes(layer)
        n = (len(payload) + CHUNK_PAYLOAD - 1) // CHUNK_PAYLOAD
        for c in range(n):
            part = payload[c * CHUNK_PAYLOAD: (c + 1) * CHUNK_PAYLOAD]
            hdr = HDR.pack(MAGIC, self.frame_id, int(layer.palette),
                           layer.width, layer.height, c, n)
            self.sock.sendto(hdr + part, self.addr)
        self.frame_id += 1
        return True

    def exit_screen(self):
        self.sock.close()


class StreamReceiver:
    """Clip-like source fed by a StreamSender (CLIP_TYPE_LIVES2LIVES).

    `get_frame(n)` returns the newest complete frame (n is ignored — it is
    a live source), or black until the first frame lands."""

    def __init__(self, port: int = 48888, width: int = 0, height: int = 0,
                 fps: float = 25.0):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:  # large frames burst many chunks; grow the kernel buffer
            self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                                 4 << 20)
        except OSError:
            pass
        self.sock.bind(("0.0.0.0", port))
        self.port = self.sock.getsockname()[1]
        self.fps = fps
        self.frames = 1 << 30
        self.width, self.height = width, height
        self.unique_id = 0x121212
        self._latest: Optional[Layer] = None
        self._partial: dict[int, dict] = {}
        self._lock = threading.Lock()
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        self.sock.settimeout(0.5)
        while self._running:
            try:
                data, _ = self.sock.recvfrom(65536)
            except socket.timeout:
                continue
            except OSError:
                break
            if len(data) < HDR.size:
                continue
            magic, fid, pal, w, h, c, n = HDR.unpack_from(data)
            if magic != MAGIC:
                continue
            entry = self._partial.setdefault(
                fid, {"chunks": {}, "n": n, "pal": pal, "w": w, "h": h,
                      "t": time.monotonic()})
            entry["chunks"][c] = data[HDR.size:]
            if len(entry["chunks"]) == entry["n"]:
                payload = b"".join(entry["chunks"][i]
                                   for i in range(entry["n"]))
                try:
                    lay = layer_from_bytes(payload, entry["w"], entry["h"],
                                           entry["pal"])
                    with self._lock:
                        self._latest = lay
                        self.width, self.height = entry["w"], entry["h"]
                except Exception:
                    pass
                del self._partial[fid]
            # GC stale partial frames (drop-late policy)
            now = time.monotonic()
            for k in [k for k, v in self._partial.items()
                      if now - v["t"] > 1.0]:
                del self._partial[k]

    def get_frame(self, n: int) -> Layer:
        from .layer import layer_blank
        with self._lock:
            if self._latest is not None:
                return self._latest
        w = self.width or 64
        h = self.height or 64
        return layer_blank(w, h, Palette.RGB24)

    def close(self):
        self._running = False
        try:
            self.sock.close()
        except OSError:
            pass
