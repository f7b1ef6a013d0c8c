"""Native runtime bindings (C++ via ctypes).

Builds `native/framecache.cpp` on first use (g++ -O2 -shared, cached next
to the source) and exposes the frame cache / async prefetcher. Falls back
cleanly when no compiler is available — callers must treat `load_library()
is None` as "pure-python path".
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path

_LIB = None
_TRIED = False

SRC = Path(__file__).resolve().parents[2] / "native" / "framecache.cpp"
SO = SRC.with_suffix(".so")


def load_library():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not SO.exists() or SO.stat().st_mtime < SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                 "-o", str(SO), str(SRC), "-lpthread"],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(SO))
        lib.fc_create.restype = ctypes.c_void_p
        lib.fc_create.argtypes = [ctypes.c_int, ctypes.c_int64, ctypes.c_int]
        lib.fc_destroy.argtypes = [ctypes.c_void_p]
        lib.fc_open_stream.restype = ctypes.c_int
        lib.fc_open_stream.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64]
        lib.fc_request.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int64]
        lib.fc_acquire.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.fc_acquire.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int]
        lib.fc_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fc_stats.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int64),
                                 ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


class FrameCache:
    """Pythonic handle over the native cache."""

    def __init__(self, n_slots: int, slot_size: int, n_workers: int = 2):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native framecache unavailable")
        self._lib = lib
        self._h = lib.fc_create(n_slots, slot_size, n_workers)
        self.slot_size = slot_size

    def open_stream(self, path: str, data_start: int, frame_size: int,
                    stride: int, nframes: int) -> bool:
        ok = bool(self._lib.fc_open_stream(
            self._h, str(path).encode(), data_start, frame_size, stride,
            nframes))
        if ok:  # a failed open must leave the previous stream fully usable
            self.frame_size = frame_size
        return ok

    def request(self, start: int, count: int = 1):
        self._lib.fc_request(self._h, start, count)

    def get(self, frame: int, timeout_ms: int = 2000) -> bytes | None:
        """Blocking fetch; returns a copy of the frame payload."""
        import numpy as np
        ptr = self._lib.fc_acquire(self._h, frame, timeout_ms)
        if not ptr:
            return None
        try:
            size = self._frame_size
            return ctypes.string_at(ptr, size)
        finally:
            self._lib.fc_release(self._h, frame)

    def get_array(self, frame: int, shape, dtype="uint8",
                  timeout_ms: int = 2000):
        import numpy as np
        ptr = self._lib.fc_acquire(self._h, frame, timeout_ms)
        if not ptr:
            return None
        try:
            nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
            arr = np.ctypeslib.as_array(ptr, shape=(nbytes,)).astype(
                np.uint8, copy=True)
            return arr.view(dtype).reshape(shape)
        finally:
            self._lib.fc_release(self._h, frame)

    @property
    def _frame_size(self) -> int:
        return self.__dict__.get("frame_size", self.slot_size)

    def stats(self) -> tuple[int, int]:
        h = ctypes.c_int64()
        m = ctypes.c_int64()
        self._lib.fc_stats(self._h, ctypes.byref(h), ctypes.byref(m))
        return h.value, m.value

    def close(self):
        if self._h:
            self._lib.fc_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
