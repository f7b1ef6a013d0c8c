"""Kinect (libfreenect) capture — depth-keyed RGB generator.

Succeeds `lives-plugins/weed-plugins/freenect.c:1-343`: the reference is
a weed GENERATOR that opens the Kinect camera, streams 640x480 RGB +
registered depth, and per pixel replaces everything outside the
[minthresh, maxthresh) depth window with a solid colour (alpha 0),
optionally exporting the depth as a [0,1] AFLOAT out-channel
(freenect.c:276-300 the keying loop, :311-321 the channel templates).

TPU-native split:

- ``KinectCamera`` — ctypes binding to the libfreenect *sync* API
  (`freenect_sync_get_video` / `freenect_sync_get_depth`), gated like
  JACK/ALSA/V4L2/FireWire: `load_freenect()` returns None when the
  library is absent and every class accepts an injected lib, so the
  full path is mock-testable with zero hardware (tests/test_kinect.py).
- ``KinectClip`` — clip-like live source (the V4L2Source contract): each
  `get_frame` pulls RGB+depth from the camera and runs the depth keying
  ON DEVICE in one jitted template (scalar thresholds ride a packed
  params array — per-leaf uploads cost ~1 ms each through the tunnel).
  The latest depth plane is exposed as `last_depth` (AFLOAT Layer), the
  cconx-routable equivalent of the reference's optional depth channel.
- the `depth_key` FILTER (registered here) — the same keying math as a
  composable in-template effect for ANY RGB layer + AFLOAT depth alpha
  input, so recorded takes and the fused graph can re-key without the
  hardware attached.
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

from ..constants import Palette
from ..layer import Layer

# freenect.h enums (the reference selects RGB video + REGISTERED depth,
# freenect.c:181-182)
FREENECT_VIDEO_RGB = 0
FREENECT_DEPTH_REGISTERED = 4
KINECT_W, KINECT_H = 640, 480
_DEPTH_MAX = 65536


def load_freenect():
    """The sync-API library, or None (gated feature)."""
    for name in ("libfreenect_sync.so.0", "libfreenect_sync.so"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


class KinectCamera:
    """Blocking-pull Kinect camera over the libfreenect sync API."""

    def __init__(self, lib=None, index: int = 0):
        self.lib = lib if lib is not None else load_freenect()
        if self.lib is None:
            raise RuntimeError("libfreenect_sync not available")
        self.index = index
        self._lock = threading.Lock()

    def get_rgb(self) -> np.ndarray:
        """(480, 640, 3) u8 RGB."""
        data = ctypes.c_void_p()
        ts = ctypes.c_uint32()
        with self._lock:
            rc = self.lib.freenect_sync_get_video(
                ctypes.byref(data), ctypes.byref(ts), self.index,
                FREENECT_VIDEO_RGB)
        if rc != 0 or not data.value:
            raise RuntimeError(f"freenect_sync_get_video rc={rc}")
        buf = ctypes.string_at(data.value, KINECT_W * KINECT_H * 3)
        return np.frombuffer(buf, np.uint8).reshape(KINECT_H, KINECT_W, 3)

    def get_depth(self) -> np.ndarray:
        """(480, 640) u16 registered depth (mm-domain, like the
        reference's FREENECT_DEPTH_REGISTERED stream)."""
        data = ctypes.c_void_p()
        ts = ctypes.c_uint32()
        with self._lock:
            rc = self.lib.freenect_sync_get_depth(
                ctypes.byref(data), ctypes.byref(ts), self.index,
                FREENECT_DEPTH_REGISTERED)
        if rc != 0 or not data.value:
            raise RuntimeError(f"freenect_sync_get_depth rc={rc}")
        buf = ctypes.string_at(data.value, KINECT_W * KINECT_H * 2)
        return np.frombuffer(buf, np.uint16).reshape(KINECT_H, KINECT_W)

    def close(self):
        try:
            self.lib.freenect_sync_stop()
        except Exception:
            pass


def _key_fn():
    """One jitted keying template, cached module-wide (fixed 640x480
    geometry = one compile). Scalars packed into a single (6,) upload."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def key(rgb_u8, depth_u16, packed):
        cmin, cmax, r, g, b, _pad = (packed[i] for i in range(6))
        d = depth_u16.astype(jnp.float32)
        cut = (d >= cmax) | (d < cmin)  # freenect.c:277
        col = jnp.stack([r, g, b]).astype(jnp.float32)[:, None, None]
        rgbf = rgb_u8.astype(jnp.float32)
        out = jnp.where(cut[None], col, rgbf)
        alpha = jnp.where(cut, 0.0, 255.0)
        rgba = jnp.concatenate([out, alpha[None]], 0)
        # published depth is AFLOAT-convention [0,1] (mm / _DEPTH_MAX),
        # so it composes with every standard alpha consumer (alpha_means,
        # masks); depth_key rescales its mm-domain thresholds to match
        return (jnp.clip(rgba, 0, 255).astype(jnp.uint8),
                d * (1.0 / _DEPTH_MAX))
    return key


_KEY = None


class KinectClip:
    """Clip-like live Kinect source (the V4L2Source contract): RGBA32
    frames with outside-the-depth-window pixels replaced by `ccol` and
    alpha 0. `last_depth` holds the matching AFLOAT depth Layer."""

    def __init__(self, camera: KinectCamera | None = None, lib=None,
                 minthresh: int = 0, maxthresh: int = _DEPTH_MAX,
                 ccol=(0, 0, 0)):
        self.camera = camera if camera is not None else KinectCamera(lib)
        self.width, self.height = KINECT_W, KINECT_H
        self.fps = 25.0  # the reference's preferred fps (freenect.c:337)
        self.frames = 1 << 30
        from ..utils.uid import stable_uid
        self.unique_id = stable_uid("kinect", str(self.camera.index))
        self.scrap_on_record = True
        self.minthresh, self.maxthresh = minthresh, maxthresh
        self.ccol = tuple(ccol)
        self.last_depth: Layer | None = None

    def get_frame(self, n: int = 0) -> Layer:
        import jax.numpy as jnp
        global _KEY
        if _KEY is None:
            _KEY = _key_fn()
        rgb = np.moveaxis(self.camera.get_rgb(), -1, 0)
        depth = self.camera.get_depth()
        packed = np.array([self.minthresh, self.maxthresh,
                           *self.ccol, 0], np.float32)
        rgba, d = _KEY(jnp.asarray(rgb), jnp.asarray(depth),
                       jnp.asarray(packed))
        self.last_depth = Layer(planes=(d,), palette=int(Palette.AFLOAT))
        return Layer(planes=(rgba,), palette=int(Palette.RGBA32))

    def close(self):
        self.camera.close()


def _register_depth_key():
    """`depth_key` filter: the freenect keying math as a composable
    effect — RGB in-channel + AFLOAT depth alpha in-channel, keyed RGBA
    out. Lets recorded takes re-key without hardware and lets ANY depth
    producer (cconx) drive the window."""
    import jax.numpy as jnp

    from ..effects.host import ChannelTemplate, Filter, Param, \
        register_filter
    from ..effects.util import split_alpha, to_f01

    def process(ins, p, ctx):
        lay = ins[0]
        depth_lay = ins[1] if len(ins) > 1 else None
        rgb, _ = split_alpha(to_f01(lay))
        if depth_lay is None:
            return lay
        d = depth_lay.planes[0].astype(jnp.float32)
        if d.ndim == 3:
            d = d[0]
        # AFLOAT planes are [0,1] by convention; the min/max params stay
        # in the reference's mm domain (freenect.c) and rescale here
        cut = ((d >= p["maxthresh"] * (1.0 / _DEPTH_MAX))
               | (d < p["minthresh"] * (1.0 / _DEPTH_MAX)))
        col = jnp.stack([p["ccol_r"], p["ccol_g"],
                         p["ccol_b"]]).astype(jnp.float32)[:, None, None]
        out = jnp.where(cut[None], col, rgb)
        alpha = jnp.where(cut, 0.0, 1.0)[None]
        arr = jnp.concatenate([out, alpha], 0)
        return lay.replace(
            planes=(jnp.clip(arr * 255.0 + 0.5, 0, 255)
                    .astype(jnp.uint8),),
            palette=int(Palette.RGBA32))

    register_filter(Filter(
        name="depth_key", process=process,
        in_channels=(ChannelTemplate("in", (Palette.RGB24,
                                            Palette.RGBA32)),),
        alpha_ins=(ChannelTemplate("depth", (Palette.AFLOAT,),
                                   optional=True),),
        params=(Param("minthresh", "num", 0.0, 0.0, float(_DEPTH_MAX)),
                Param("maxthresh", "num", float(_DEPTH_MAX), 0.0,
                      float(_DEPTH_MAX)),
                Param("ccol_r", "num", 0.0, 0.0, 1.0),
                Param("ccol_g", "num", 0.0, 0.0, 1.0),
                Param("ccol_b", "num", 0.0, 0.0, 1.0)),
        description="depth-window keying (freenect.c:276 keying loop) "
                    "for any RGB + AFLOAT depth pair"))


_register_depth_key()
