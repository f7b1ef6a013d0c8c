"""Kinect capture (io/kinect.py, freenect.c successor) — mock-tested:
no Kinect hardware exists in CI, so the ctypes sync-API path runs
against an in-process fake library, exactly like the dvgrab/JACK/ALSA
gated drivers."""

import ctypes

import jax.numpy as jnp
import numpy as np

from lives_tpu.constants import Palette
from lives_tpu.io.kinect import (KINECT_H, KINECT_W, KinectCamera,
                                 KinectClip)
from lives_tpu.layer import Layer


class FakeFreenect:
    """In-process libfreenect_sync: serves deterministic RGB + a depth
    ramp through the real ctypes calling convention (byref out-pointers,
    string_at reads)."""

    def __init__(self):
        rgb = np.zeros((KINECT_H, KINECT_W, 3), np.uint8)
        rgb[..., 0] = np.arange(KINECT_W, dtype=np.uint32) % 256
        rgb[..., 1] = 128
        rgb[..., 2] = (np.arange(KINECT_H, dtype=np.uint32) % 256)[:, None]
        self.rgb = rgb
        # depth: left-to-right ramp 0..1279 mm
        self.depth = np.broadcast_to(
            (np.arange(KINECT_W, dtype=np.uint16) * 2),
            (KINECT_H, KINECT_W)).copy()
        self._rgb_buf = ctypes.create_string_buffer(self.rgb.tobytes())
        self._depth_buf = ctypes.create_string_buffer(self.depth.tobytes())
        self.video_calls = 0
        self.stopped = False

    def freenect_sync_get_video(self, data_ref, ts_ref, index, fmt):
        assert fmt == 0  # FREENECT_VIDEO_RGB
        self.video_calls += 1
        data_ref._obj.value = ctypes.addressof(self._rgb_buf)
        ts_ref._obj.value = self.video_calls
        return 0

    def freenect_sync_get_depth(self, data_ref, ts_ref, index, fmt):
        assert fmt == 4  # FREENECT_DEPTH_REGISTERED
        data_ref._obj.value = ctypes.addressof(self._depth_buf)
        ts_ref._obj.value = self.video_calls
        return 0

    def freenect_sync_stop(self):
        self.stopped = True


def test_camera_pulls_through_ctypes_convention():
    fake = FakeFreenect()
    cam = KinectCamera(lib=fake)
    rgb = cam.get_rgb()
    depth = cam.get_depth()
    np.testing.assert_array_equal(rgb, fake.rgb)
    np.testing.assert_array_equal(depth, fake.depth)
    cam.close()
    assert fake.stopped


def test_clip_keys_depth_window_on_device():
    """The reference keying loop (freenect.c:276): pixels with
    depth >= maxthresh or < minthresh become ccol with alpha 0."""
    fake = FakeFreenect()
    clip = KinectClip(camera=KinectCamera(lib=fake),
                      minthresh=100, maxthresh=800, ccol=(255, 0, 0))
    lay = clip.get_frame(0)
    assert lay.palette == int(Palette.RGBA32)
    arr = np.asarray(lay.planes[0])
    assert arr.shape == (4, KINECT_H, KINECT_W)
    depth = fake.depth[0]  # same every row
    inside = (depth >= 100) & (depth < 800)
    # alpha column profile follows the window exactly
    np.testing.assert_array_equal(arr[3, 0], np.where(inside, 255, 0))
    # outside pixels carry the replacement colour
    np.testing.assert_array_equal(arr[0, 0, ~inside],
                                  np.full((~inside).sum(), 255))
    np.testing.assert_array_equal(arr[1, 0, ~inside], 0)
    # inside pixels carry the camera bytes
    np.testing.assert_array_equal(arr[0, 0, inside],
                                  fake.rgb[0, inside, 0])
    # depth exported as AFLOAT in the [0,1] convention (mm / 65536) so
    # it composes with any standard alpha consumer
    assert clip.last_depth is not None
    assert clip.last_depth.palette == int(Palette.AFLOAT)
    dplane = np.asarray(clip.last_depth.planes[0])
    assert float(dplane.max()) <= 1.0 and float(dplane.min()) >= 0.0
    np.testing.assert_allclose(
        dplane[0], fake.depth[0].astype(np.float32) / 65536.0,
        rtol=1e-6)


def test_depth_key_filter_composable():
    """`depth_key`: the same keying math for ANY rgb+depth pair, usable
    in-template without hardware."""
    from lives_tpu.effects.host import (FrameContext, apply_instance,
                                        instantiate)

    h, w = 32, 48
    rgb = np.full((3, h, w), 200, np.uint8)
    depth_mm = np.broadcast_to(np.linspace(0, 1000, w, dtype=np.float32),
                               (h, w)).copy()
    lay = Layer(planes=(jnp.asarray(rgb),), palette=int(Palette.RGB24))
    # AFLOAT planes are [0,1]; the filter's min/maxthresh params stay in
    # the reference's mm domain and rescale internally
    dep = Layer(planes=(jnp.asarray(depth_mm / 65536.0)[None],),
                palette=int(Palette.AFLOAT))
    inst = instantiate("depth_key", minthresh=200.0, maxthresh=600.0,
                       ccol_b=1.0)
    out = apply_instance(inst, [lay], FrameContext(width=w, height=h),
                         alpha_ins={0: dep})[0]
    arr = np.asarray(out.planes[0])
    assert arr.shape[0] == 4
    inside = (depth_mm[0] >= 200.0) & (depth_mm[0] < 600.0)
    np.testing.assert_array_equal(arr[3, 0], np.where(inside, 255, 0))
    np.testing.assert_array_equal(arr[2, 0, ~inside], 255)  # blue fill
    np.testing.assert_array_equal(arr[0, 0, inside], 200)


def test_clip_contract_fields():
    """Player/recorder integration contract (the V4L2Source shape):
    unique_id stability + scrap_on_record so takes capture output."""
    fake = FakeFreenect()
    c1 = KinectClip(camera=KinectCamera(lib=fake))
    c2 = KinectClip(camera=KinectCamera(lib=fake))
    assert c1.unique_id == c2.unique_id
    assert c1.scrap_on_record
    assert c1.fps == 25.0 and c1.frames > 1000


def test_osc_open_kinect_route(monkeypatch):
    """`/clip/open/kinect` opens a KinectClip on the server (gated: the
    fake lib stands in for libfreenect, as on a real install)."""
    import lives_tpu.io.kinect as kin
    from lives_tpu.osc.server import OSCServer
    from lives_tpu.player import CollectSink, Player

    from lives_tpu.osc.protocol import OSCMessage

    monkeypatch.setattr(kin, "load_freenect", lambda: FakeFreenect())
    srv = OSCServer(player=Player(sink=CollectSink()))
    srv.dispatch(OSCMessage("/clip/open/kinect", [0, 100, 800]))
    (clip,) = [c for c in srv.clips.values() if isinstance(c, KinectClip)]
    assert isinstance(clip, KinectClip)
    assert (clip.minthresh, clip.maxthresh) == (100, 800)
    lay = clip.get_frame(0)
    assert lay.palette == int(Palette.RGBA32)
