"""Video-JACK receive/send (io/videojack.py — vjack_rcv.c +
vjack_output.c successors). No videojack server exists anywhere anymore
(experimental 2006 fork), so the ctypes path runs against an in-process
fake library, like the jack/dvgrab/kinect gated drivers."""

import ctypes

import numpy as np

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.io.videojack import (VJackSink, VJackSource, load_vjack)
from lives_tpu.layer import Layer


class FakeVJackLib:
    """In-process videojack libjack: one client, per-port geometry,
    process callback captured and fired from the test (standing in for
    the JACK thread)."""

    def __init__(self, fps=30):
        self.fps = fps
        self.cb = None
        self.ports = {}
        self._next = 1
        self.active = False
        self.closed = False
        self._buf = None

    # --- core client API (audio-jack shared surface) ---
    def jack_client_open(self, name, opts, ptr):
        return 0xC11E47

    def jack_client_close(self, client):
        self.closed = True
        return 0

    def jack_get_sample_rate(self, client):
        return self.fps

    def jack_port_register(self, client, name, ptype, flags, bufsz):
        h = self._next
        self._next += 1
        self.ports[h] = {"name": bytes(name), "type": bytes(ptype),
                         "flags": int(flags), "w": 0, "h": 0}
        return h

    def jack_set_process_callback(self, client, cb, arg):
        self.cb = cb
        return 0

    def jack_activate(self, client):
        self.active = True
        return 0

    def jack_deactivate(self, client):
        self.active = False
        return 0

    # --- videojack fork entry points ---
    def jack_video_get_width(self, client, port):
        return self.ports[port]["w"]

    def jack_video_get_height(self, client, port):
        return self.ports[port]["h"]

    def jack_video_set_width_and_height(self, client, port, w, h):
        self.ports[port]["w"], self.ports[port]["h"] = int(w), int(h)

    def jack_port_get_buffer(self, port, nframes):
        return ctypes.addressof(self._buf) if self._buf is not None else 0

    # --- test helpers ---
    def feed_frame(self, port, rgba_hw4: np.ndarray):
        """Place a frame on the port and fire the process callback."""
        h, w = rgba_hw4.shape[:2]
        self.jack_video_set_width_and_height(None, port, w, h)
        self._buf = ctypes.create_string_buffer(rgba_hw4.tobytes(),
                                                h * w * 4)
        assert self.cb(1, None) == 0

    def drain_frame(self, port):
        """Provide an output buffer and fire the callback (sink side)."""
        w, h = self.ports[port]["w"], self.ports[port]["h"]
        self._buf = ctypes.create_string_buffer(h * w * 4)
        assert self.cb(1, None) == 0
        return np.frombuffer(bytes(self._buf), np.uint8)[: h * w * 4] \
            .reshape(h, w, 4)


def test_gated_when_video_entry_points_missing(monkeypatch):
    import lives_tpu.io.videojack as vj

    class PlainJack:   # a stock libjack: audio only
        jack_client_open = None

    monkeypatch.setattr(vj, "load_libjack", lambda: PlainJack())
    assert load_vjack() is None
    monkeypatch.setattr(vj, "load_libjack", lambda: None)
    assert load_vjack() is None


def test_source_receives_frame_and_holds_last():
    lib = FakeVJackLib(fps=30)
    src = VJackSource(width=32, height=16, lib=lib)
    assert src.fps == 30.0 and lib.active
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (16, 32, 4), np.uint8)
    lib.feed_frame(src.port, frame)
    lay = src.get_frame(0)
    assert lay.palette == int(Palette.RGBA32)
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(lay.planes[0]), 0, -1), frame)
    # no new frame arrived: the SMOOTH bgbuf hold returns the SAME
    # device layer, no host->device upload (vjack_rcv.c:340)
    lay2 = src.get_frame(1)
    assert lay2 is lay
    src.close()
    assert lib.closed and not lib.active


def test_source_rescales_port_geometry_on_device():
    lib = FakeVJackLib()
    src = VJackSource(width=64, height=32, lib=lib)
    frame = np.zeros((16, 32, 4), np.uint8)
    frame[:, :16] = 200   # left half bright
    lib.feed_frame(src.port, frame)
    lay = src.get_frame(0)
    arr = np.asarray(lay.planes[0])
    assert arr.shape == (4, 32, 64)
    assert arr[0, 0, 0] == 200 and arr[0, 0, -1] == 0


def test_source_black_before_first_frame():
    lib = FakeVJackLib()
    src = VJackSource(width=8, height=4, lib=lib)
    arr = np.asarray(src.get_frame(0).planes[0])
    assert arr.shape == (4, 4, 8) and not arr.any()


def test_sink_queues_and_drains_to_port():
    lib = FakeVJackLib(fps=25)
    sink = VJackSink(lib=lib, queue_frames=3)
    sink.init_screen(8, 4, 25.0)
    assert (lib.ports[sink._client.port]["w"],
            lib.ports[sink._client.port]["h"]) == (8, 4)
    frames = []
    for i in range(5):   # exceed the 3-frame bound: oldest two drop
        a = np.full((4, 4, 8), i * 10, np.uint8)
        frames.append(a)
        assert sink.play_frame(
            Layer(planes=(jnp.asarray(a),),
                  palette=int(Palette.RGBA32)), tc=i / 25.0)
    got = lib.drain_frame(sink._client.port)
    np.testing.assert_array_equal(
        got, np.moveaxis(frames[2], 0, -1))   # 0,1 dropped (maxlen)
    got = lib.drain_frame(sink._client.port)
    np.testing.assert_array_equal(got, np.moveaxis(frames[3], 0, -1))
    sink.exit_screen()
    assert lib.closed


def test_osc_open_vjack_route(monkeypatch):
    import lives_tpu.io.videojack as vj
    from lives_tpu.osc.protocol import OSCMessage
    from lives_tpu.osc.server import OSCServer
    from lives_tpu.player import CollectSink, Player

    monkeypatch.setattr(vj, "load_vjack", lambda: FakeVJackLib())
    srv = OSCServer(player=Player(sink=CollectSink()))
    srv.dispatch(OSCMessage("/clip/open/vjack", [32, 16]))
    (clip,) = [c for c in srv.clips.values() if isinstance(c, VJackSource)]
    assert (clip.width, clip.height) == (32, 16)
    assert clip.get_frame(0).palette == int(Palette.RGBA32)


def test_sink_reinit_drops_stale_geometry_frames():
    """A re-init to a different size must never memmove an old-geometry
    frame into the (smaller) port buffer — that would overflow native
    memory on the JACK realtime thread."""
    lib = FakeVJackLib(fps=25)
    sink = VJackSink(lib=lib, queue_frames=4)
    sink.init_screen(8, 4, 25.0)
    big = np.full((4, 4, 8), 7, np.uint8)
    sink.play_frame(Layer(planes=(jnp.asarray(big),),
                          palette=int(Palette.RGBA32)), tc=0.0)
    # re-init smaller: the queued 8x4 frame must be discarded
    sink.init_screen(4, 2, 25.0)
    assert not lib.drain_frame(sink._client.port).any()
    small = np.full((4, 2, 4), 9, np.uint8)
    sink.play_frame(Layer(planes=(jnp.asarray(small),),
                          palette=int(Palette.RGBA32)), tc=0.1)
    got = lib.drain_frame(sink._client.port)
    np.testing.assert_array_equal(got, np.moveaxis(small, 0, -1))
    # belt-and-braces: a stale-sized frame that races past the clear is
    # size-checked in _process and skipped, not written
    sink._rb.append(big.tobytes())
    assert not lib.drain_frame(sink._client.port).any()
    sink.exit_screen()
