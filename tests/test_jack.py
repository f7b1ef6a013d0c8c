"""JACK client + transport sync against a mock libjack (src/jack.c
successor; real libjack is absent in CI, so the binding layer is
exercised through the injected-lib seam — the gated-integration pattern
used for ALSA/V4L2)."""

import ctypes

import numpy as np
import pytest

from lives_tpu.audio.jack import (JackAudioSink, JackClient, JackTransport,
                                  JackTransportRolling,
                                  JackTransportStopped, jack_position_t,
                                  load_libjack)
from lives_tpu.player import NullSink, Player


class MockJack:
    """Callable-compatible stand-in for libjack."""

    def __init__(self, rate=48000):
        self.rate = rate
        self.calls = []
        self.transport_state = JackTransportStopped
        self.transport_frame = 0
        self._buffers = {}
        self._cb = None

    def jack_client_open(self, name, options, status):
        self.calls.append(("open", name))
        return 0xC0FFEE

    def jack_client_close(self, client):
        self.calls.append(("close",))
        return 0

    def jack_get_sample_rate(self, client):
        return self.rate

    def jack_port_register(self, client, name, ptype, flags, bufsz):
        port = 100 + len(self._buffers)
        self._buffers[port] = (ctypes.c_float * 4096)()
        return port

    def jack_port_get_buffer(self, port, nframes):
        return ctypes.addressof(self._buffers[port])

    def jack_set_process_callback(self, client, cb, arg):
        self._cb = cb
        return 0

    def jack_activate(self, client):
        self.calls.append(("activate",))
        return 0

    def jack_deactivate(self, client):
        self.calls.append(("deactivate",))
        return 0

    def jack_transport_start(self, client):
        self.calls.append(("t_start",))
        self.transport_state = JackTransportRolling

    def jack_transport_stop(self, client):
        self.calls.append(("t_stop",))
        self.transport_state = JackTransportStopped

    def jack_transport_locate(self, client, frame):
        self.calls.append(("t_locate", int(frame)))
        self.transport_frame = int(frame)
        return 0

    def jack_transport_query(self, client, pos_ref):
        pos = pos_ref._obj
        pos.frame_rate = self.rate
        pos.frame = self.transport_frame
        return self.transport_state

    def run_process(self, nframes):
        assert self._cb is not None
        return self._cb(nframes, None)

    def port_audio(self, idx, nframes):
        port = 100 + idx
        return np.frombuffer(self._buffers[port], np.float32,
                             count=nframes).copy()


def test_client_process_pulls_audio():
    mock = MockJack()
    got = []

    def pull(n):
        got.append(n)
        t = np.arange(n, dtype=np.float32) / n
        return np.stack([t, -t], 1)

    c = JackClient(pull_fn=pull, lib=mock)
    c.activate()
    assert mock.run_process(256) == 0
    assert got == [256]
    np.testing.assert_allclose(mock.port_audio(0, 256),
                               np.arange(256, dtype=np.float32) / 256)
    np.testing.assert_allclose(mock.port_audio(1, 256),
                               -np.arange(256, dtype=np.float32) / 256)
    c.close()
    assert ("deactivate",) in mock.calls and ("close",) in mock.calls


def test_transport_master_start_stop_locate():
    mock = MockJack()
    c = JackClient(lib=mock)
    p = Player(sink=NullSink())

    class Clip:
        frames, fps, width, height = 100, 25.0, 32, 16

        def get_frame(self, n):
            from lives_tpu.layer import layer_blank
            return layer_blank(32, 16, 1)

    p.state.fg_clip = Clip()
    p.state.frame = 50
    p.transport = JackTransport(c, p, mode="master")
    p.start()
    # located to frame 50 / 25 fps = 2 s = 96000 jack frames, then rolling
    assert ("t_locate", 96000) in mock.calls
    assert ("t_start",) in mock.calls
    p.stop()
    assert ("t_stop",) in mock.calls
    p.transport.on_seek(1.0)
    assert ("t_locate", 48000) in mock.calls


def test_transport_slave_clock_and_state():
    mock = MockJack()
    c = JackClient(lib=mock)
    p = Player(sink=NullSink())

    class Clip:
        frames, fps, width, height = 200, 25.0, 32, 16

        def get_frame(self, n):
            from lives_tpu.layer import layer_blank
            return layer_blank(32, 16, 1)

    p.state.fg_clip = Clip()
    tr = JackTransport(c, p, mode="slave")
    tr.attach()
    # transport at 4 s -> target frame 100
    mock.transport_frame = 4 * 48000
    assert p._target_frame_f() == pytest.approx(100.0)
    # rolling edge -> player starts; stop edge -> player stops
    assert not p.state.playing
    mock.transport_state = JackTransportRolling
    tr.poll()
    assert p.state.playing
    mock.transport_state = JackTransportStopped
    tr.poll()
    assert not p.state.playing


def test_sink_ring_and_reblocking():
    mock = MockJack()
    s = JackAudioSink(lib=mock)
    s.write(np.full((300, 2), 0.25, np.float32), 48000)
    s.write(np.full((300, 2), 0.5, np.float32), 48000)
    mock.run_process(512)
    out = mock.port_audio(0, 512)
    assert np.allclose(out[:300], 0.25)
    assert np.allclose(out[300:512], 0.5)
    # leftover survives to the next callback; then silence
    mock.run_process(512)
    out2 = mock.port_audio(0, 512)
    assert np.allclose(out2[:88], 0.5) and np.allclose(out2[88:], 0.0)
    s.close()


def test_gated_load():
    # environment has no jack: load returns None and constructing without
    # an injected lib raises cleanly
    if load_libjack() is None:
        with pytest.raises(RuntimeError):
            JackClient()
