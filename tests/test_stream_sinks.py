"""Network output sinks (player/sinks.py AVStreamSink / VLoopbackSink):
udp/mpegts streaming, ogg/theora files, vloopback gating."""

import os
import socket
import tempfile

import numpy as np
import pytest

from lives_tpu.io.av import load_avbridge
from lives_tpu.player.sinks import AVStreamSink, VLoopbackSink

pytestmark = pytest.mark.skipif(load_avbridge() is None,
                                reason="libav bridge unavailable")


def _frames(n=12, h=48, w=64):
    return [np.full((3, h, w), i * 16, np.uint8) for i in range(n)]


def test_udp_mpegts_stream_receivable():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5)
    port = rx.getsockname()[1]
    sink = AVStreamSink(f"udp://127.0.0.1:{port}", fps=25.0,
                        bitrate=300_000)
    from lives_tpu.layer import Layer
    from lives_tpu.constants import Palette
    import jax.numpy as jnp
    sink.init_screen(64, 48, 25.0)
    for i, f in enumerate(_frames(25)):
        sink.play_frame(Layer(planes=(jnp.asarray(f),),
                              palette=int(Palette.RGB24)), i / 25.0)
    sink.exit_screen()
    data = rx.recv(65536)
    # MPEG-TS sync bytes at 188-byte strides (datagrams are MTU-sized,
    # not TS-aligned, so packets may straddle datagram boundaries)
    assert data[0] == 0x47 and data[188] == 0x47
    rx.close()


def test_icecast_class_ogg_output(tmp_path):
    """The icecast/oggstream plugin capability: theora/ogg container
    written through the same sink (file target; network path identical)."""
    lib = load_avbridge()
    if not lib.avb_have_encoder(b"libtheora"):
        pytest.skip("libtheora absent")
    path = tmp_path / "stream.ogv"
    sink = AVStreamSink(str(path), fps=25.0, container="ogg")
    from lives_tpu.layer import Layer
    from lives_tpu.constants import Palette
    import jax.numpy as jnp
    sink.init_screen(64, 48, 25.0)
    for i, f in enumerate(_frames(10)):
        sink.play_frame(Layer(planes=(jnp.asarray(f),),
                              palette=int(Palette.RGB24)), i / 25.0)
    sink.exit_screen()
    assert path.stat().st_size > 1000
    assert path.read_bytes()[:4] == b"OggS"
    from lives_tpu.io.decoders import try_decoders
    cd = try_decoders(str(path))
    assert cd is not None and cd.decoder.codec == "theora"


def test_vloopback_gated():
    if os.path.exists("/dev/video10"):
        pytest.skip("loopback present; gating test n/a")
    with pytest.raises(RuntimeError):
        VLoopbackSink("/dev/video10")


def test_av_stream_source_sequential(tmp_path):
    """AVStreamSource: no-index sequential decode (the live-stream input
    path), exercised on an MPEG-TS file written by AVStreamSink."""
    import jax.numpy as jnp
    from lives_tpu.io.av import AVEncodeSession, AVStreamSource

    path = tmp_path / "live.ts"
    sess = AVEncodeSession(str(path), 64, 48, 25.0, container="mpegts")
    for i, f in enumerate(_frames(15, 48, 64)):
        sess.write_frame(f)
    sess.close()
    src = AVStreamSource(str(path))
    assert (src.width, src.height) == (64, 48)
    ys = []
    for i in range(10):
        lay = src.get_frame(i)
        ys.append(float(np.asarray(lay.planes[0]).mean()))
    # frame greys ramp: sequential order preserved
    assert ys == sorted(ys) and ys[-1] > ys[0] + 40
    src.close()


def test_udp_stream_roundtrip_send_receive():
    """Full network loop: AVStreamSink streams MPEG-TS over UDP while
    AVStreamSource receives and decodes it live."""
    import threading
    import time as _t
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.io.av import AVStreamSource
    from lives_tpu.layer import Layer

    port = 47655
    stop = threading.Event()

    def send():
        sink = AVStreamSink(f"udp://127.0.0.1:{port}", fps=25.0,
                            bitrate=200_000)
        sink.init_screen(64, 48, 25.0)
        i = 0
        while not stop.is_set() and i < 250:
            f = np.full((3, 48, 64), (i * 5) % 200 + 30, np.uint8)
            sink.play_frame(Layer(planes=(jnp.asarray(f),),
                                  palette=int(Palette.RGB24)), i / 25.0)
            i += 1
            _t.sleep(0.01)
        sink.exit_screen()

    th = threading.Thread(target=send, daemon=True)
    th.start()
    _t.sleep(0.3)  # let the sender emit headers
    try:
        src = AVStreamSource(f"udp://127.0.0.1:{port}?timeout=5000000")
    except IOError:
        stop.set()
        th.join(timeout=3)
        pytest.skip("udp stream open raced the sender")
    lay = src.get_frame(0)
    assert np.asarray(lay.planes[0]).shape == (48, 64)
    src.close()
    stop.set()
    th.join(timeout=5)
