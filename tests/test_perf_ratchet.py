"""Performance ratchet — asserted like parity (VERDICT round-2 weak 9:
the driver bench's run-to-run variance on the shared chip hides <30%
regressions; the in-kernel ms/frame numbers are the better ratchet).

Real-TPU only (the CPU mesh numbers are meaningless):
    LIVES_TPU_TEST_TPU=1 python -m pytest tests/test_perf_ratchet.py

Bounds are ~2x the steady-state medians in PERF_NOTES.md, so chip
contention does not flake the suite but a real regression (a fusion
break, a de-cached template, a transfer sneaking into the hot loop)
fails loudly. Timing: device-order barrier (CLAUDE.md)."""

import os
import time

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    os.environ.get("LIVES_TPU_TEST_TPU") != "1"
    or jax.default_backend() == "cpu",
    reason="real-TPU perf ratchet (set LIVES_TPU_TEST_TPU=1)")


@pytest.fixture(scope="module")
def barrier():
    import jax.numpy as jnp
    tiny = jnp.zeros((8, 128), jnp.uint8)
    bar = jax.jit(lambda a: a + 1)

    def b():
        np.asarray(bar(tiny))
    b()
    return b


def test_fused_sweep_ms_per_frame(barrier):
    """The driver-bench kernel: 10-track 1080p30 fused sweep.
    Steady state ~0.38 ms/frame (87x realtime); bound 0.9."""
    from lives_tpu.events.renderer import render_events
    from lives_tpu.graph.nodemodel import SinkSpec
    from lives_tpu.scenes import DeviceSyntheticSource, multitrack_timeline
    el = multitrack_timeline(n_tracks=10, n_frames=192, width=1920,
                             height=1080, fps=30.0)
    src = DeviceSyntheticSource(1080, 1920)
    sink = SinkSpec(width=1920, height=1080)
    list(render_events(el, src, sink, batch_size=96))   # compile
    barrier()
    t0 = time.perf_counter()
    n = 0
    for tcs, _out in render_events(el, src, sink, batch_size=96):
        n += len(tcs)
    barrier()
    ms = (time.perf_counter() - t0) / n * 1e3
    assert ms < 0.9, f"fused sweep {ms:.2f} ms/frame (bound 0.9)"


def test_live_graph_dispatch_ms(barrier):
    """Live path: 4K generator graph, packed-scalar dispatch.
    Steady state ~5.3 ms/frame at 4K60 (LATENCY_4K60.json); bound 12."""
    from lives_tpu.effects import instantiate
    from lives_tpu.graph import FrameGraph, SinkSpec
    from lives_tpu.io.genclip import GeneratorClip
    W, H = 3840, 2160
    fg = GeneratorClip("plasma", W, H, fps=60.0)
    bg = GeneratorClip("colour_bars", W, H, fps=60.0)
    g = FrameGraph([instantiate("saturation"), instantiate("vignette")],
                   SinkSpec(width=W, height=H), fps=60.0)
    g.run([fg, bg], 0.0, 0)
    barrier()
    N = 96
    t0 = time.perf_counter()
    for i in range(N):
        g.run([fg, bg], i / 60.0, i)
    barrier()
    ms = (time.perf_counter() - t0) / N * 1e3
    assert ms < 12.0, f"live 4K dispatch {ms:.2f} ms/frame (bound 12)"


def test_jpeg_device_decode_ms(barrier):
    """Compressed-ingest device half at 1080p. Steady ~9 ms/frame;
    bound 20."""
    import io as _io

    import jax.numpy as jnp
    from PIL import Image

    from lives_tpu.io.jpeg_ingest import (JpegStreamSource,
                                          build_device_decoder,
                                          load_jpegcoef)
    if load_jpegcoef() is None:
        pytest.skip("jpegcoef unavailable")
    yy, xx = np.mgrid[0:1080, 0:1920]
    frames = []
    for s in range(4):
        base = (128 + 70 * np.sin(xx / 23.0 + s)
                * np.cos(yy / 17.0)).clip(0, 255)
        rgb = np.stack([base] * 3, -1).astype(np.uint8)
        b = _io.BytesIO()
        Image.fromarray(rgb).save(b, "JPEG", quality=85)
        frames.append(b.getvalue())
    src = JpegStreamSource(frames)
    packed = src.entropy_pack(range(4))[:-1]
    dec = build_device_decoder(src.meta, 4, src.capacity)
    dev = [jnp.asarray(a) for a in packed]
    dec(*dev)
    barrier()
    t0 = time.perf_counter()
    for _ in range(5):
        dec(*dev)
    barrier()
    ms = (time.perf_counter() - t0) / 5 / 4 * 1e3
    assert ms < 20.0, f"jpeg device decode {ms:.2f} ms/frame (bound 20)"


def test_paced_live_mjpeg_1080p60(barrier, tmp_path):
    """Full player loop, paced at 60 fps, looping 1080p MJPEG clip with
    one fx key: steady state measured 59.8 fps shown / 0.1 drops/s
    (PERF_NOTES round 4). Bound at half: >= 30 fps shown — a regression
    in the precache worker, the drop policy, or a sync RPC sneaking into
    the serving path fails this loudly."""
    import io as _io
    import tempfile

    from PIL import Image

    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.clips import open_clip
    from lives_tpu.io.decoders import write_mjpeg_avi
    from lives_tpu.player import NullSink, Player
    yy, xx = np.mgrid[0:1080, 0:1920]
    frames = []
    for s in range(12):
        base = (128 + 70 * np.sin(xx / 23.0 + s * .3)
                * np.cos(yy / 17.0 - s * .2)).clip(0, 255)
        rgb = np.stack([base, np.roll(base, 40, 1), 255 - base],
                       -1).astype(np.uint8)
        b = _io.BytesIO()
        Image.fromarray(rgb).save(b, "JPEG", quality=85)
        frames.append(b.getvalue())
    avi = str(tmp_path / "c.avi")
    write_mjpeg_avi(avi, frames, 1920, 1080, 60.0)
    clip = open_clip(avi, tmp_path)
    p = Player(sink=NullSink(sync_every=8),
               sink_spec=SinkSpec(width=1920, height=1080), fps=60.0)
    p.precache_depth = 6
    p.pipeline_depth = 2
    p.prewarm_compile = False
    p.keymap.set_key(0, 0, "saturation")
    p.key_toggle(0, True)
    p.state.fg_clip = clip
    p.set_pb_fps(60.0)
    p.start()
    # warm until frames actually FLOW, not for a fixed interval: the
    # first template compile through the tunnel can run 30-300 s cold
    # (round-5 chip day measured 0.0 fps because a 2 s warm never
    # outlived the compile), then keep pacing 2 s of steady state
    t_dead = time.monotonic() + 420.0
    while p.frames_shown < 60 and time.monotonic() < t_dead:
        p.process_one()
        time.sleep(0.0005)
    assert p.frames_shown >= 60, "player never reached steady state"
    t_end = time.monotonic() + 2.0
    while time.monotonic() < t_end:          # settle post-compile
        p.process_one()
        time.sleep(0.0005)
    barrier()
    shown0 = p.frames_shown
    t0 = time.monotonic()
    while time.monotonic() - t0 < 4.0:
        p.process_one()
        time.sleep(0.0005)
    barrier()
    fps = (p.frames_shown - shown0) / (time.monotonic() - t0)
    p.stop()
    assert fps >= 30.0, f"paced live loop {fps:.1f} fps (bound 30)"


def test_scrap_capture_keeps_up_1080p30(barrier):
    """Generator scrap capture (recording tee): the encode worker must
    drain NATURAL 1080p content at >= 30 fps so live recordings never
    overflow the queue (what scrap records is generator/stream output —
    full-range noise is the JPEG worst case and is covered by the
    overflow fallback, not this ratchet). Wire v3 (compact buffer +
    used-prefix chunk fetch) measured 37.3 fps steady state on this
    attachment (PERF_NOTES round 5); bound at 30 = the production
    recording floor."""
    import jax.numpy as jnp

    from lives_tpu.constants import Palette
    from lives_tpu.io.jpeg_ingest import load_jpegcoef
    from lives_tpu.io.scrap import MJPEGScrapRecorder
    from lives_tpu.layer import Layer
    if load_jpegcoef() is None:
        pytest.skip("jpeg bridge unavailable")
    w, h = 1920, 1080
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for s in range(4):
        base = (128 + 70 * np.sin(xx / 23.0 + s * .3)
                * np.cos(yy / 17.0 - s * .2)).clip(0, 255)
        rgb = np.stack([base, np.roll(base, 40, 1),
                        255 - base]).astype(np.uint8)
        frames.append(Layer(planes=(jnp.asarray(rgb),),
                            palette=int(Palette.RGB24)))
    rec = MJPEGScrapRecorder(w, h, fps=30.0, max_queue=512)
    for lay in frames:
        rec.put(lay)
    # warm = the first encoded batch LANDED (the queue empties the
    # moment the worker grabs it, long before the cold compile ends)
    t_dead = time.time() + 600
    while not rec._sizes and rec._err is None and time.time() < t_dead:
        time.sleep(0.05)
    assert rec._sizes, f"encoder never produced output ({rec._err})"
    n = 96
    target = len(rec._sizes) + n
    t0 = time.time()
    for i in range(n):
        assert rec.put(frames[i % len(frames)]) is not None
    while len(rec._sizes) < target and time.time() - t0 < 60 \
            and rec._err is None:
        time.sleep(0.02)
    dt = time.time() - t0
    assert rec._err is None, f"encode worker died: {rec._err}"
    fps = n / dt
    print(f"scrap capture drain: {fps:.1f} fps")
    assert fps >= 30.0, f"scrap capture too slow: {fps:.1f} fps"
