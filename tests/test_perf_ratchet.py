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
