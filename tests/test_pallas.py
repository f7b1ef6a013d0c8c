"""Pallas kernel parity tests (run in interpret mode on the CPU test mesh;
the real-chip path is exercised by benchmarks/pallas_bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lives_tpu.constants import YUVClamping, YUVSubspace
from lives_tpu.ops import colorspace as cs
from lives_tpu.ops import colorspace_ref as ref
from lives_tpu.ops import pallas_kernels as pk

# Mosaic kernels need a real TPU; the test suite's CPU mesh can only run
# them in interpret mode, which is impractically slow. These tests run when
# invoked with JAX_PLATFORMS unset (see benchmarks/pallas_bench.py for the
# perf side).
pytestmark = pytest.mark.skipif(
    not pk.HAVE_PALLAS or jax.default_backend() in ("cpu",),
    reason="pallas kernels require TPU backend")


@pytest.mark.parametrize("clamping", [YUVClamping.CLAMPED,
                                      YUVClamping.UNCLAMPED])
def test_yuv420_to_rgb_parity(rng, clamping):
    h, w = 64, 256
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    r, g, b = pk.yuv420_to_rgb(y, u, v, int(YUVSubspace.YCBCR),
                               int(clamping))
    # twin: nearest-upsample + matrix
    u4 = ref.chroma_up(u, 2, 2)
    v4 = ref.chroma_up(v, 2, 2)
    er, eg, eb = ref.yuv_to_rgb_planes(y, u4, v4, YUVSubspace.YCBCR,
                                       clamping)
    for e, d, name in ((er, r, "R"), (eg, g, "G"), (eb, b, "B")):
        diff = np.abs(e.astype(int) - np.asarray(d).astype(int)).max()
        assert diff <= 1, f"{name}: {diff}"


def test_yuv420_to_rgb_matches_jnp_path(rng):
    h, w = 32, 256
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    r, g, b = pk.yuv420_to_rgb(y, u, v)
    jr, jg, jb = cs.yuv_to_rgb(cs.chroma_up(jnp.asarray(y), 1, 1),
                               cs.chroma_up(jnp.asarray(u), 2, 2),
                               cs.chroma_up(jnp.asarray(v), 2, 2))
    for a, bb in ((r, jr), (g, jg), (b, jb)):
        assert np.abs(np.asarray(a).astype(int)
                      - np.asarray(bb).astype(int)).max() <= 1


@pytest.mark.parametrize("clamping", [YUVClamping.CLAMPED,
                                      YUVClamping.UNCLAMPED])
def test_rgb_to_yuv420_parity(rng, clamping):
    h, w = 64, 256
    r = rng.integers(0, 256, (h, w), dtype=np.uint8)
    g = rng.integers(0, 256, (h, w), dtype=np.uint8)
    b = rng.integers(0, 256, (h, w), dtype=np.uint8)
    y, u, v = pk.rgb_to_yuv420(r, g, b, int(YUVSubspace.YCBCR),
                               int(clamping))
    ey, eu, ev = ref.rgb_to_yuv_planes(r, g, b, YUVSubspace.YCBCR, clamping)
    eu = ref.chroma_down(eu, 2, 2)
    ev = ref.chroma_down(ev, 2, 2)
    assert np.abs(ey.astype(int) - np.asarray(y).astype(int)).max() <= 1
    # box-average of +/-1-divergent inputs stays within 1
    assert np.abs(eu.astype(int) - np.asarray(u).astype(int)).max() <= 1
    assert np.abs(ev.astype(int) - np.asarray(v).astype(int)).max() <= 1


def test_supported_predicate():
    assert pk.yuv420_to_rgb_supported(1080, 1920)
    assert pk.yuv420_to_rgb_supported(2160, 3840)
    assert not pk.yuv420_to_rgb_supported(33, 64)


def test_composite_kernel_matches_xla_chain(rng):
    """Opt-in pallas composite path must match the XLA chain exactly
    (same process fns, same u8 quantisation points)."""
    import os
    import numpy as np
    from lives_tpu.constants import Palette
    from lives_tpu.layer import Layer
    from lives_tpu.effects import instantiate
    from lives_tpu.graph import FrameGraph, SinkSpec

    B, H, W = 4, 64, 256
    tracks_np = [rng.integers(0, 256, (B, 3, H, W), np.uint8)
                 for _ in range(3)]

    def build_chain():
        c1 = instantiate("crossfade", amount=0.3); c1.in_tracks = (0, 1)
        c2 = instantiate("blend_screen", amount=0.6); c2.in_tracks = (0, 2)
        c3 = instantiate("saturation", saturation=1.5)
        return [c1, c2, c3]

    def render(use_pallas):
        os.environ["LIVES_TPU_PALLAS_COMPOSITE"] = "1" if use_pallas else "0"
        g = FrameGraph(build_chain(), SinkSpec(), fps=25.0)
        layers = [Layer(planes=(jnp.asarray(t),),
                        palette=int(Palette.RGB24)) for t in tracks_np]
        out = g.run_batch(layers, np.arange(B, dtype=np.float32) / 25,
                          np.arange(B, dtype=np.int32))
        return np.asarray(out.planes[0])

    try:
        a = render(False)
        b = render(True)
    finally:
        os.environ.pop("LIVES_TPU_PALLAS_COMPOSITE", None)
    # same math; XLA path uses a float chain between effects while the
    # kernel quantises to u8 per stage (reference-accurate) -> within 2
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 2


def test_fused_sweep_matches_xla_path_on_tpu():
    """Real-TPU parity of the production fused sweep vs the XLA plan path
    on the driver's multitrack chain (the CPU suite covers the same in
    interpret mode: tests/test_fused_sweep.py)."""
    import os
    from lives_tpu.events.renderer import render_to_arrays
    from lives_tpu.graph import SinkSpec
    from lives_tpu.scenes import DeviceSyntheticSource, multitrack_timeline

    w, h = 384, 120
    el = multitrack_timeline(n_tracks=6, n_frames=8, width=w, height=h,
                             fps=25.0)
    src = DeviceSyntheticSource(h, w)
    sink = SinkSpec(width=w, height=h)
    old = {k: os.environ.get(k) for k in
           ("LIVES_TPU_FUSED_SWEEP", "LIVES_TPU_CHAIN_DTYPE")}
    try:
        # f32 inter-stage comps on the XLA side: apples-to-apples with the
        # f32 fused kernel (the production bf16 path differs by <=4 LSB)
        os.environ["LIVES_TPU_FUSED_SWEEP"] = "0"
        os.environ["LIVES_TPU_CHAIN_DTYPE"] = "f32"
        ref_arr, _ = render_to_arrays(el, src, sink, batch_size=4)
        os.environ["LIVES_TPU_FUSED_SWEEP"] = "1"
        out_arr, _ = render_to_arrays(el, src, sink, batch_size=4)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    diff = np.abs(np.asarray(out_arr).astype(int)
                  - np.asarray(ref_arr).astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
