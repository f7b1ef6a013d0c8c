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
