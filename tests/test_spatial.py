"""Spatially-sharded FrameGraph execution (parallel/mesh.spatial_batch_fn):
1-device vs 8-device bitwise parity on a chain containing gaussian_blur
(the VERDICT r1 item-3 done-criterion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.effects import instantiate
from lives_tpu.graph import FrameGraph, SinkSpec
from lives_tpu.layer import Layer
from lives_tpu.parallel import frame_mesh, spatial_batch_fn, chain_band_halo


def _graph_and_layers(h=96, w=256, n_tracks=3, B=4):
    chain = []
    trans = ["crossfade", "blend_screen"]
    for t in range(1, n_tracks):
        inst = instantiate(trans[(t - 1) % len(trans)], amount=0.4)
        inst.in_tracks = (0, t)
        chain.append(inst)
    chain += [instantiate("gaussian_blur", radius=3, amount=0.7),
              instantiate("vignette", amount=0.6),
              instantiate("saturation", saturation=1.2)]
    g = FrameGraph(chain, SinkSpec(width=w, height=h))
    rng = np.random.default_rng(7)
    layers = [Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (B, 3, h, w), np.uint8)),),
        palette=int(Palette.RGB24)) for _ in range(n_tracks)]
    return g, layers


def test_spatial_parity_1dev_vs_8dev():
    g, layers = _graph_and_layers()
    B = layers[0].planes[0].shape[0]
    tcs = np.arange(B) / 25.0
    frames = np.arange(B)
    assert chain_band_halo(g) == 3
    run1 = spatial_batch_fn(g, frame_mesh(1))
    run8 = spatial_batch_fn(g, frame_mesh(8))
    out1 = np.asarray(run1(layers, tcs, frames).planes[0])
    out8 = np.asarray(run8(layers, tcs, frames).planes[0])
    np.testing.assert_array_equal(out1, out8)


def test_spatial_matches_unsharded_run_batch():
    """The spatially-sharded path must agree with the plain batch path
    (vignette exercises ctx_grid's global-coordinate handling)."""
    g, layers = _graph_and_layers()
    B = layers[0].planes[0].shape[0]
    tcs = np.arange(B) / 25.0
    frames = np.arange(B)
    ref = np.asarray(g.run_batch(layers, tcs, frames).planes[0])
    out = np.asarray(
        spatial_batch_fn(g, frame_mesh(8))(layers, tcs, frames).planes[0])
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1, diff.max()


def test_spatial_rejects_gathering_chain():
    g, _ = _graph_and_layers()
    g.chain.append(instantiate("rotozoom"))
    with pytest.raises(ValueError):
        chain_band_halo(g)


def test_grid_mesh_dp_x_sp_parity():
    """2-D mesh: 4-way DP x 2-way SP matches the unsharded batch path."""
    from lives_tpu.parallel import grid_batch_fn, grid_mesh
    g, layers = _graph_and_layers(h=96, w=256, n_tracks=3, B=8)
    tcs = np.arange(8) / 25.0
    frames = np.arange(8)
    ref = np.asarray(g.run_batch(layers, tcs, frames).planes[0])
    mesh = grid_mesh(4, 2)
    out = np.asarray(grid_batch_fn(g, mesh)(layers, tcs, frames).planes[0])
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1, diff.max()
