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


def test_spatial_random_chain_parity():
    """Property test: random band-safe chains match unsharded run_batch
    across the 8-device mesh."""
    import copy
    import random as pyrandom
    from lives_tpu.effects.host import instantiate
    from lives_tpu.graph.pallas_composite import COORD_SAFE, PALLAS_SAFE

    rng = pyrandom.Random(3)
    pool = sorted((PALLAS_SAFE | COORD_SAFE) - {"wipe"})
    h, w, B = 96, 128, 4
    for trial in range(4):
        chain = []
        track = 1
        for _ in range(rng.randint(2, 5)):
            inst = instantiate(rng.choice(pool))
            if inst.filter.n_in > 1:
                inst.in_tracks = (0, track)
                track += 1
            chain.append(inst)
        if rng.random() < 0.7:
            chain.append(instantiate("gaussian_blur",
                                     radius=rng.randint(1, 3)))
        g = FrameGraph([copy.deepcopy(i) for i in chain],
                       SinkSpec(width=w, height=h))
        rnd = np.random.default_rng(trial)
        layers = [Layer(planes=(jnp.asarray(
            rnd.integers(0, 256, (B, 3, h, w), np.uint8)),),
            palette=int(Palette.RGB24)) for _ in range(track)]
        tcs = np.arange(B) / 25.0
        frames = np.arange(B)
        ref = np.asarray(g.run_batch(layers, tcs, frames).planes[0])
        g2 = FrameGraph([copy.deepcopy(i) for i in chain],
                        SinkSpec(width=w, height=h))
        out = np.asarray(spatial_batch_fn(g2, frame_mesh(8))(
            layers, tcs, frames).planes[0])
        names = [i.filter.name for i in chain]
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1, (names, diff.max())
