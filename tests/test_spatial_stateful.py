"""Spatially-sharded STATEFUL chains (parallel/mesh.spatial_stateful_fn):
each chip owns a row band of the frame AND of every state plane; frames
scan sequentially with a per-frame ppermute halo exchange of both. The
reference cannot parallelise stateful plugins at all (plugin_internal
whole-frame buffers force single-threading, effects-weed.c:1563)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.effects import instantiate
from lives_tpu.graph import FrameGraph, SinkSpec
from lives_tpu.layer import Layer
from lives_tpu.parallel import (chain_band_halo_stateful, frame_mesh,
                                spatial_stateful_fn)


def _mk(h=64, w=256, n_tracks=2, B=6, kind="fire"):
    chain = []
    if kind == "fire":
        chain.append(instantiate("fire", threshold=0.4, cooling=0.2))
    elif kind == "bench":
        # the stateful-led bench shape: fire + rgb_delay lead
        chain.append(instantiate("fire", threshold=0.5))
        chain.append(instantiate("rgb_delay", delay_r=0.0, delay_g=1.0,
                                 delay_b=2.0))
    elif kind == "life":
        chain.append(instantiate("life", threshold=0.15, amount=0.5))
    elif kind == "nervous":
        chain.append(instantiate("nervous"))
    for t in range(1, n_tracks):
        inst = instantiate("crossfade", amount=0.5)
        inst.in_tracks = (0, t)
        chain.append(inst)
    chain += [instantiate("saturation", saturation=1.2),
              instantiate("vignette", amount=0.5)]
    g = FrameGraph(chain, SinkSpec(width=w, height=h))
    rng = np.random.default_rng(11)
    layers = [Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (B, 3, h, w), np.uint8)),),
        palette=int(Palette.RGB24)) for _ in range(n_tracks)]
    return g, layers


@pytest.mark.parametrize("kind,halo", [("fire", 1), ("bench", 1),
                                       ("life", 1), ("nervous", 0)])
def test_spatial_stateful_matches_unsharded(kind, halo):
    g, layers = _mk(kind=kind)
    assert chain_band_halo_stateful(g) == halo
    B = layers[0].planes[0].shape[0]
    tcs = np.arange(B) / 25.0
    frames = np.arange(B)
    ref = np.asarray(g.run_batch(layers, tcs, frames).planes[0])
    ref_states = list(g.states)

    g2, _ = _mk(kind=kind)
    out = np.asarray(spatial_stateful_fn(g2, frame_mesh(8))(
        layers, tcs, frames).planes[0])
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"{kind}: {diff.max()}"
    # carried state agrees (chunk-boundary contract)
    import jax
    for a, b in zip(ref_states, [s for s in g2.states]):
        if a is None:
            assert b is None
            continue
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(lb, np.float64),
                                       np.asarray(la, np.float64),
                                       rtol=0, atol=1e-5)


def test_spatial_stateful_1dev_vs_8dev_bitwise():
    g1, layers = _mk(kind="bench")
    B = layers[0].planes[0].shape[0]
    tcs = np.arange(B) / 25.0
    frames = np.arange(B)
    out1 = np.asarray(spatial_stateful_fn(g1, frame_mesh(1))(
        layers, tcs, frames).planes[0])
    g8, _ = _mk(kind="bench")
    out8 = np.asarray(spatial_stateful_fn(g8, frame_mesh(8))(
        layers, tcs, frames).planes[0])
    np.testing.assert_array_equal(out1, out8)


def test_state_carries_across_calls():
    """Two 3-frame runs equal one 6-frame run (the state carry through
    graph.states survives call boundaries, run_batch's contract)."""
    g, layers = _mk(kind="fire", B=6)
    tcs = np.arange(6) / 25.0
    frames = np.arange(6)
    whole = np.asarray(spatial_stateful_fn(g, frame_mesh(8))(
        layers, tcs, frames).planes[0])

    g2, _ = _mk(kind="fire", B=6)
    run = spatial_stateful_fn(g2, frame_mesh(8))
    l0 = Layer(planes=(layers[0].planes[0][:3],),
               palette=int(Palette.RGB24))
    l1 = Layer(planes=(layers[1].planes[0][:3],),
               palette=int(Palette.RGB24))
    a = np.asarray(run([l0, l1], tcs[:3], frames[:3]).planes[0])
    l0b = Layer(planes=(layers[0].planes[0][3:],),
                palette=int(Palette.RGB24))
    l1b = Layer(planes=(layers[1].planes[0][3:],),
                palette=int(Palette.RGB24))
    b = np.asarray(run([l0b, l1b], tcs[3:], frames[3:]).planes[0])
    np.testing.assert_array_equal(np.concatenate([a, b]), whole)


def test_unsafe_stateful_rejected():
    g, _ = _mk(kind="fire")
    g.chain.insert(0, instantiate("feedback"))  # global warp: not band-safe
    g.states.insert(0, None)
    with pytest.raises(ValueError):
        chain_band_halo_stateful(g)


def test_stencil_in_stateful_chain_rejected():
    """Stencil + stateful mixing breaks frame-edge exactness in the
    banded path (documented); must be rejected, not silently wrong."""
    g, _ = _mk(kind="fire")
    g.chain.append(instantiate("gaussian_blur", radius=2))
    g.states.append(None)
    with pytest.raises(ValueError):
        chain_band_halo_stateful(g)
