"""Stateful (EffecTV-class) effect tests: state threading, scan batch path,
sequential/batch equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.effects import FrameContext, apply_instance, instantiate
from lives_tpu.effects.host import FILTER_STATEFUL
from lives_tpu.graph import FrameGraph, SinkSpec

STATEFUL = ["rgb_delay", "fire", "life", "blurzoom", "onedtv", "nervous",
            "feedback"]


def mk_layer(rng, h=24, w=48):
    return Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (3, h, w), np.uint8)),),
        palette=int(Palette.RGB24))


@pytest.mark.parametrize("name", STATEFUL)
def test_stateful_smoke_and_state_updates(rng, name):
    inst = instantiate(name)
    assert inst.filter.flags & FILTER_STATEFUL
    lay = mk_layer(rng)
    ctx = FrameContext(tc=0.0, frame=0, width=48, height=24)
    out1 = apply_instance(inst, [lay], ctx)[0]
    assert inst.state is not None
    out2 = apply_instance(inst, [mk_layer(rng)], ctx)[0]
    np.asarray(out2.planes[0])


def test_rgb_delay_semantics(rng):
    """channel delayed by 1 frame shows the previous frame's channel."""
    inst = instantiate("rgb_delay", delay_r=0.0, delay_g=1.0, delay_b=1.0)
    f0, f1 = mk_layer(rng), mk_layer(rng)
    ctx = FrameContext(width=48, height=24)
    apply_instance(inst, [f0], ctx)
    out = np.asarray(apply_instance(inst, [f1], ctx)[0].planes[0])
    np.testing.assert_array_equal(out[0], np.asarray(f1.planes[0])[0])
    np.testing.assert_array_equal(out[1], np.asarray(f0.planes[0])[1])


def test_feedback_accumulates(rng):
    inst = instantiate("feedback", feedback=0.9, zoom=0.5)
    bright = Layer(planes=(jnp.full((3, 24, 48), 200, jnp.uint8),),
                   palette=int(Palette.RGB24))
    dark = Layer(planes=(jnp.zeros((3, 24, 48), jnp.uint8),),
                 palette=int(Palette.RGB24))
    ctx = FrameContext(width=48, height=24)
    for _ in range(20):  # IIR converges toward the bright input
        apply_instance(inst, [bright], ctx)
    out = np.asarray(apply_instance(inst, [dark], ctx)[0].planes[0])
    assert out.mean() > 50  # accumulated bright state echoes through


def test_scan_batch_equals_sequential(rng):
    """run_batch (lax.scan) must equal frame-by-frame run."""
    frames = [rng.integers(0, 256, (3, 24, 48), np.uint8) for _ in range(6)]

    def run_sequential():
        g = FrameGraph([instantiate("rgb_delay", delay_r=0.0, delay_g=2.0,
                                    delay_b=3.0)], SinkSpec())
        outs = []
        for i, f in enumerate(frames):
            lay = Layer(planes=(jnp.asarray(f),), palette=int(Palette.RGB24))
            outs.append(np.asarray(g.run([lay], tc=i / 25, frame=i)
                                   .planes[0]))
        return np.stack(outs)

    def run_batched():
        g = FrameGraph([instantiate("rgb_delay", delay_r=0.0, delay_g=2.0,
                                    delay_b=3.0)], SinkSpec())
        batch = Layer(planes=(jnp.asarray(np.stack(frames)),),
                      palette=int(Palette.RGB24))
        tcs = np.arange(6, dtype=np.float32) / 25
        out = g.run_batch([batch], tcs, np.arange(6, dtype=np.int32))
        return np.asarray(out.planes[0])

    np.testing.assert_array_equal(run_sequential(), run_batched())


def test_stateful_in_mixed_chain_batch(rng):
    """Stateful + stateless chain renders via scan and stays bounded."""
    chain = [instantiate("feedback", feedback=0.5),
             instantiate("vignette", amount=0.5)]
    g = FrameGraph(chain, SinkSpec())
    frames = np.stack([rng.integers(0, 256, (3, 24, 48), np.uint8)
                       for _ in range(4)])
    batch = Layer(planes=(jnp.asarray(frames),), palette=int(Palette.RGB24))
    out = g.run_batch([batch], np.arange(4, np.float32) / 25 if False
                      else np.arange(4, dtype=np.float32) / 25,
                      np.arange(4, dtype=np.int32))
    arr = np.asarray(out.planes[0])
    assert arr.shape == (4, 3, 24, 48)
    assert arr.dtype == np.uint8


def test_edge_filter(rng):
    lay = mk_layer(rng)
    out = np.asarray(apply_instance(instantiate("edge", amount=1.0),
                                    [lay])[0].planes[0])
    # uniform input -> no edges -> black
    flat = Layer(planes=(jnp.full((3, 24, 48), 120, jnp.uint8),),
                 palette=int(Palette.RGB24))
    out2 = np.asarray(apply_instance(instantiate("edge", amount=1.0),
                                     [flat])[0].planes[0])
    assert out2.max() == 0 and out.max() > 0


def test_vertigo_accumulates(rng):
    inst = instantiate("vertigo", feedback=0.9)
    bright = Layer(planes=(jnp.full((3, 24, 48), 220, jnp.uint8),),
                   palette=int(Palette.RGB24))
    dark = Layer(planes=(jnp.zeros((3, 24, 48), jnp.uint8),),
                 palette=int(Palette.RGB24))
    ctx = FrameContext(width=48, height=24)
    for _ in range(15):
        apply_instance(inst, [bright], ctx)
    echo = np.asarray(apply_instance(inst, [dark], ctx)[0].planes[0])
    assert echo.mean() > 40
