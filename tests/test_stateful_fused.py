"""Whole-plan fused STATEFUL sweep (graph/pallas_stateful.py): the
entire stateful chain — generation, stateless steps, EffecTV state —
in one pallas kernel with state carried in VMEM across frames. Parity
vs the pure-XLA scan path in CPU interpret mode; the real-TPU run is
exercised by benchmarks/render_stateful_led.py --fused-state."""

import os

import numpy as np
import pytest

from lives_tpu.effects import instantiate
from lives_tpu.graph import SinkSpec
from lives_tpu.graph.nodemodel import FrameGraph
from lives_tpu.scenes import DeviceSyntheticSource


def _mk_chain(kind):
    if kind == "fire_led":
        chain = [instantiate("fire", threshold=0.4, cooling=0.2),
                 instantiate("crossfade", amount=0.6),
                 instantiate("saturation", saturation=1.2),
                 instantiate("vignette", amount=0.5)]
        chain[1].in_tracks = (0, 1)
    elif kind == "alien":
        chain = [instantiate("alien_overlay"),
                 instantiate("crossfade", amount=0.4),
                 instantiate("saturation", saturation=1.1)]
        chain[1].in_tracks = (0, 1)
    elif kind == "life":
        chain = [instantiate("life", threshold=0.15, amount=0.5),
                 instantiate("brightness_contrast", brightness=0.05)]
    elif kind == "multi":
        chain = [instantiate("fire", threshold=0.5),
                 instantiate("alien_overlay"),
                 instantiate("crossfade", amount=0.5),
                 instantiate("vignette", amount=0.4)]
        chain[2].in_tracks = (0, 1)
    elif kind == "stencil_after":
        # blur AFTER fire: fire keeps remaining halo -> ping-pong planes
        chain = [instantiate("fire", threshold=0.5),
                 instantiate("gaussian_blur", radius=2.0),
                 instantiate("saturation", saturation=1.2)]
    elif kind == "life_blur":
        # life keeps halo for the blur: u8 ping-pong + halo fixup
        chain = [instantiate("life", threshold=0.15, amount=0.5),
                 instantiate("gaussian_blur", radius=2.0)]
    elif kind == "alien_blur":
        # pointwise stateful BEFORE a stencil: f32chw ping-pong planes
        chain = [instantiate("alien_overlay"),
                 instantiate("box_blur", radius=2.0)]
    elif kind == "stencil_before":
        # blur BEFORE fire: the blur's own output halo must be
        # edge-replicated before fire's sparks read it (review finding)
        chain = [instantiate("gaussian_blur", radius=2.0),
                 instantiate("fire", threshold=0.5),
                 instantiate("saturation", saturation=1.2)]
    elif kind == "sandwich":
        # consuming steps on both sides: blur -> life -> blur
        chain = [instantiate("gaussian_blur", radius=2.0),
                 instantiate("life", threshold=0.15, amount=0.5),
                 instantiate("box_blur", radius=1.0)]
    else:
        raise KeyError(kind)
    return chain


def _run(kind, fused: bool, B=5, H=32, W=128, chunks=2, tile=8):
    env = {"LIVES_TPU_PALLAS_INTERPRET": "1" if fused else "0",
           "LIVES_TPU_FUSED_SWEEP": "1" if fused else "0",
           "LIVES_TPU_FUSED_STATEFUL": "1" if fused else "0",
           # the scan path stores bf16 comps between effects by default;
           # parity vs the all-f32 kernel is asserted at f32 (same
           # methodology as test_stateful_sweep)
           "LIVES_TPU_CHAIN_DTYPE": "f32",
           "LIVES_TPU_SWEEP_TILE": str(tile)}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        src = DeviceSyntheticSource(H, W)
        g = FrameGraph(_mk_chain(kind), SinkSpec(width=W, height=H),
                       fps=25.0)
        outs = []
        for c in range(chunks):
            ids = np.zeros((2, 2, B), np.int32)
            ids[0, 0], ids[0, 1] = 1, 2
            ids[1] = np.arange(B) + c * B
            tcs = (np.arange(B) + c * B).astype(np.float32) / 25.0
            frames = (np.arange(B) + c * B).astype(np.int32)
            out = g.run_batch([], tcs, frames, source=src, src_args=ids)
            outs.append(np.asarray(out.planes[0]))
        states = [np.asarray(s) if s is not None else None
                  for s in g.states]
        if fused:
            # the parity assert is vacuous if the fused path silently
            # fell back: assert the BUILDER actually produced this
            # graph's template (key candidacy flags alone stay True
            # even when build returns None — review finding)
            from lives_tpu.graph.nodemodel import _TEMPLATE_KIND
            kinds = {_TEMPLATE_KIND.get(k) for k in g._templates
                     if isinstance(k, tuple) and k and k[0] == "batch"
                     and k[11]}
            assert "sf_fused" in kinds, \
                f"fused stateful sweep did not engage: {kinds}"
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return np.concatenate(outs), states


@pytest.mark.parametrize("kind", ["fire_led", "alien", "life", "multi",
                                  "stencil_after", "life_blur",
                                  "alien_blur", "stencil_before",
                                  "sandwich"])
def test_fused_stateful_parity(kind):
    """Frames within +/-1 LSB of the scan path AND the carried state
    (chunk boundary contract) matches bit-exactly."""
    ref, ref_states = _run(kind, fused=False)
    out, out_states = _run(kind, fused=True)
    assert out.shape == ref.shape
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"{kind}: max frame diff {diff.max()}"
    for a, b in zip(ref_states, out_states):
        assert (a is None) == (b is None)
        if a is not None:
            assert a.dtype == b.dtype and a.shape == b.shape
            np.testing.assert_allclose(
                b.astype(np.float64), a.astype(np.float64),
                rtol=0, atol=1e-5)


def test_fused_stateful_single_tile():
    """nT == 1 (the tile spans the full height): the staging branches
    collapse to the both-edges path."""
    ref, _ = _run("fire_led", fused=False, tile=32)
    out, _ = _run("fire_led", fused=True, tile=32)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_fused_stateful_engages():
    """The stateful sweep template actually builds for the fire-led
    chain (guards against a silent fallback to the 3-phase path)."""
    from lives_tpu.graph.nodemodel import _split_params
    from lives_tpu.graph.pallas_stateful import (
        build_fused_stateful_sweep, stateful_sweep_len)
    chain = _mk_chain("fire_led")
    assert stateful_sweep_len(chain)
    spec = []
    rows = []
    for idx, inst in enumerate(chain):
        static, traced = _split_params(inst)
        spec.append((inst.filter, static, inst.in_tracks,
                     inst.out_tracks, inst.enabled))
        rows += [(idx, k) for k in sorted(traced)]
    src = DeviceSyntheticSource(32, 128)
    os.environ["LIVES_TPU_PALLAS_INTERPRET"] = "1"
    os.environ["LIVES_TPU_SWEEP_TILE"] = "8"
    try:
        fn = build_fused_stateful_sweep(
            spec, 2, 4, 32, 128, tuple(rows), 25.0, src,
            SinkSpec(width=128, height=32))
        assert fn is not None
        import jax.numpy as jnp
        states = [None] * len(chain)
        states[0] = chain[0].filter.init_state(128, 32, None)
        packed = np.zeros((len(rows) + 2, 4), np.float32)
        for r, (idx, k) in enumerate(rows):
            packed[r] = float(chain[idx].values.get(
                k, chain[idx].filter.param(k).default))
        u8, new_states = fn(np.zeros((2, 2, 4), np.int32), packed, states)
        assert u8.shape == (4, 3, 32, 128) and str(u8.dtype) == "uint8"
        assert new_states[0].shape == (32, 128)
    finally:
        os.environ.pop("LIVES_TPU_PALLAS_INTERPRET", None)
        os.environ.pop("LIVES_TPU_SWEEP_TILE", None)


def test_unsupported_stateful_falls_back():
    """rgb_delay (HBM-ring state) is not kernel-supported: the chain
    must take the 3-phase path and still render correctly."""
    from lives_tpu.graph.pallas_stateful import stateful_sweep_len
    chain = [instantiate("rgb_delay", delay_g=1.0),
             instantiate("saturation", saturation=1.2)]
    assert not stateful_sweep_len(chain)
