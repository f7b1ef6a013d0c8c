"""Stateful-chain prefix sweep: generation + the stateless prefix fuse
into one pallas kernel (float comp out); only the stateful remainder
scans. Parity vs the pure-XLA scan path (CPU interpret mode; the
real-TPU run is exercised by benchmarks/render_stateful.py)."""

import os

import numpy as np
import pytest

from lives_tpu.effects import instantiate
from lives_tpu.graph import SinkSpec
from lives_tpu.graph.nodemodel import FrameGraph
from lives_tpu.scenes import DeviceSyntheticSource


def _chain():
    chain = [instantiate("crossfade", amount=0.6),
             instantiate("vignette", amount=0.5),
             instantiate("rgb_delay", delay_r=0.0, delay_g=1.0,
                         delay_b=2.0),
             instantiate("saturation", saturation=1.2)]
    chain[0].in_tracks = (0, 1)
    return chain


def _run(fused: bool, B=6, H=48, W=256, chunks=2):
    env = {"LIVES_TPU_PALLAS_INTERPRET": "1" if fused else "0",
           "LIVES_TPU_FUSED_SWEEP": "1" if fused else "0",
           "LIVES_TPU_CHAIN_DTYPE": "f32"}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        src = DeviceSyntheticSource(H, W)
        g = FrameGraph(_chain(), SinkSpec(width=W, height=H), fps=25.0)
        outs = []
        for c in range(chunks):
            ids = np.zeros((2, 2, B), np.int32)
            ids[0, 0], ids[0, 1] = 1, 2
            ids[1] = np.arange(B) + c * B
            tcs = (np.arange(B) + c * B).astype(np.float32) / 25.0
            frames = (np.arange(B) + c * B).astype(np.int32)
            out = g.run_batch([], tcs, frames, source=src, src_args=ids)
            outs.append(np.asarray(out.planes[0]))
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return np.concatenate(outs)


def test_stateful_prefix_sweep_parity():
    ref = _run(fused=False)
    out = _run(fused=True)
    assert out.shape == ref.shape
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_prefix_engages():
    """The prefix sweep template actually builds for this chain (guards
    against a silent fallback to the materialise path)."""
    from lives_tpu.graph import nodemodel
    from lives_tpu.graph.pallas_composite import build_fused_sweep
    src = DeviceSyntheticSource(48, 256)
    chain = _chain()
    spec = []
    from lives_tpu.graph.nodemodel import _split_params
    for inst in chain[:2]:
        static, _ = _split_params(inst)
        spec.append((inst.filter, static, inst.in_tracks,
                     inst.out_tracks, inst.enabled))
    os.environ["LIVES_TPU_PALLAS_INTERPRET"] = "1"
    try:
        fn = build_fused_sweep(spec, 2, 4, 48, 256, (), 25.0, src,
                               SinkSpec(width=256, height=48), emit="comp")
        assert fn is not None
        comp = fn(np.zeros((2, 2, 4), np.int32),
                  np.zeros((2, 4), np.float32))
        assert comp.shape == (4, 3, 48, 256)
        assert str(comp.dtype) in ("bfloat16", "float32")
    finally:
        os.environ.pop("LIVES_TPU_PALLAS_INTERPRET", None)


def _run_dt(fused: bool, dtype: str):
    env = {"LIVES_TPU_PALLAS_INTERPRET": "1" if fused else "0",
           "LIVES_TPU_FUSED_SWEEP": "1" if fused else "0",
           "LIVES_TPU_CHAIN_DTYPE": dtype}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        src = DeviceSyntheticSource(48, 256)
        g = FrameGraph(_chain(), SinkSpec(width=256, height=48), fps=25.0)
        ids = np.zeros((2, 2, 6), np.int32)
        ids[0, 0], ids[0, 1] = 1, 2
        ids[1] = np.arange(6)
        out = g.run_batch([], np.arange(6, dtype=np.float32) / 25.0,
                          np.arange(6, dtype=np.int32),
                          source=src, src_args=ids)
        return np.asarray(out.planes[0])
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_stateful_prefix_sweep_bf16_envelope():
    """The PRODUCTION default emits a bf16 comp; drift vs the bf16 XLA
    path must stay within the documented bf16 envelope (<=4 LSB)."""
    ref = _run_dt(fused=False, dtype="bf16")
    out = _run_dt(fused=True, dtype="bf16")
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 4, f"bf16 drift {diff.max()}"


def test_spatial_sweep_bitwise_parity_8dev():
    """The spatially-sharded fused sweep (zero collectives: each device
    generates its own halo) is BITWISE identical to the single-device
    sweep on the 8-device mesh (interpret mode)."""
    import jax
    from lives_tpu.graph.nodemodel import _split_params
    from lives_tpu.graph.pallas_composite import build_fused_sweep
    from lives_tpu.parallel.mesh import frame_mesh, spatial_sweep_fn

    env = {"LIVES_TPU_PALLAS_INTERPRET": "1"}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        H, W, B = 64, 256, 4
        src = DeviceSyntheticSource(H, W)
        chain = [instantiate("crossfade", amount=0.6),
                 instantiate("gaussian_blur", radius=2, amount=1.0),
                 instantiate("vignette", amount=0.7)]
        chain[0].in_tracks = (0, 1)
        g = FrameGraph(chain, SinkSpec(width=W, height=H), fps=25.0)
        spec, rows = [], []
        for i, inst in enumerate(g.chain):
            static, traced = _split_params(inst)
            spec.append((inst.filter, static, inst.in_tracks,
                         inst.out_tracks, inst.enabled))
            rows += [(i, k) for k in sorted(traced)]
        ids = np.zeros((2, 2, B), np.int32)
        ids[0, 0], ids[0, 1] = 1, 2
        ids[1] = np.arange(B)
        packed = np.stack(
            [np.full(B, 0.6, np.float32), np.full(B, 1.0, np.float32),
             np.full(B, 0.7, np.float32),
             np.arange(B, dtype=np.float32) / 25.0,
             np.arange(B, dtype=np.float32)])
        single = build_fused_sweep(spec, 2, B, H, W, tuple(rows), 25.0,
                                   src, g.sink)
        assert single is not None
        ref = np.asarray(single(ids, packed))
        mesh = frame_mesh(8, axis="s")
        run = spatial_sweep_fn(g, mesh, src, B, H, W, axis="s")
        assert run is not None
        out = run(ids, packed)
        assert out is not None
        np.testing.assert_array_equal(np.asarray(out), ref)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_band_sweep_respects_sink_constraints():
    """Band mode must refuse non-RGB24/letterbox sinks like the full
    sweep does (it writes quantised RGB24 with no sink convert step)."""
    from lives_tpu.constants import Palette
    from lives_tpu.graph.nodemodel import _split_params
    from lives_tpu.graph.pallas_composite import build_fused_sweep
    os.environ["LIVES_TPU_PALLAS_INTERPRET"] = "1"
    try:
        src = DeviceSyntheticSource(64, 256)
        inst = instantiate("negate")
        static, _ = _split_params(inst)
        spec = [(inst.filter, static, inst.in_tracks, inst.out_tracks,
                 True)]
        bad = SinkSpec(width=256, height=64,
                       palette=int(Palette.YUV420P))
        assert build_fused_sweep(spec, 1, 2, 64, 256, (), 25.0, src, bad,
                                 band_h=32) is None
        ok = SinkSpec(width=256, height=64)
        assert build_fused_sweep(spec, 1, 2, 64, 256, (), 25.0, src, ok,
                                 band_h=32) is not None
    finally:
        os.environ.pop("LIVES_TPU_PALLAS_INTERPRET", None)


def test_spatial_sweep_fallback_for_unsafe_chain():
    """Chains the kernel cannot fuse (gather warps) return None — callers
    fall back to the ppermute band path."""
    from lives_tpu.parallel.mesh import frame_mesh, spatial_sweep_fn
    os.environ["LIVES_TPU_PALLAS_INTERPRET"] = "1"
    try:
        src = DeviceSyntheticSource(64, 256)
        g = FrameGraph([instantiate("kaleidoscope")],
                       SinkSpec(width=256, height=64), fps=25.0)
        run = spatial_sweep_fn(g, frame_mesh(8, axis="s"), src, 4, 64, 256,
                               axis="s")
        ids = np.zeros((2, 1, 4), np.int32)
        packed = np.zeros((4, 4), np.float32)
        assert run(ids, packed) is None
    finally:
        os.environ.pop("LIVES_TPU_PALLAS_INTERPRET", None)


# -- round 3: fused SUFFIX sweep (stateful-LED chains) ----------------------

def _led_chain(T=4):
    """Chain LED by stateful fx, transitions + colour work after — no
    fusable prefix, a fusable suffix (VERDICT item 2 shape:
    fireTV.c/blurzoom.c-led chains)."""
    chain = [instantiate("fire", threshold=0.6),
             instantiate("rgb_delay", delay_r=0.0, delay_g=1.0,
                         delay_b=2.0)]
    names = ["crossfade", "blend_screen", "blend_add"]
    for t in range(1, T):
        inst = instantiate(names[(t - 1) % len(names)], amount=0.5)
        inst.in_tracks = (0, t)
        chain.append(inst)
    chain += [instantiate("saturation", saturation=1.2),
              instantiate("vignette", amount=0.5)]
    return chain


def _run_led(fused: bool, B=6, H=48, W=256, chunks=2, T=4):
    env = {"LIVES_TPU_PALLAS_INTERPRET": "1" if fused else "0",
           "LIVES_TPU_FUSED_SWEEP": "1" if fused else "0",
           "LIVES_TPU_CHAIN_DTYPE": "f32"}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        src = DeviceSyntheticSource(H, W)
        g = FrameGraph(_led_chain(T), SinkSpec(width=W, height=H),
                       fps=25.0)
        outs = []
        for c in range(chunks):
            ids = np.zeros((2, T, B), np.int32)
            for t in range(T):
                ids[0, t] = t + 1
            ids[1] = np.arange(B) + c * B
            tcs = (np.arange(B) + c * B).astype(np.float32) / 25.0
            frames = (np.arange(B) + c * B).astype(np.int32)
            out = g.run_batch([], tcs, frames, source=src, src_args=ids)
            outs.append(np.asarray(out.planes[0]))
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return np.concatenate(outs)


def test_stateful_suffix_sweep_parity():
    ref = _run_led(fused=False)
    out = _run_led(fused=True)
    assert out.shape == ref.shape
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_suffix_engages():
    """sweep_suffix_len finds the trailing stateless run and the suffix
    kernel builds for it (consume='comp')."""
    from lives_tpu.graph.nodemodel import _split_params
    from lives_tpu.graph.pallas_composite import (build_fused_sweep,
                                                  sweep_suffix_len)
    chain = _led_chain(T=4)
    n = sweep_suffix_len(chain)
    assert n == 5      # 3 transitions + saturation + vignette
    src = DeviceSyntheticSource(48, 256)
    spec = []
    for inst in chain[-n:]:
        static, _ = _split_params(inst)
        spec.append((inst.filter, static, inst.in_tracks,
                     inst.out_tracks, inst.enabled))
    os.environ["LIVES_TPU_PALLAS_INTERPRET"] = "1"
    try:
        fn = build_fused_sweep(spec, 4, 4, 48, 256, (), 25.0, src,
                               SinkSpec(width=256, height=48),
                               consume="comp", idx_base=len(chain) - n)
        assert fn is not None
        os.environ["LIVES_TPU_CHAIN_DTYPE"] = "f32"
        comps = np.random.default_rng(0).random((4, 3, 48, 256)
                                                ).astype(np.float32)
        out = fn(np.zeros((2, 4, 4), np.int32),
                 np.zeros((2, 4), np.float32), comps)
        assert np.asarray(out).shape == (4, 3, 48, 256)
        assert np.asarray(out).dtype == np.uint8
    finally:
        os.environ.pop("LIVES_TPU_PALLAS_INTERPRET", None)
        os.environ.pop("LIVES_TPU_CHAIN_DTYPE", None)
