"""Fused single-sweep pallas kernel (graph/pallas_composite.build_fused_sweep)
vs the XLA plan-template path: bitwise-near parity on the driver's multitrack
chain, via interpret mode on the CPU mesh (the real-TPU run is covered in
test_pallas.py)."""

import os

import numpy as np
import pytest

from lives_tpu.events.renderer import render_to_arrays
from lives_tpu.graph import SinkSpec
from lives_tpu.scenes import DeviceSyntheticSource, multitrack_timeline


def _render(w, h, n_frames, fused: bool, batch=4, tracks=4,
            chain_dtype=None):
    from lives_tpu.graph import nodemodel
    el = multitrack_timeline(n_tracks=tracks, n_frames=n_frames,
                             width=w, height=h, fps=25.0)
    src = DeviceSyntheticSource(h, w)
    sink = SinkSpec(width=w, height=h)
    env = {"LIVES_TPU_PALLAS_INTERPRET": "1" if fused else "0",
           "LIVES_TPU_FUSED_SWEEP": "1" if fused else "0"}
    if chain_dtype:
        env["LIVES_TPU_CHAIN_DTYPE"] = chain_dtype
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        arr, tcs = render_to_arrays(el, src, sink, batch_size=batch)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return np.asarray(arr)


def test_fused_sweep_parity_with_xla_path():
    """Strict +/-1 LSB against the XLA path with f32 inter-stage comps
    (both paths then compute the same chain in f32)."""
    # geometry chosen to satisfy sweep constraints: W % 128 == 0,
    # H divisible by a sweep tile
    w, h = 256, 48
    ref = _render(w, h, 8, fused=False, chain_dtype="f32")
    out = _render(w, h, 8, fused=True)
    assert out.shape == ref.shape
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()} at {np.unravel_index(diff.argmax(), diff.shape)}"


def test_fused_sweep_close_to_bf16_production_path():
    """The production XLA path stores bf16 between effects (bandwidth);
    the fused kernel computes f32 throughout — document the bound."""
    w, h = 256, 48
    ref = _render(w, h, 8, fused=False)          # bf16 comps (default)
    out = _render(w, h, 8, fused=True)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 4, f"bf16-vs-f32 drift {diff.max()}"


def test_fused_sweep_rejects_unsupported():
    """Chains/sinks outside the sweep contract fall back (return None)."""
    from lives_tpu.effects.host import instantiate
    from lives_tpu.graph.nodemodel import _split_params
    from lives_tpu.graph.pallas_composite import build_fused_sweep
    src = DeviceSyntheticSource(48, 256)
    sink = SinkSpec(width=256, height=48)

    def spec_of(*names):
        out = []
        for n in names:
            inst = instantiate(n)
            st, _ = _split_params(inst)
            out.append((inst.filter, st, inst.in_tracks, inst.out_tracks,
                        True))
        return out

    os.environ["LIVES_TPU_PALLAS_INTERPRET"] = "1"
    try:
        rows = ()
        # rotozoom gathers -> not fusible
        assert build_fused_sweep(spec_of("rotozoom"), 1, 2, 48, 256, rows,
                                 25.0, src, sink) is None
        # letterboxed sink -> not fusible
        import dataclasses
        lsink = dataclasses.replace(sink, letterbox=True, width=128)
        assert build_fused_sweep(spec_of("negate"), 1, 2, 48, 256, rows,
                                 25.0, src, lsink) is None
        # fusible chain is accepted
        assert build_fused_sweep(spec_of("negate", "vignette"), 1, 2, 48,
                                 256, rows, 25.0, src, sink) is not None
    finally:
        os.environ.pop("LIVES_TPU_PALLAS_INTERPRET", None)


def test_fused_sweep_empty_chain():
    """A segment with no active filters still renders through the sweep
    (generation + quantise only)."""
    import numpy as np
    from lives_tpu.events.event_list import EventList, frame_event
    from lives_tpu.events.renderer import render_to_arrays
    el = EventList(fps=25.0, width=256, height=48)
    for i in range(4):
        el.insert(frame_event(i * 4_000_000, [1], [i]))
    src = DeviceSyntheticSource(48, 256)
    sink = SinkSpec(width=256, height=48)
    arr, _ = render_to_arrays(el, src, sink, batch_size=4)
    ref = np.asarray(src.get_batch([1] * 4, list(range(4))).planes[0])
    np.testing.assert_array_equal(np.asarray(arr), ref)


def test_fused_sweep_multi_stencil_parity():
    """Two stencils in one chain (blur then sharpen): each gets its own
    scratch at its remaining halo; parity vs the XLA path."""
    import numpy as np
    from lives_tpu.effects.host import instantiate
    from lives_tpu.graph import FrameGraph
    from lives_tpu.graph.nodemodel import _TEMPLATE_CACHE

    w, h = 256, 48
    src = DeviceSyntheticSource(h, w)
    sink = SinkSpec(width=w, height=h)

    def render(fused):
        chain = [instantiate("crossfade", amount=0.4),
                 instantiate("gaussian_blur", radius=2, amount=0.8),
                 instantiate("sharpen", radius=1, amount=0.5),
                 instantiate("vignette", amount=0.5)]
        chain[0].in_tracks = (0, 1)
        g = FrameGraph(chain, sink, fps=25.0)
        env = {"LIVES_TPU_PALLAS_INTERPRET": "1" if fused else "0",
               "LIVES_TPU_FUSED_SWEEP": "1" if fused else "0",
               "LIVES_TPU_CHAIN_DTYPE": "f32"}
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            cids = np.array([[1, 1], [2, 2]])
            fnums = np.array([[0, 1], [0, 1]])
            out = g.run_batch([], np.array([0.0, 0.04], np.float32),
                              np.array([0, 1], np.int32),
                              source=src, src_args=(cids, fnums))
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        return np.asarray(out.planes[0])

    ref = render(False)
    out = render(True)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1, diff.max()


def test_fused_sweep_random_chain_parity():
    """Property test: random pallas-safe chains (transitions, pointwise,
    coord effects, one optional stencil) match the XLA path +/-1 LSB."""
    import random as pyrandom
    import numpy as np
    from lives_tpu.effects.host import get_filter, instantiate
    from lives_tpu.graph import FrameGraph
    from lives_tpu.graph.pallas_composite import COORD_SAFE, PALLAS_SAFE

    w, h = 256, 40
    src = DeviceSyntheticSource(h, w)
    sink = SinkSpec(width=w, height=h)
    rng = pyrandom.Random(7)
    point_pool = sorted(PALLAS_SAFE | COORD_SAFE - {"wipe"})

    def random_chain():
        chain = []
        track = 1
        for _ in range(rng.randint(2, 6)):
            name = rng.choice(point_pool)
            inst = instantiate(name)
            if inst.filter.n_in > 1:
                inst.in_tracks = (0, track)
                track += 1
            chain.append(inst)
        if rng.random() < 0.6:
            chain.append(instantiate("gaussian_blur",
                                     radius=rng.randint(1, 3),
                                     amount=rng.uniform(0.3, 1.0)))
            # post-stencil: single-input only
            chain.append(instantiate(rng.choice(
                ["saturation", "vignette", "negate", "sepia"])))
        return chain, track

    for trial in range(6):
        chain, n_tracks = random_chain()
        names = [i.filter.name for i in chain]

        def render(fused, chain=chain):
            import copy
            g = FrameGraph([copy.deepcopy(i) for i in chain], sink,
                           fps=25.0)
            env = {"LIVES_TPU_PALLAS_INTERPRET": "1" if fused else "0",
                   "LIVES_TPU_FUSED_SWEEP": "1" if fused else "0",
                   "LIVES_TPU_CHAIN_DTYPE": "f32"}
            old = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                cids = np.arange(1, n_tracks + 1)[:, None].repeat(2, 1)
                fnums = np.arange(2)[None].repeat(n_tracks, 0)
                out = g.run_batch([], np.array([0.0, 0.04], np.float32),
                                  np.array([0, 1], np.int32),
                                  source=src, src_args=(cids, fnums))
            finally:
                for k, v in old.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
            return np.asarray(out.planes[0])

        ref = render(False)
        out = render(True)
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1, (names, diff.max())


def test_banded_single_chip_sweep_matches_plain():
    """LIVES_TPU_SWEEP_BANDS=N (single-chip spatial band split of the
    fused sweep, the multi-chip band kernel run sequentially): bitwise
    vs the plain full-H sweep."""
    w, h, n = 256, 64, 8
    plain = _render(w, h, n, fused=True)
    os.environ["LIVES_TPU_SWEEP_BANDS"] = "4"
    try:
        banded = _render(w, h, n, fused=True)
        # the equality assert is vacuous if the band knob silently
        # no-ops (it DID until sweep_bands joined prefs.ENV_KNOBS):
        # a banded run must key its own template
        from lives_tpu.graph.nodemodel import _TEMPLATE_CACHE
        assert any(isinstance(k, tuple) and k and k[0] == "batch"
                   and k[10] == "4" for k in _TEMPLATE_CACHE), \
            "banded sweep did not engage"
    finally:
        os.environ.pop("LIVES_TPU_SWEEP_BANDS", None)
    assert plain.shape == banded.shape
    np.testing.assert_array_equal(plain, banded)
