"""Extra effects + scrap file + adaptive quality tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.effects import FrameContext, apply_instance, instantiate


def mk(rng, h=32, w=64):
    return Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (3, h, w), np.uint8)),),
        palette=int(Palette.RGB24))


def test_livetext_generator():
    ctx = FrameContext(width=128, height=64)
    gen = instantiate("livetext", text="HI", size=24)
    lay = apply_instance(gen, [], ctx)[0]
    assert lay.palette == Palette.RGBA32
    arr = np.asarray(lay.planes[0])
    assert arr[3].max() == 255 and arr[3].min() == 0  # alpha text mask


def test_videowall(rng):
    lay = mk(rng, 32, 64)
    out = apply_instance(instantiate("videowall", tiles=2), [lay])[0]
    a = np.asarray(out.planes[0])
    # quadrants identical
    np.testing.assert_array_equal(a[:, :16, :32], a[:, :16, 32:])
    np.testing.assert_array_equal(a[:, :16, :32], a[:, 16:, :32])


def test_mask_overlay(rng):
    fg = mk(rng)
    white = Layer(planes=(jnp.full((3, 32, 64), 255, jnp.uint8),),
                  palette=int(Palette.RGB24))
    black = Layer(planes=(jnp.zeros((3, 32, 64), jnp.uint8),),
                  palette=int(Palette.RGB24))
    inst = instantiate("mask_overlay")
    shown = np.asarray(apply_instance(inst, [fg, white])[0].planes[0])
    hidden = np.asarray(apply_instance(inst, [fg, black])[0].planes[0])
    np.testing.assert_array_equal(shown, np.asarray(fg.planes[0]))
    assert hidden.max() == 0


def test_push_transition(rng):
    fg, bg = mk(rng), mk(rng)
    inst = instantiate("push", amount=0.0)
    out0 = np.asarray(apply_instance(inst, [fg, bg])[0].planes[0])
    np.testing.assert_array_equal(out0, np.asarray(bg.planes[0]))
    inst.values["amount"] = 1.0
    out1 = np.asarray(apply_instance(inst, [fg, bg])[0].planes[0])
    np.testing.assert_array_equal(out1, np.asarray(fg.planes[0]))
    inst.values["amount"] = 0.5
    outh = np.asarray(apply_instance(inst, [fg, bg])[0].planes[0])
    np.testing.assert_array_equal(outh[:, :, :32],
                                  np.asarray(fg.planes[0])[:, :, 32:])


def test_data_processor_expressions(rng):
    from lives_tpu.effects.data import DataConnections, apply_chain_connected
    dp = instantiate("data_processor", a=2.0, b=3.0)
    dp.values["expr_o0"] = "a * b + 1"
    lay = mk(rng)
    apply_instance(dp, [lay])
    assert float(dp.out_values["o0"]) == pytest.approx(7.0)
    # wire into a vignette amount
    vg = instantiate("vignette", amount=0.0)
    conns = DataConnections()
    dp.values["expr_o0"] = "min(a, 1.0)"
    conns.add(dp, "o0", vg, "amount")
    apply_chain_connected([dp, vg], [lay], connections=conns)
    assert float(vg.values["amount"]) == pytest.approx(1.0)


def test_randomiser_deterministic(rng):
    r1 = instantiate("randomiser")
    r2 = instantiate("randomiser")
    ctx = FrameContext(frame=7, width=64, height=32)
    lay = mk(rng)
    apply_instance(r1, [lay], ctx)
    apply_instance(r2, [lay], ctx)
    assert float(r1.out_values["rand0"]) == float(r2.out_values["rand0"])
    ctx2 = FrameContext(frame=8, width=64, height=32)
    apply_instance(r2, [lay], ctx2)
    assert float(r1.out_values["rand0"]) != float(r2.out_values["rand0"])


def test_scrap_roundtrip(tmp_path, rng):
    from lives_tpu.io.scrap import ScrapReader, ScrapWriter
    w = ScrapWriter(tmp_path / "s.scrap", 64, 32, Palette.RGB24, 25.0)
    frames = [mk(rng) for _ in range(5)]
    for f in frames:
        w.write(f)
    w.close()
    r = ScrapReader(tmp_path / "s.scrap")
    assert r.frames == 5 and r.fps == 25.0
    for i in (0, 4, 2):
        np.testing.assert_array_equal(np.asarray(r.get_frame(i).planes[0]),
                                      np.asarray(frames[i].planes[0]))


def test_scrap_sink_records_playback(tmp_path, rng):
    from lives_tpu.io.scrap import ScrapReader, ScrapSink
    from lives_tpu.player import Player

    class MemClip:
        frames, fps, width, height, unique_id = 10, 25.0, 64, 32, 5

        def get_frame(self, n):
            rr = np.random.default_rng(n)
            return Layer(planes=(jnp.asarray(
                rr.integers(0, 256, (3, 32, 64), np.uint8)),),
                palette=int(Palette.RGB24))

    p = Player(sink=ScrapSink(tmp_path / "rec.scrap"))
    p.state.fg_clip = MemClip()
    p.start()
    p.process_one()
    p.stop()
    r = ScrapReader(tmp_path / "rec.scrap")
    assert r.frames == 1


def test_adaptive_quality_degrades():
    from lives_tpu.player import CollectSink, Player
    p = Player(sink=CollectSink())
    p.adaptive_quality = True
    p.state.pb_fps = 10000.0  # impossible budget
    p._frame_times = [0.05] * 8
    p._update_effort()
    assert p.effort == 1 and p.sink_spec.method == "bilinear"
    p._frame_times = [0.05] * 8
    p._update_effort()
    assert p.effort == 2 and p.sink_spec.method == "nearest"
    p.state.pb_fps = 1.0  # plenty of headroom -> recover
    p._frame_times = [0.05] * 8
    p._update_effort()
    assert p.effort == 1


def test_toonz_family_registered_and_effective():
    import numpy as np
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.effects.host import (FrameContext, apply_instance,
                                        instantiate)
    from lives_tpu.layer import Layer

    rng = np.random.default_rng(2)
    lay = Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (3, 48, 64), np.uint8)),),
        palette=int(Palette.RGB24))
    ctx = FrameContext(tc=0.4, fps=25.0, width=64, height=48)
    for n in ("toonz_light_bloom", "toonz_paraffin",
              "toonz_pencil_hatching", "toonz_coherent_noise"):
        out = apply_instance(instantiate(n), [lay], ctx)[0]
        a = np.asarray(out.planes[0])
        assert a.shape == (3, 48, 64)
        assert not np.array_equal(a, np.asarray(lay.planes[0])), n


# -- round-4 named-gap filters (VERDICT r3 item 8) ----------------------------

def test_posterise_bit_exact(rng):
    """posterise keeps the top `levels` bits (scripts/posterise.script
    levmask semantics), alpha untouched."""
    lay = mk(rng)
    src = np.asarray(lay.planes[0])
    for levels, mask in ((1, 0x80), (2, 0xC0), (4, 0xF0), (8, 0xFF)):
        out = apply_instance(instantiate("posterise", levels=levels),
                             [lay])[0]
        np.testing.assert_array_equal(np.asarray(out.planes[0]), src & mask)
    rgba = Layer(planes=(jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (4, 32, 64), np.uint8)),), palette=int(Palette.RGBA32))
    out = apply_instance(instantiate("posterise", levels=2), [rgba])[0]
    a = np.asarray(out.planes[0])
    np.testing.assert_array_equal(a[3], np.asarray(rgba.planes[0])[3])


def test_palette_mapper_quantises(rng):
    lay = mk(rng)
    out = apply_instance(instantiate("palette_mapper", palette=1), [lay])[0]
    a = np.asarray(out.planes[0]).reshape(3, -1).T
    gameboy = {(15, 56, 15), (48, 98, 48), (139, 172, 15), (155, 188, 15)}
    assert {tuple(int(v) for v in c) for c in a} <= gameboy
    # strength 0 = identity
    out0 = apply_instance(instantiate("palette_mapper", strength=0.0),
                          [lay])[0]
    np.testing.assert_array_equal(np.asarray(out0.planes[0]),
                                  np.asarray(lay.planes[0]))


def test_photo_censor_modes(rng):
    lay = mk(rng, 64, 96)
    src = np.asarray(lay.planes[0])
    for mode in (0, 1, 2):
        out = apply_instance(instantiate("photo_censor", mode=mode), [lay])[0]
        a = np.asarray(out.planes[0])
        # outside the region untouched, inside changed
        np.testing.assert_array_equal(a[:, :8, :8], src[:, :8, :8])
        assert (a[:, 20:40, 30:60] != src[:, 20:40, 30:60]).any()
    black = np.asarray(apply_instance(
        instantiate("photo_censor", mode=1), [lay])[0].planes[0])
    assert (black[:, 20:40, 30:60] == 0).all()


def test_vector_visualiser_draws_arrows(rng):
    """farneback flow -> vector_visualiser via cconx draws red arrows;
    unconnected it passes through (cairo/vector_visualiser.c)."""
    from lives_tpu.effects.data import DataConnections, apply_chain_connected
    lay = mk(rng, 96, 160)
    fb = instantiate("farneback_analyser", scale=8.0)
    vv = instantiate("vector_visualiser")
    dc = DataConnections()
    dc.add_channel(fb, "flow_x", vv, 0)
    dc.add_channel(fb, "flow_y", vv, 1)
    apply_chain_connected([fb, vv], [lay], FrameContext(), dc)
    out = apply_chain_connected([fb, vv], [lay], FrameContext(), dc)
    a = np.asarray(out.planes[0])
    red = (a[0] > 200) & (a[1] < 60) & (a[2] < 60)
    assert red.sum() > 20  # arrows landed
    passthru = apply_instance(instantiate("vector_visualiser"), [lay])[0]
    np.testing.assert_array_equal(np.asarray(passthru.planes[0]),
                                  np.asarray(lay.planes[0]))


def test_puretext_modes_animate(rng):
    """All 7 puretext op modes (gdk/puretext.c PT_*) draw letters whose
    coverage evolves with the timecode; tc is traced (no recompile)."""
    from lives_tpu.effects.builtin.puretext import MODES
    lay = mk(rng, 144, 256)
    for mode in range(len(MODES)):
        inst = instantiate("puretext", text="HELLO WORLD", mode=mode,
                           size=24)
        cov = []
        for tc in (0.2, 0.7, 1.5, 3.0):
            out = apply_instance(inst, [lay], FrameContext(tc=tc))[0]
            a = np.asarray(out.planes[0]).astype(int)
            cov.append(int((a.sum(0) > 600).sum()))
        assert max(cov) > 50, (MODES[mode], cov)
        # the animation moves: coverage is not constant across tc
        if mode != 6:  # bounce coverage is ~constant (letters just move)
            assert len(set(cov)) > 1, (MODES[mode], cov)


def test_puretext_terminal_reveals_in_order(rng):
    lay = mk(rng, 144, 256)
    inst = instantiate("puretext", text="ABCDEF", mode=4, size=24,
                       speed=1.0)
    early = np.asarray(apply_instance(
        inst, [lay], FrameContext(tc=0.15))[0].planes[0]).astype(int)
    late = np.asarray(apply_instance(
        inst, [lay], FrameContext(tc=10.0))[0].planes[0]).astype(int)
    assert (late.sum(0) > 600).sum() > (early.sum(0) > 600).sum()


def test_xeffect_ink_quantise():
    """xeffect.script: smooth regions keep source; luma-edge pixels
    quantise to black (dark) / white (bright)."""
    from lives_tpu.effects import instantiate
    from lives_tpu.effects.host import apply_instance
    h, w = 24, 32
    src = np.full((3, h, w), 40, np.uint8)      # dark
    src[:, :, w // 2:] = 220                    # bright half: hard edge
    lay = Layer(planes=(jnp.asarray(src),), palette=int(Palette.RGB24))
    out = apply_instance(instantiate("xeffect"), [lay])
    out = out if hasattr(out, "planes") else out[0]
    a = np.asarray(out.planes[0])
    # interior of each half untouched
    np.testing.assert_array_equal(a[:, :, : w // 2 - 2],
                                  src[:, :, : w // 2 - 2])
    # edge columns: dark side inked black, bright side inked white
    assert (a[:, 2:-2, w // 2 - 1] == 0).all()
    assert (a[:, 2:-2, w // 2] == 255).all()


def test_haip_paints_deterministic_trails():
    from lives_tpu.effects import instantiate
    from lives_tpu.effects.host import apply_instance, FrameContext
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (3, 32, 48), np.uint8)
    lay = Layer(planes=(jnp.asarray(src),), palette=int(Palette.RGB24))
    def run(c):
        out = apply_instance(instantiate("haip"), [lay], ctx=c)
        out = out if hasattr(out, "planes") else out[0]
        return np.asarray(out.planes[0])

    ctx = FrameContext(tc=0.4, frame=12, width=48, height=32)
    a1 = run(ctx)
    a2 = run(ctx)
    np.testing.assert_array_equal(a1, a2)      # frame-seeded: reproducible
    changed = (a1 != src).any(axis=0).mean()
    assert 0.05 < changed < 0.9                # trails, not a repaint
    a3 = run(FrameContext(tc=0.5, frame=13, width=48, height=32))
    assert (a1 != a3).any()                    # new frame, new wurms


def test_timer_clocks_and_reset():
    from lives_tpu.effects import instantiate
    from lives_tpu.effects.host import FrameContext, apply_instance
    inst = instantiate("timer")
    lay = Layer(planes=(jnp.zeros((3, 8, 8), jnp.uint8),),
                palette=int(Palette.RGB24))

    def step(tc, reset=0.0):
        inst.values["reset"] = reset
        apply_instance(inst, [lay], ctx=FrameContext(tc=tc, frame=int(
            tc * 25), width=8, height=8))
        return {k: float(v) for k, v in inst.out_values.items()}

    o = step(2.0)
    assert abs(o["absolute"] - 2.0) < 1e-5
    assert abs(o["relative"]) < 1e-5           # started at 2.0
    o = step(3.5)
    assert abs(o["relative"] - 1.5) < 1e-5
    assert abs(o["sincereset"] - 1.5) < 1e-5
    o = step(4.0, reset=1.0)                   # edge-triggered reset
    assert abs(o["sincereset"]) < 1e-5
    assert o["was_reset"] == 1.0
    o = step(5.0, reset=1.0)                   # held high: no re-reset
    assert abs(o["sincereset"] - 1.0) < 1e-5
    o = step(6.0)
    assert abs(o["relative"] - 4.0) < 1e-5


def test_alpha_to_grey():
    from lives_tpu.effects import instantiate
    from lives_tpu.effects.host import apply_instance
    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (4, 12, 16), np.uint8)
    lay = Layer(planes=(jnp.asarray(src),), palette=int(Palette.RGBA32))
    out = apply_instance(instantiate("alpha_to_grey"), [lay])
    out = out if hasattr(out, "planes") else out[0]
    a = np.asarray(out.planes[0])
    for c in range(3):
        assert np.abs(a[c].astype(int) - src[3].astype(int)).max() <= 1
