"""Data-plugin family (dataplugins.py), multi_transitions modes, and the
fourKlives tracker synth."""

import numpy as np
import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.effects import FrameContext, apply_instance, instantiate
from lives_tpu.audio.fourklives import (DEFAULT_TUNE, FourKLives,
                                        note_to_semitone, parse_tune)


def mk(rng, h=32, w=64, alpha=False):
    c = 4 if alpha else 3
    pal = Palette.RGBA32 if alpha else Palette.RGB24
    return Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (c, h, w), np.uint8)),), palette=int(pal))


def test_alpha_visualizer(rng):
    lay = mk(rng, alpha=True)
    out = apply_instance(instantiate("alpha_visualizer", red=1.0, green=0.0,
                                     blue=0.0), [lay])[0]
    a = np.asarray(out.planes[0])
    src = np.asarray(lay.planes[0])
    # red channel tracks source alpha; green/blue are dark
    assert abs(int(a[0].astype(int).mean()) - int(src[3].astype(int).mean())) <= 2
    assert a[1].max() == 0 and a[2].max() == 0


def test_data_unpacker_flatten_and_clamp(rng):
    lay = mk(rng)
    inst = instantiate("data_unpacker")
    inst.values["in0"] = jnp.asarray([0.5, -3.0, 2.0])
    inst.values["in1"] = 7.0
    inst.values["range"] = 1.0
    apply_instance(inst, [lay])
    o = {k: float(v) for k, v in inst.out_values.items()}
    assert o["o0"] == 0.5 and o["o1"] == -1.0 and o["o2"] == 1.0
    assert o["o3"] == 1.0  # in1 clamped
    inst.values["clamp"] = 0.0
    apply_instance(inst, [lay])
    assert float(inst.out_values["o1"]) == -3.0


def test_log_sig(rng):
    lay = mk(rng)
    inst = instantiate("log_sig", in0=0.0, in1=100.0, in2=-100.0)
    apply_instance(inst, [lay])
    assert abs(float(inst.out_values["o0"]) - 0.5) < 1e-6
    assert float(inst.out_values["o1"]) > 0.999
    assert float(inst.out_values["o2"]) < 0.001


def test_data_counter_state_machine(rng):
    lay = mk(rng)
    inst = instantiate("data_counter")
    inst.values["oncount0"] = 3
    inst.values["offcount0"] = 2
    seen = []
    val = 0.0
    for i in range(12):  # toggle the input every frame: 12 rising edges max
        val = 1.0 - val
        inst.values["input0"] = val
        apply_instance(inst, [lay], FrameContext(frame=i))
        seen.append(float(inst.out_values["out0"]))
    # rising edges at frames 0,2,4,...; third rising edge (frame 4) flips on;
    # then 2 more (frames 6,8) flip back off; 3 more needed again
    assert seen[3] == 0.0 and seen[4] == 1.0
    assert seen[8] == 0.0
    assert all(s in (0.0, 1.0) for s in seen)


def test_nn_programmer_evolves_and_freezes(rng):
    lay = mk(rng)
    inst = instantiate("nn_programmer", a=0.5, b=-0.5, fitness=0.0)
    outs = []
    for i in range(4):
        apply_instance(inst, [lay], FrameContext(frame=i))
        outs.append(float(inst.out_values["o0"]))
    assert all(0.0 <= o <= 1.0 for o in outs)
    assert len(set(np.round(outs, 6))) > 1  # mutating
    # fitness=1 freezes the program: same input -> same output
    inst2 = instantiate("nn_programmer", a=0.5, fitness=1.0)
    o = []
    for i in range(3):
        apply_instance(inst2, [lay], FrameContext(frame=i))
        o.append(float(inst2.out_values["o0"]))
    assert o[0] == o[1] == o[2]


def test_dissolve_endpoints_and_stability(rng):
    fg, bg = mk(rng), mk(rng)
    ctx = FrameContext(width=64, height=32, frame=0)
    out0 = np.asarray(apply_instance(
        instantiate("dissolve", amount=0.0), [fg, bg], ctx)[0].planes[0])
    np.testing.assert_array_equal(out0, np.asarray(fg.planes[0]))
    out1 = np.asarray(apply_instance(
        instantiate("dissolve", amount=1.0), [fg, bg], ctx)[0].planes[0])
    np.testing.assert_array_equal(out1, np.asarray(bg.planes[0]))
    # half: a stable mix of exactly-fg / exactly-bg pixels
    oh = np.asarray(apply_instance(
        instantiate("dissolve", amount=0.5), [fg, bg], ctx)[0].planes[0])
    oh2 = np.asarray(apply_instance(
        instantiate("dissolve", amount=0.5), [fg, bg],
        FrameContext(width=64, height=32, frame=9))[0].planes[0])
    np.testing.assert_array_equal(oh, oh2)  # frame-independent
    is_fg = (oh == np.asarray(fg.planes[0])).all(0)
    is_bg = (oh == np.asarray(bg.planes[0])).all(0)
    assert (is_fg | is_bg).all() and is_fg.any() and is_bg.any()


def test_rand_replace_rerolls_per_frame(rng):
    fg, bg = mk(rng), mk(rng)
    a = np.asarray(apply_instance(
        instantiate("rand_replace", amount=0.5), [fg, bg],
        FrameContext(width=64, height=32, frame=0))[0].planes[0])
    b = np.asarray(apply_instance(
        instantiate("rand_replace", amount=0.5), [fg, bg],
        FrameContext(width=64, height=32, frame=1))[0].planes[0])
    assert (a != b).any()


def test_iris_rectangle(rng):
    fg, bg = mk(rng), mk(rng)
    ctx = FrameContext(width=64, height=32)
    out = np.asarray(apply_instance(
        instantiate("iris_rectangle", amount=0.5, softness=0.0),
        [fg, bg], ctx)[0].planes[0])
    # centre shows fg, corner shows bg
    np.testing.assert_array_equal(out[:, 16, 32], np.asarray(fg.planes[0])[:, 16, 32])
    np.testing.assert_array_equal(out[:, 0, 0], np.asarray(bg.planes[0])[:, 0, 0])


# -- fourKlives ---------------------------------------------------------------

def test_note_parsing():
    assert note_to_semitone("c4") == 48
    assert note_to_semitone("a4") == 57
    assert note_to_semitone("c#3") == 37
    assert note_to_semitone("r") is None


def test_tune_parse():
    t = parse_tune(DEFAULT_TUNE)
    assert t.tempo == 125
    assert len(t.channels) == 3
    assert t.instruments[0].wave == "sqr"
    assert len(t.patterns[1]) == 8


def test_fourklives_render():
    synth = FourKLives(rate=8000, channels=2)
    block = synth.render(4000)
    assert block.shape == (4000, 2) and block.dtype == np.float32
    assert np.abs(block).max() <= 1.0
    assert np.abs(block).max() > 0.01  # audible
    # pure render: seek == sequential
    b2 = synth.render(1000)
    np.testing.assert_array_equal(b2, synth.render_at(4000, 1000))


def test_fourklives_tempo_and_pitch():
    synth = FourKLives(rate=8000)
    s1 = synth.step_samples
    synth.set_tempo(250)
    assert synth.step_samples < s1
    # base_freq transposes: doubling shifts energy up — compare zero
    # crossing rate of the first row
    synth.set_tempo(125)
    a = synth.render_at(0, synth.step_samples)[:, 0]
    synth.set_base_freq(880.0)
    b = synth.render_at(0, synth.step_samples)[:, 0]
    zc = lambda x: int(((x[:-1] * x[1:]) < 0).sum())
    assert zc(b) > zc(a) * 1.5


# -- audio generators as clip sources -----------------------------------------

def test_generator_clip_audio_source():
    from lives_tpu.audio.fx import AudioPlayer, NullAudioSink, ToneSource
    from lives_tpu.io.genclip import GeneratorClip

    class _State:
        pb_fps = 25.0
        fg_clip = None
        frame = 0

    class _Player:
        state = _State()
        time_source = "system"

    tone = ToneSource(freq=1000.0, rate=8000)
    clip = GeneratorClip("plasma", 64, 64, fps=25.0, audio_source=tone)
    _Player.state.fg_clip = clip
    assert clip.arate == 8000 and clip.achans == 2

    ap = AudioPlayer(_Player, NullAudioSink(), rate=8000, block=800)
    ap.load_clip_audio(clip)
    b1 = ap.pull()
    assert b1.shape == (800, 2) and np.abs(b1).max() > 0.1
    # pure/seekable: block 2 continues where block 1 ended
    b2 = ap.pull()
    direct = tone.render_at(800, 800)
    np.testing.assert_allclose(b2[:, 0], direct[:, 0], atol=1e-4)
    # scratch at 2x video speed doubles the pitch (zero-crossing rate)
    ap2 = AudioPlayer(_Player, NullAudioSink(), rate=8000, block=800)
    ap2.load_clip_audio(clip)
    _Player.state.pb_fps = 50.0
    fast = ap2.pull()
    _Player.state.pb_fps = 25.0
    zc = lambda x: int(((x[:-1] * x[1:]) < 0).sum())
    assert zc(fast[:, 0]) > zc(b1[:, 0]) * 1.7


def test_fourklives_as_clip_audio():
    from lives_tpu.audio.fx import AudioPlayer, NullAudioSink
    from lives_tpu.io.genclip import GeneratorClip

    class _State:
        pb_fps = 25.0
        fg_clip = None
        frame = 0

    class _Player:
        state = _State()
        time_source = "system"

    synth = FourKLives(rate=8000)
    clip = GeneratorClip("plasma", 64, 64, audio_source=synth)
    _Player.state.fg_clip = clip
    ap = AudioPlayer(_Player, NullAudioSink(), rate=8000, block=512)
    ap.load_clip_audio(clip)
    out = np.concatenate([ap.pull() for _ in range(4)])
    assert np.abs(out).max() > 0.05  # the tune is audible


def test_genslot_matches_get_frame():
    """Review finding: in-template generation must reproduce
    clip.get_frame(n) exactly (clip clock, not graph clock) so scratch,
    independent bg rates and record/replay stay frame-accurate."""
    from lives_tpu.graph.nodemodel import FrameGraph, GenSlot, SinkSpec
    from lives_tpu.io.genclip import GeneratorClip
    clip = GeneratorClip("plasma", 64, 48, fps=25.0)
    g = FrameGraph([], SinkSpec(), fps=50.0)  # graph clock != clip clock
    n = 7
    out = g.run([GenSlot(clip, n)], tc=n / 50.0, frame=n)
    direct = clip.get_frame(n)
    np.testing.assert_array_equal(np.asarray(out.planes[0]),
                                  np.asarray(direct.planes[0]))


def test_genclip_read_audio_full_duration():
    """Review finding: finite clips > 600 s render their FULL audio."""
    from lives_tpu.audio.fx import ToneSource
    from lives_tpu.io.genclip import GeneratorClip
    clip = GeneratorClip("plasma", 32, 32, fps=25.0, frames=25 * 700,
                         audio_source=ToneSource(rate=1000))
    assert len(clip.read_audio()) == 700 * 1000


def test_audio_volume_headroom():
    """Review finding: gain stages must not clip between filters."""
    from lives_tpu.audio.fx import apply_audio_chain, audio_instantiate
    chain = [audio_instantiate("audio_volume", left=4.0, right=4.0),
             audio_instantiate("audio_volume", left=0.25, right=0.25)]
    block = np.full((32, 2), 0.5, np.float32)
    out = apply_audio_chain(chain, block)
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_smoother_ema():
    lay = mk(np.random.default_rng(0))
    inst = instantiate("smoother", rate=0.5, in0=1.0)
    vals = []
    for i in range(4):
        apply_instance(inst, [lay], FrameContext(frame=i))
        vals.append(float(inst.out_values["o0"]))
    np.testing.assert_allclose(vals, [0.5, 0.75, 0.875, 0.9375])


def test_image_stabilizer_compound():
    """compound/image_stabilizer: a translating square gets counter-shifted
    — consecutive stabilized frames are more similar than raw frames."""
    h, w = 64, 128

    def frame(x):
        a = np.zeros((3, h, w), np.uint8)
        a[:, 24:40, x:x + 16] = 255
        return Layer(planes=(jnp.asarray(a),), palette=int(Palette.RGB24))

    inst = instantiate("image_stabilizer", strength=1.0)
    prev_out = None
    raw_prev = None
    diffs_stab, diffs_raw = [], []
    for i, x in enumerate(range(20, 68, 8)):  # move 8 px/frame
        lay = frame(x)
        out = np.asarray(apply_instance(
            inst, [lay], FrameContext(frame=i, width=w, height=h))
            [0].planes[0]).astype(int)
        raw = np.asarray(lay.planes[0]).astype(int)
        if prev_out is not None and i >= 3:  # after EMA settles
            diffs_stab.append(np.abs(out - prev_out).mean())
            diffs_raw.append(np.abs(raw - raw_prev).mean())
        prev_out, raw_prev = out, raw
    assert np.mean(diffs_stab) < np.mean(diffs_raw) * 0.8


def test_neural_net_compound():
    lay = mk(np.random.default_rng(1))
    inst = instantiate("neural_net", a=0.5, b=-0.5, fitness=1.0)
    apply_instance(inst, [lay], FrameContext(frame=0))
    outs = {k: float(v) for k, v in inst.out_values.items()}
    assert len(outs) >= 4 and all(0.0 <= v <= 1.0 for v in outs.values())


def test_in_template_generator_parity_random():
    """Property: for every stateless generator, in-template GenSlot
    rendering equals get_frame exactly (any frame, any clip fps)."""
    from lives_tpu.graph.nodemodel import FrameGraph, GenSlot, SinkSpec
    from lives_tpu.io.genclip import GeneratorClip
    rng = np.random.default_rng(11)
    for name in ("plasma", "gradient", "checkerboard", "colour_bars",
                 "noise", "solid_colour"):
        fps = float(rng.choice([12.5, 25.0, 30.0]))
        clip = GeneratorClip(name, 64, 48, fps=fps)
        g = FrameGraph([], SinkSpec(), fps=60.0)
        n = int(rng.integers(0, 200))
        out = g.run([GenSlot(clip, n)], tc=0.123, frame=999)
        ref = clip.get_frame(n)
        np.testing.assert_array_equal(
            np.asarray(out.planes[0]), np.asarray(ref.planes[0]),
            err_msg=f"{name} frame {n} fps {fps}")


def test_generator_clip_transcode_with_audio(tmp_path):
    """e2e: generator video + fourKlives audio -> transcode -> the encoded
    file carries both streams (exercises GeneratorClip.read_audio through
    the real encode path)."""
    import pytest
    from lives_tpu.io.av import load_avbridge
    if load_avbridge() is None:
        pytest.skip("libav unavailable")
    from lives_tpu.io.decoders import try_decoders
    from lives_tpu.io.genclip import GeneratorClip
    from lives_tpu.transcode import transcode
    clip = GeneratorClip("plasma", 128, 96, fps=25.0, frames=20,
                         audio_source=FourKLives(rate=22050))
    out = str(tmp_path / "gen.mkv")
    assert transcode(clip, out, encoder="av", include_audio=True)
    cd = try_decoders(out)
    assert cd is not None and cd.nframes >= 18
    assert cd.achans >= 1 and cd.arate > 0


def test_stateful_batch_with_source_and_default_sink():
    """Review finding: stateful init_state must size from the SOURCE dims
    when tracks are generated in-template (the default SinkSpec is 0x0)."""
    from lives_tpu.effects import instantiate
    from lives_tpu.graph.nodemodel import FrameGraph, SinkSpec
    from lives_tpu.scenes import DeviceSyntheticSource
    src = DeviceSyntheticSource(32, 128)
    g = FrameGraph([instantiate("nervous")], SinkSpec(), fps=25.0)
    ids = np.zeros((2, 1, 4), np.int32)
    ids[0, 0] = 1
    ids[1] = np.arange(4)
    out = g.run_batch([], np.arange(4, dtype=np.float32) / 25.0,
                      np.arange(4, dtype=np.int32),
                      source=src, src_args=ids)
    assert np.asarray(out.planes[0]).shape == (4, 3, 32, 128)


def test_genslot_fps_parity_nondefault_clip_rate():
    """Review finding: in-template generation must use the CLIP's fps in
    ctx (generators that read ctx.fps must match get_frame exactly)."""
    from lives_tpu.graph.nodemodel import FrameGraph, GenSlot, SinkSpec
    from lives_tpu.io.genclip import GeneratorClip
    clip = GeneratorClip("spectrascope", 64, 48, fps=12.5)
    g = FrameGraph([], SinkSpec(), fps=60.0)
    out = g.run([GenSlot(clip, 5)], tc=0.0, frame=0)
    ref = clip.get_frame(5)
    np.testing.assert_array_equal(np.asarray(out.planes[0]),
                                  np.asarray(ref.planes[0]))
