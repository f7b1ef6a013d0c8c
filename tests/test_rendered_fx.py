"""Rendered effects (RFX), transcode, encoders, generator clips, data
connections + analysers."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.io.decoders import write_y4m, try_decoders
from lives_tpu.io import open_clip
from lives_tpu.layer import Layer


def make_clip(tmp_path, n=6, w=32, h=16):
    frames = [(np.full((h, w), 60 + 20 * i, np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8)) for i in range(n)]
    write_y4m(str(tmp_path / "c.y4m"), frames)
    return open_clip(str(tmp_path / "c.y4m"), tmp_path / "work")


def test_rendered_effect_and_undo(tmp_path):
    from lives_tpu.rfx import apply_rendered_effect, undo_rendered_effect
    from lives_tpu.ops.colorspace import convert_layer
    clip = make_clip(tmp_path)
    before_rgb = np.asarray(convert_layer(clip.get_frame(2),
                                          Palette.RGB24).planes[0])
    before = np.asarray(clip.get_frame(2).planes[0])
    prog = []
    n = apply_rendered_effect(clip, "negate", 1, 5, batch_size=2,
                              progress=lambda a, b: prog.append((a, b)))
    assert n == 4 and prog[-1] == (4, 4)
    after = np.asarray(clip.get_frame(2).planes[0])
    assert not clip.is_virtual_frame(2)
    np.testing.assert_allclose(after.astype(int),
                               255 - before_rgb.astype(int), atol=2)
    # frame 0 untouched (still virtual)
    assert clip.is_virtual_frame(0)
    assert undo_rendered_effect(clip)
    assert clip.is_virtual_frame(2)
    restored = np.asarray(clip.get_frame(2).planes[0])
    np.testing.assert_array_equal(restored, before)


def test_rfx_param_dsl():
    from lives_tpu.rfx import parse_rfx_params
    script = """
<params>
amount|_Amount|num2|0.5|0.|1.
passes|_Passes|num0|2|1|10
invert|_Invert|bool|1
col|_Colour|colRGB24|255|0|128
mode|_Mode|string_list|1|fast|slow|best
</params>
"""
    ps = parse_rfx_params(script)
    assert [p["name"] for p in ps] == ["amount", "passes", "invert", "col",
                                      "mode"]
    assert ps[0]["kind"] == "num" and ps[0]["max"] == 1.0
    assert ps[1]["kind"] == "int"
    assert ps[2]["default"] is True
    assert ps[3]["default"] == (255, 0, 128)
    assert ps[4]["choices"] == ("fast", "slow", "best")


def test_transcode_y4m_roundtrip(tmp_path):
    from lives_tpu.transcode import transcode
    from lives_tpu.effects import instantiate
    clip = make_clip(tmp_path)
    out = tmp_path / "out.y4m"
    ok = transcode(clip, str(out), "yuv4mpeg",
                   chain=[instantiate("negate")], batch_size=3)
    assert ok and out.exists()
    cd = try_decoders(str(out))
    assert cd.nframes == clip.frames
    orig = clip.get_frame(0)
    enc = cd.decoder.get_frame(0)
    # negated luma: bright <-> dark
    assert abs(int(np.asarray(enc.planes[0]).mean())
               + int(np.asarray(orig.planes[0]).mean()) - 255) < 30


def test_encoders_registry(tmp_path):
    from lives_tpu.io.encoders import get_encoder, list_encoders, CAP_AUDIO
    names = list_encoders()
    assert "yuv4mpeg" in names and "pngseq" in names and "wav" in names
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, (3, 16, 32), np.uint8) for _ in range(3)]
    assert get_encoder("pngseq").encode(str(tmp_path / "seq"), frames, 25.0)
    assert (tmp_path / "seq" / "00000003.png").exists()
    audio = np.sin(np.linspace(0, 100, 4410)).astype(np.float32)
    assert get_encoder("wav").encode(str(tmp_path / "a.wav"), [], 25.0,
                                     audio, 44100)
    data = (tmp_path / "a.wav").read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def test_generator_clip():
    from lives_tpu.io.genclip import GeneratorClip
    g = GeneratorClip("plasma", 48, 24, fps=25.0)
    f0 = g.get_frame(0)
    f10 = g.get_frame(10)
    assert f0.width == 48 and f0.height == 24
    assert not np.array_equal(np.asarray(f0.planes[0]),
                              np.asarray(f10.planes[0]))
    # determinism
    np.testing.assert_array_equal(np.asarray(g.get_frame(10).planes[0]),
                                  np.asarray(f10.planes[0]))


def test_generator_clip_in_player():
    from lives_tpu.io.genclip import GeneratorClip
    from lives_tpu.player import CollectSink, Player
    p = Player(sink=CollectSink())
    p.state.fg_clip = GeneratorClip("colour_bars", 64, 32)
    p.start()
    assert p.process_one()
    assert p.sink.frames[0].shape == (3, 32, 64)


def test_analyser_out_values(rng):
    from lives_tpu.effects import FrameContext, apply_instance, instantiate
    dark = Layer(planes=(jnp.zeros((3, 16, 32), jnp.uint8),),
                 palette=int(Palette.RGB24))
    inst = instantiate("blank_frame_detector")
    out = apply_instance(inst, [dark])[0]
    np.testing.assert_array_equal(np.asarray(out.planes[0]),
                                  np.zeros((3, 16, 32)))  # passthrough
    assert float(inst.out_values["blank"]) == 1.0
    bright = Layer(planes=(jnp.full((3, 16, 32), 200, jnp.uint8),),
                   palette=int(Palette.RGB24))
    apply_instance(inst, [bright])
    assert float(inst.out_values["blank"]) == 0.0


def test_data_connection_chain(rng):
    """brightness analyser drives vignette amount via pconx autoscale."""
    from lives_tpu.effects import instantiate
    from lives_tpu.effects.data import DataConnections, apply_chain_connected
    src = instantiate("alpha_means")
    dst = instantiate("vignette", amount=0.0)
    conns = DataConnections()
    conns.add(src, "mean_r", dst, "amount", autoscale=True)
    bright_r = Layer(planes=(jnp.stack([
        jnp.full((16, 32), 255, jnp.uint8),
        jnp.zeros((16, 32), jnp.uint8),
        jnp.zeros((16, 32), jnp.uint8)]),), palette=int(Palette.RGB24))
    out = apply_chain_connected([src, dst], [bright_r], connections=conns)
    assert float(dst.values["amount"]) == pytest.approx(1.0, abs=0.01)
    arr = np.asarray(out.planes[0])
    assert arr[0, 0, 0] < 255  # corners vignetted


def test_audio_analysers():
    from lives_tpu.effects.builtin.analysers import BeatDetector, audio_fft
    rate = 44100
    t = np.arange(2048) / rate
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    spec = audio_fft(tone, rate, bands=16)
    assert spec.argmax() in range(5, 11)  # 440Hz lands mid-spectrum
    bd = BeatDetector(rate)
    silent = np.zeros(1024, np.float32)
    loud = np.ones(1024, np.float32) * 0.5
    hits = []
    for i in range(20):
        hits.append(bd.feed(loud if i % 10 == 9 else silent * 0.01))
    assert any(hits[9:])


def test_datacons_persistence(tmp_path):
    from lives_tpu.effects.data import (DataConnections, load_datacons,
                                        save_datacons)
    from lives_tpu.player import KeyMap
    km = KeyMap()
    km.set_key(0, 0, "alpha_means")
    km.set_key(1, 0, "vignette")
    km.toggle(0, True)
    km.toggle(1, True)
    conns = DataConnections()
    conns.add(km.instances[0], "mean_r", km.instances[1], "amount",
              autoscale=True)
    save_datacons(conns, km, tmp_path / "datacons.map")

    km2 = KeyMap()
    km2.set_key(0, 0, "alpha_means")
    km2.set_key(1, 0, "vignette")
    conns2 = load_datacons(km2, tmp_path / "datacons.map")
    assert len(conns2.conns) == 1
    c = conns2.conns[0]
    assert c.out_param == "mean_r" and c.in_param == "amount" and c.autoscale
    assert c.src is km2.instances[0] and c.dst is km2.instances[1]
