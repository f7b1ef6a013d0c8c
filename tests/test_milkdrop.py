"""MilkDrop preset interpreter (effects/milkdrop.py, projectM.cpp role).

Covers: the ns-eel expression subset (numeric agreement with python
reference evaluation, eel-specific semantics like x/0 == 0 and integer
%), preset INI parsing, q-var persistence + per_frame_init once-only
semantics, the warp feedback renderer (identity preset preserves the
frame; zoom preset moves energy), registration as stateful generators,
determinism, and end-to-end execution through the FrameGraph.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from lives_tpu.constants import Palette
from lives_tpu.effects import get_filter, instantiate
from lives_tpu.effects.host import FrameContext
from lives_tpu.effects.milkdrop import (BUILTIN_PRESETS, MilkPreset,
                                        compile_expressions, parse_preset,
                                        register_milk_preset)


# ---------------------------------------------------------------------------
# expression compiler


def run_expr(src, **env):
    return compile_expressions(src)(env)


@pytest.mark.parametrize("src,env,expect", [
    ("y = 2 + 3*4;", {}, {"y": 14.0}),
    ("y = (2 + 3)*4;", {}, {"y": 20.0}),
    ("y = 2^10;", {}, {"y": 1024.0}),
    ("y = -2^2;", {}, {"y": -4.0}),            # unary binds looser than ^
    ("y = 7 % 3;", {}, {"y": 1.0}),
    ("y = 7.9 % 3.9;", {}, {"y": 1.0}),        # eel %: integer modulo
    ("y = 5 / 0;", {}, {"y": 0.0}),            # eel x/0 == 0
    ("y = 5 % 0;", {}, {"y": 0.0}),
    ("y = if(above(3,2), 10, 20);", {}, {"y": 10.0}),
    ("y = if(equal(1,2), 10, 20);", {}, {"y": 20.0}),
    ("y = band(1, 0) + bor(1, 0)*2 + bnot(0)*4;", {}, {"y": 6.0}),
    ("y = 2 < 3 && 3 < 2;", {}, {"y": 0.0}),
    ("y = 2 < 3 || 3 < 2;", {}, {"y": 1.0}),
    ("y = !1 + !0*2;", {}, {"y": 2.0}),
    ("y = min(3, x); z = max(3, x);", {"x": 5.0}, {"y": 3.0, "z": 5.0}),
    ("y = abs(-3) + sign(-2) + floor(2.7) + ceil(2.1);", {},
     {"y": 3.0 - 1.0 + 2.0 + 3.0}),
    ("y = sqr(3) + sqrt(16);", {}, {"y": 13.0}),
    ("y = x > 1 ? 5 : 6;", {"x": 2.0}, {"y": 5.0}),
    ("a = 2; b = a*3; b = b + 1;", {}, {"a": 2.0, "b": 7.0}),
])
def test_expr_scalar_constants(src, env, expect):
    out = run_expr(src, **env)
    for k, v in expect.items():
        assert out[k] == pytest.approx(v), (src, k)


def test_expr_transcendentals_match_math():
    src = ("s = sin(x); c = cos(x); t2 = atan2(x, 2); "
           "e = exp(x); l = log(x); p = pow(x, 2.5); sg = sigmoid(x,1);")
    x = 0.7
    out = run_expr(src, x=x)
    assert out["s"] == pytest.approx(math.sin(x))
    assert out["c"] == pytest.approx(math.cos(x))
    assert out["t2"] == pytest.approx(math.atan2(x, 2))
    assert out["e"] == pytest.approx(math.exp(x))
    assert out["l"] == pytest.approx(math.log(x))
    assert out["p"] == pytest.approx(math.pow(x, 2.5))
    assert out["sg"] == pytest.approx(1 / (1 + math.exp(-x)))


def test_expr_traced_values_match_constant_path():
    """The same statements over jnp scalars agree with the float path."""
    src = ("y = if(above(x, 0.5), x^2.0, -x); z = x % 3; w = x / d; "
           "r = min(x, 2) + max(x, 2);")
    for x in (0.25, 0.75, 4.0, -2.5):
        const = run_expr(src, x=x, d=0.0)
        traced = compile_expressions(src)(
            {"x": jnp.float32(x), "d": jnp.float32(0.0)})
        for k in ("y", "z", "w", "r"):
            assert float(traced[k]) == pytest.approx(const[k], abs=1e-5), \
                (k, x)


def test_expr_arrays_broadcast():
    out = compile_expressions("y = x*2 + 1;")(
        {"x": jnp.arange(4, dtype=jnp.float32)})
    np.testing.assert_allclose(np.asarray(out["y"]), [1, 3, 5, 7])


def test_expr_rand_deterministic_per_frame():
    f = compile_expressions("y = rand(1); z = rand(1);")
    a = f({"frame": jnp.float32(3)})
    b = f({"frame": jnp.float32(3)})
    c = f({"frame": jnp.float32(4)})
    assert float(a["y"]) == float(b["y"])         # same frame -> same draw
    assert float(a["y"]) != float(a["z"])         # distinct call sites
    assert float(a["y"]) != float(c["y"])         # frames decorrelate
    assert 0.0 <= float(a["y"]) < 1.0


def test_expr_unknown_vars_default_zero():
    assert run_expr("y = nosuchvar + 1;")["y"] == 1.0


def test_expr_errors():
    with pytest.raises(ValueError):
        compile_expressions("y = $bad;")
    with pytest.raises(ValueError):
        compile_expressions("y = nosuchfn(1);")
    with pytest.raises(ValueError):
        compile_expressions("y = (1 + 2;")


# ---------------------------------------------------------------------------
# preset parsing


MILK_TEXT = """[preset00]
fRating=4.0
fGammaAdj=1.5
fDecay=0.97
zoom=1.01
rot=0.0
nWaveMode=2
per_frame_init_1=q1 = 7;
per_frame_2=rot = rot + 0.01*sin(time);
per_frame_1=zoom = zoom + 0.1*bass;
per_pixel_1=zoom = zoom + rad*0.05;
wavecode_0_enabled=1
shapecode_0_x=0.5
warp_1=`shader body line to ignore
"""


def test_parse_preset():
    pre = parse_preset(MILK_TEXT, "demo")
    assert pre.init["fdecay"] == pytest.approx(0.97)
    assert pre.init["zoom"] == pytest.approx(1.01)
    # numeric order preserved: per_frame_1 before per_frame_2
    assert pre.per_frame.index("bass") < pre.per_frame.index("sin")
    assert "q1 = 7" in pre.per_frame_init
    assert "rad*0.05" in pre.per_pixel
    assert "shader" not in pre.per_frame + pre.per_pixel
    assert pre.value("nwavemode") == 2
    assert pre.value("fgammaadj") == pytest.approx(1.5)
    assert pre.value("echo_zoom") == 1.0  # default


# ---------------------------------------------------------------------------
# renderer


def run_frames(name, n, h=48, w=64, params=None):
    filt = get_filter(name)
    state = filt.init_state(w, h, int(Palette.RGB24))
    outs = []
    p = {q.name: q.default for q in filt.params}
    p.update(params or {})
    for i in range(n):
        ctx = FrameContext(tc=i / 30.0, frame=i, fps=30.0,
                           width=w, height=h)
        layer, state = filt.process([], p, ctx, state)
        outs.append(np.asarray(layer.planes[0]))
    return outs, state


def test_identity_preset_preserves_frame():
    register_milk_preset(
        "[p]\nfDecay=1.0\nzoom=1.0\nwarp=0.0\nwave_a=0.0\nfGammaAdj=1.0\n",
        "ident")
    outs, state = run_frames("milk_ident", 3)
    prev = np.asarray(state[0])
    # decay 1, no warp, no wave: the float state stays all-zero
    assert np.all(prev == 0.0)
    assert all(np.all(o == 0) for o in outs)


def test_wave_then_decay():
    register_milk_preset(
        "[p]\nfDecay=0.5\nzoom=1.0\nwarp=0.0\nwave_a=1.0\n"
        "wave_r=1.0\nwave_g=1.0\nwave_b=1.0\nnWaveMode=5\n", "wv")
    outs, state = run_frames("milk_wv", 4)
    # the waveform lights pixels; decay keeps the field bounded
    assert outs[0].max() > 0
    assert all(o.dtype == np.uint8 for o in outs)
    prev = np.asarray(state[0])
    assert prev.max() <= 1.0 and prev.min() >= 0.0


def test_zoom_preset_moves_energy_and_stays_finite():
    register_milk_preset(BUILTIN_PRESETS["tunnel"], "tunnel_t")
    outs, state = run_frames("milk_tunnel_t", 6,
                             params={"bass": 0.8, "mid": 0.4, "treb": 0.4,
                                     "vol": 0.5})
    assert np.isfinite(np.asarray(state[0])).all()
    # frames evolve (feedback + wave): consecutive frames differ
    assert any(not np.array_equal(outs[i], outs[i + 1]) for i in range(5))


def test_q_vars_persist_and_init_runs_once():
    register_milk_preset(
        "[p]\nfDecay=0.9\nwave_a=0.0\n"
        "per_frame_init_1=q1 = 5;\n"
        "per_frame_1=q1 = q1 + 1;\n"
        "per_frame_2=zoom = 1.0 + q1*0.001;\n", "qtest")
    _outs, state = run_frames("milk_qtest", 3)
    # init ran once (q1=5), then +1 per frame over 3 frames -> 8
    assert float(np.asarray(state[1])[0]) == pytest.approx(8.0)


def test_determinism():
    register_milk_preset(BUILTIN_PRESETS["spin"], "spin_t")
    a, sa = run_frames("milk_spin_t", 4)
    b, sb = run_frames("milk_spin_t", 4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    np.testing.assert_array_equal(np.asarray(sa[0]), np.asarray(sb[0]))


def test_builtins_registered_and_run_in_graph():
    """The shipped presets registered at import; one runs as a clip
    source through the production FrameGraph."""
    for name in BUILTIN_PRESETS:
        assert get_filter(f"milk_{name}") is not None
    from lives_tpu.graph import FrameGraph, SinkSpec
    from lives_tpu.io.genclip import GeneratorClip
    h, w = 48, 64
    clip = GeneratorClip("milk_pulse", width=w, height=h, fps=30.0)
    g = FrameGraph([], sink=SinkSpec(width=w, height=h), fps=30.0)
    frames = []
    for i in range(3):
        # stateful generator clips pull frames host-side (the state
        # pytree lives on the clip), then feed the graph as layers
        out = g.run([clip.get_frame(i)], tc=i / 30.0, frame=i)
        frames.append(np.asarray(out.planes[0]))
    assert frames[0].shape[-2:] == (h, w)
    assert any(not np.array_equal(frames[i], frames[i + 1])
               for i in range(2))


def test_load_milk_preset_file(tmp_path):
    from lives_tpu.effects.milkdrop import load_milk_preset
    p = tmp_path / "My Cool Preset.milk"
    p.write_text(MILK_TEXT)
    f = load_milk_preset(p)
    assert f.name == "milk_my cool preset"
    outs, _ = run_frames(f.name, 2)
    assert outs[0].shape == (3, 48, 64)


def test_osc_open_generator_and_milk(tmp_path):
    """Extension endpoints /clip/open/generator + /clip/open/milk load a
    preset file live and register a generator clip source."""
    import socket
    from lives_tpu.osc.server import OSCServer
    from lives_tpu.osc.protocol import build_message, parse_packet
    from lives_tpu.player.player import Player

    srv = OSCServer(player=Player(sink=None))
    srv.start()
    try:
        def rpc(path, *args):
            cl = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            cl.settimeout(3.0)
            cl.sendto(build_message(path, *args), ("127.0.0.1", srv.port))
            data, _ = cl.recvfrom(65536)
            cl.close()
            (msg,) = parse_packet(data)
            return msg

        cid = int(rpc("/clip/open/generator", "milk_tunnel", 64, 48).args[0])
        assert srv.clips[cid].name == "milk_tunnel"
        assert srv.clips[cid].get_frame(0).planes[0].shape[-2:] == (48, 64)

        p = tmp_path / "osc_preset.milk"
        p.write_text(MILK_TEXT)
        cid2 = int(rpc("/clip/open/milk", str(p), 64, 48).args[0])
        assert srv.clips[cid2].name == "milk_osc_preset"
        f0 = np.asarray(srv.clips[cid2].get_frame(0).planes[0])
        assert f0.shape == (3, 48, 64)
    finally:
        srv.stop()


def test_audio_fft_drives_milk_preset_via_pconx():
    """The projectM story end-to-end: tone -> audio_fft analyser ->
    pconx autoscale -> milk generator 'bass' param -> visual response
    (the preset's per_frame couples zoom to bass)."""
    from lives_tpu.audio import audio_instantiate
    from lives_tpu.effects.data import DataConnections
    from lives_tpu.io.genclip import GeneratorClip

    RATE = 44100
    t = np.arange(4096)
    loud = np.stack([np.sin(2 * np.pi * 80 * t / RATE)] * 2, -1) \
        .astype(np.float32) * 0.9
    quiet = loud * 0.01

    fft = audio_instantiate("audio_fft", freq=80.0, rate=RATE)
    clip = GeneratorClip("milk_tunnel", width=64, height=48, fps=30.0)
    dc = DataConnections()
    dc.add(fft, "value", clip.inst, "bass", autoscale=True)

    def step(block, n):
        fft.apply(block)
        dc.chain_data(clip.inst)
        return float(clip.inst.values.get("bass", 0.0)), \
            np.asarray(clip.get_frame(n).planes[0])

    b0, _f0 = step(loud, 0)
    b1, _f1 = step(loud, 1)
    clip2 = GeneratorClip("milk_tunnel", width=64, height=48, fps=30.0)
    fftq = audio_instantiate("audio_fft", freq=80.0, rate=RATE)
    dcq = DataConnections()
    dcq.add(fftq, "value", clip2.inst, "bass", autoscale=True)
    fftq.apply(quiet)
    dcq.chain_data(clip2.inst)
    bq = float(clip2.inst.values.get("bass", 0.0))
    assert b1 > bq  # loud tone at the analysed frequency raises bass


def test_post_filters_and_echo_affect_display_not_state():
    """invert/solarize/echo run in the composite pass only: the feedback
    state must be identical with and without them (MilkDrop applies post
    FX to what is shown, not to the warp texture)."""
    base = ("[p]\nfDecay=0.8\nwave_a=1.0\nwave_r=1.0\nwave_g=1.0\n"
            "wave_b=1.0\nnWaveMode=5\nfGammaAdj=1.0\n")
    register_milk_preset(base, "plainpf")
    register_milk_preset(base + "bInvert=1\nbSolarize=1\n"
                                "echo_alpha=0.4\necho_zoom=2.0\n", "postpf")
    outs_a, st_a = run_frames("milk_plainpf", 3)
    outs_b, st_b = run_frames("milk_postpf", 3)
    np.testing.assert_allclose(np.asarray(st_a[0]), np.asarray(st_b[0]),
                               atol=1e-6)  # state untouched by post FX
    assert any(not np.array_equal(a, b) for a, b in zip(outs_a, outs_b))


def test_invert_flips_display():
    register_milk_preset(
        "[p]\nfDecay=1.0\nzoom=1.0\nwarp=0.0\nwave_a=0.0\n"
        "fGammaAdj=1.0\nbInvert=1\n", "inv")
    outs, _ = run_frames("milk_inv", 2)
    # zero field inverted -> full white display
    assert np.all(outs[0] == 255)


def test_wrap_toroidal_sampling():
    """zoom < 1 pushes sample coords outside [0,1]: with bWrap=1 content
    wraps around, with bWrap=0 the edge clamps. Seed via one wave frame,
    then compare the second frame's edges."""
    base = ("[p]\nfDecay=1.0\nzoom=0.62\nwarp=0.0\nwave_a=1.0\n"
            "wave_r=1.0\nwave_g=1.0\nwave_b=1.0\nnWaveMode=5\n"
            "wave_y=0.95\nfGammaAdj=1.0\n")
    register_milk_preset(base + "bWrap=1\n", "wr1")
    register_milk_preset(base + "bWrap=0\n", "wr0")
    a, _ = run_frames("milk_wr1", 3)
    b, _ = run_frames("milk_wr0", 3)
    assert any(not np.array_equal(x, y) for x, y in zip(a[1:], b[1:]))


def test_player_pulls_stateful_generator_without_precache_race():
    """A milk preset as fg clip with precache enabled: frames must come
    from live per-tick pulls (no caching/lookahead - frame n of a
    feedback generator is not a pure function of n), and the precache
    worker must never touch the clip from its thread."""
    import time
    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.genclip import GeneratorClip
    from lives_tpu.player import CollectSink, Player

    clip = GeneratorClip("milk_pulse", width=64, height=48, fps=30.0)
    pulls = []
    orig = clip.get_frame

    import threading
    main = threading.get_ident()

    def spy(n):
        pulls.append((n, threading.get_ident()))
        return orig(n)

    clip.get_frame = spy
    p = Player(sink=CollectSink(), sink_spec=SinkSpec())
    p.precache_depth = 4
    p.state.fg_clip = clip
    p.start()
    for i in range(5):
        p.state.frame = -1
        p._clock0 = time.monotonic()
        p._frame0 = float(i)
        p.process_one()
    time.sleep(0.1)  # give a (wrongly-started) worker time to fire
    assert len(pulls) >= 5
    assert all(t == main for _n, t in pulls)  # never from the worker
    assert len(p.sink.frames) >= 5


def test_authentic_milk_key_spellings():
    """A preset written with MilkDrop's own INI key spellings
    (fZoomExponent / fVideoEcho* / bTexWrap / fWaveAlpha / fWaveParam)
    maps onto the runtime equation variables."""
    text = """[preset00]
fRating=3.0
fGammaAdj=1.0
fDecay=0.9
fVideoEchoZoom=2.0
fVideoEchoAlpha=0.5
nVideoEchoOrientation=1
nWaveMode=5
bTexWrap=0
bDarkenCenter=1
fWaveAlpha=1.0
fWaveScale=1.2
fWaveParam=0.3
fZoomExponent=2.5
fWarpAnimSpeed=1.5
fWarpScale=1.3
zoom=1.02
rot=0.0
warp=0.1
per_frame_1=zoom = zoom + 0.01*sin(time*0.7);
per_pixel_1=zoom = zoom + 0.02*rad;
"""
    f = register_milk_preset(text, "authentic")
    outs, state = run_frames(f.name, 4)
    assert np.isfinite(np.asarray(state[0])).all()
    assert outs[0].max() > 0  # fWaveAlpha=1 wave drew
    # the echo gate engaged off fVideoEchoAlpha: the composite differs
    # from the raw feedback field
    fb = np.asarray(state[0])
    shown = outs[-1].astype(np.float32) / 255.0
    assert not np.allclose(shown, np.clip(fb, 0, 1), atol=1 / 255.0)


# ---------------------------------------------------------------------------
# custom waves / shapes (wavecode_* / shapecode_*)


SHAPE_TEXT = """[preset00]
fDecay=1.0
zoom=1.0
warp=0.0
wave_a=0.0
fGammaAdj=1.0
shapecode_1_enabled=1
shapecode_1_sides=4
shapecode_1_x=0.5
shapecode_1_y=0.5
shapecode_1_rad=0.4
shapecode_1_r=0
shapecode_1_g=1
shapecode_1_b=0
shapecode_1_a=1
shapecode_1_r2=0
shapecode_1_g2=1
shapecode_1_b2=0
shapecode_1_a2=1
shapecode_1_border_a=0
shapecode_2_enabled=0
shapecode_2_rad=0.9
shape_1_per_frame1=t1 = t1 + 1;
"""

WAVE_TEXT = """[preset00]
fDecay=1.0
zoom=1.0
warp=0.0
wave_a=0.0
fGammaAdj=1.0
wavecode_0_enabled=1
wavecode_0_bAdditive=0
wavecode_0_bDrawThick=1
wavecode_0_r=1
wavecode_0_g=0
wavecode_0_b=1
wavecode_0_a=1
wave_0_init1=t1 = 0.25;
wave_0_per_frame1=r = 1;
wave_0_per_point1=x = sample;
wave_0_per_point2=y = t1 + 0.0*value1;
"""


def test_parse_custom_objects():
    pre = parse_preset(SHAPE_TEXT, "sh")
    assert 1 in pre.shapes and 2 in pre.shapes
    assert pre.shapes[1]["cfg"]["rad"] == pytest.approx(0.4)
    assert pre.shapes[1]["cfg"]["enabled"] == 1
    assert "t1 + 1" in pre.shapes[1]["frame"]
    pre2 = parse_preset(WAVE_TEXT, "wv")
    assert pre2.waves[0]["cfg"]["bdrawthick"] == 1
    assert "t1 = 0.25" in pre2.waves[0]["init"]
    assert "y = t1" in pre2.waves[0]["point"]
    # wave equation keys don't leak into the main per_frame chains
    assert "t1" not in pre2.per_frame


def test_custom_shape_renders_gradient_fill():
    register_milk_preset(SHAPE_TEXT, "cshape")
    outs, _state = run_frames("milk_cshape", 2, h=64, w=64)
    o = outs[0].astype(np.float32)
    # centre pixel is the shape colour (pure green, alpha 1)
    cy, cx = 32, 32
    assert o[1, cy, cx] > 200 and o[0, cy, cx] < 30 and o[2, cy, cx] < 30
    # far corner is outside the shape: stays black
    assert o[:, 2, 2].max() == 0


def test_custom_shape_disabled_is_skipped():
    # shape 2 has rad=0.9 but enabled=0: nothing outside shape 1's rad
    register_milk_preset(SHAPE_TEXT, "cshape2")
    outs, _state = run_frames("milk_cshape2", 1, h=64, w=64)
    assert outs[0][:, 2, 2].max() == 0


def test_custom_wave_renders_along_per_point_path():
    register_milk_preset(WAVE_TEXT, "cwave")
    outs, _state = run_frames("milk_cwave", 2, h=64, w=64)
    o = outs[0].astype(np.float32)
    # per_point sets y = t1 = 0.25 (bottom-up -> row ~0.75*63): the wave
    # line lights magenta pixels near that row, and none near row 8
    row = int(round(0.75 * 63))
    band = o[:, row - 3:row + 4, 8:56]
    assert band[0].max() > 120 and band[2].max() > 120  # magenta
    assert band[1].max() < 60
    assert o[:, 4:12, :].max() < 10


def test_custom_shape_instances_and_code_animate():
    text = """[p]
fDecay=1.0
zoom=1.0
warp=0.0
wave_a=0.0
fGammaAdj=1.0
shapecode_0_enabled=1
shapecode_0_sides=32
shapecode_0_num_inst=2
shapecode_0_rad=0.18
shapecode_0_a=1
shapecode_0_a2=1
shapecode_0_r=1
shapecode_0_g=0
shapecode_0_b=0
shapecode_0_r2=1
shapecode_0_g2=0
shapecode_0_b2=0
shapecode_0_border_a=0
shape_0_per_frame1=x = 0.25 + 0.5*instance;
shape_0_per_frame2=y = 0.5 + 0.2*sin(time);
"""
    register_milk_preset(text, "cinst")
    outs, _ = run_frames("milk_cinst", 3, h=64, w=64)
    o0 = outs[0].astype(np.float32)
    # two instances: red discs near x=0.25 and x=0.75 at t=0 (y=0.5)
    assert o0[0, 32, 16] > 200 and o0[0, 32, 48] > 200
    assert o0[0, 32, 32] < 50  # gap between the two discs
    # per-frame sin(time) moves the discs between frames
    assert not np.array_equal(outs[0], outs[2])


def test_textured_shape_samples_previous_frame():
    text = """[p]
fDecay=1.0
zoom=1.0
warp=0.0
wave_a=0.8
wave_r=1
wave_g=1
wave_b=1
nWaveMode=5
fGammaAdj=1.0
shapecode_0_enabled=1
shapecode_0_sides=4
shapecode_0_textured=1
shapecode_0_rad=0.3
shapecode_0_tex_zoom=0.5
shapecode_0_r=1
shapecode_0_g=1
shapecode_0_b=1
shapecode_0_a=1
shapecode_0_a2=1
shapecode_0_r2=1
shapecode_0_g2=1
shapecode_0_b2=1
shapecode_0_border_a=0
"""
    register_milk_preset(text, "ctex")
    outs, state = run_frames("milk_ctex", 3, h=64, w=64)
    # textured shape multiplies prev-frame samples: frame 0 prev is
    # black -> centre stays dark even though vertex colour is white;
    # later frames pick up the waveform energy
    assert np.isfinite(np.asarray(state[0])).all()
    assert outs[2].max() > 0


def test_custom_objects_deterministic():
    register_milk_preset(WAVE_TEXT, "cwdet")
    a, _ = run_frames("milk_cwdet", 3)
    b, _ = run_frames("milk_cwdet", 3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_motion_vector_grid_draws_lattice():
    text = """[p]
fDecay=1.0
zoom=1.02
warp=0.0
wave_a=0.0
fGammaAdj=1.0
nMotionVectorsX=4
nMotionVectorsY=3
mv_a=1.0
mv_r=1
mv_g=0
mv_b=0
"""
    register_milk_preset(text, "cmv")
    outs, _ = run_frames("milk_cmv", 2, h=96, w=96)
    o = outs[0].astype(np.float32)
    # a sparse red lattice: red energy present, green stays dark,
    # and lit pixels are a small fraction of the frame
    lit = (o[0] > 100).mean()
    assert o[0].max() > 150
    assert o[1].max() < 40
    assert 0.0 < lit < 0.2


def test_motion_vectors_off_by_default():
    register_milk_preset(
        "[p]\nfDecay=1.0\nzoom=1.0\nwarp=0.0\nwave_a=0.0\nfGammaAdj=1.0\n",
        "nomv")
    outs, _ = run_frames("milk_nomv", 2, h=64, w=64)
    assert all(o.max() == 0 for o in outs)


def test_geometry_builtin_runs_with_audio():
    register_milk_preset(BUILTIN_PRESETS["geometry"], "geom_t")
    outs, state = run_frames("milk_geom_t", 5,
                             params={"bass": 0.9, "mid": 0.4,
                                     "treb": 0.5, "vol": 0.6})
    assert np.isfinite(np.asarray(state[0])).all()
    assert outs[2].max() > 0
    assert any(not np.array_equal(outs[i], outs[i + 1]) for i in range(4))


def test_milkdir_playlist_cycle(tmp_path):
    """projectM preset-directory role: open a dir of .milk files as one
    generator clip, cycle presets in place; frames keep flowing and the
    precache version key bumps on each switch."""
    from lives_tpu.osc.server import OSCServer
    from lives_tpu.player import Player
    (tmp_path / "a_first.milk").write_text(
        "[p]\nfDecay=0.9\nzoom=1.0\nwarp=0.0\nwave_a=1.0\nnWaveMode=5\n")
    (tmp_path / "b_second.milk").write_text(
        "[p]\nfDecay=0.5\nzoom=1.01\nwarp=0.1\nwave_a=0.6\n")
    srv = OSCServer(player=Player())
    cid = srv.methods["/clip/open/milkdir"](str(tmp_path), 64, 48, 25.0)
    clip = srv.clips[cid]
    assert clip.name == "milk_a_first"
    assert clip.playlist == ["milk_a_first", "milk_b_second"]
    f0 = np.asarray(clip.get_frame(0).planes[0])
    v0 = getattr(clip, "version", 0)
    assert srv.methods["/clip/generator/next"](cid) == 1
    assert clip.name == "milk_b_second"
    assert clip.version == v0 + 1
    f1 = np.asarray(clip.get_frame(1).planes[0])
    assert f1.shape == f0.shape
    # wraps around, and explicit switch works too
    srv.methods["/clip/generator/next"](cid)
    assert clip.name == "milk_a_first"
    srv.methods["/clip/generator/switch"](cid, "milk_b_second")
    assert clip.name == "milk_b_second"


def test_milk_parser_fuzz_no_crash():
    """Untrusted preset files must parse-or-raise cleanly (no hangs, no
    non-ValueError crashes), including the custom-object key space."""
    import random
    rng = random.Random(7)
    frags = [
        "[preset00]", "fDecay=abc", "fDecay=", "=5", "zoom=1.01",
        "shapecode_0_enabled=1", "shapecode_0_sides=-3",
        "shapecode_0_sides=1000000", "shapecode_99_rad=nan",
        "shapecode_0_num_inst=99", "shape_0_per_frame1=x = x + ",
        "shape_0_per_frame1=x = q1*2;", "shape_0_init1=t1 = rand(1);",
        "wavecode_0_enabled=1", "wavecode_0_samples=0",
        "wave_0_per_point1=y = value1/0;", "wave_0_per_point1=x = (",
        "wave_0_per_frame1=r = unknownfn(1);",
        "per_frame_1=zoom = zoom + bass*;", "per_pixel_1=rot = rad*ang;",
        "per_frame_abc=zoom=2", "warp_1=shader { }", "comp_1=float4 x;",
        "nMotionVectorsX=9999", "mv_a=2", "mv_l=-5",
        "fDecay=nan", "zoom=inf", "shapecode_0_rad=nan", "mv_a=inf",
        "\x00\x01binary=1", "a" * 500 + "=1",
    ]
    for trial in range(60):
        text = "\n".join(rng.choice(frags)
                         for _ in range(rng.randrange(1, 14)))
        try:
            pre = parse_preset(text, f"fuzz{trial}")
        except ValueError:
            continue
        # building the renderer may reject bad equations (ValueError)
        # but must not crash any other way; good builds must render
        from lives_tpu.effects.milkdrop import build_preset_process
        try:
            process, init_state = build_preset_process(pre)
        except ValueError:
            continue
        state = init_state(32, 24, int(Palette.RGB24))
        ctx = FrameContext(tc=0.1, frame=1, fps=30.0, width=32, height=24)
        p = {"bass": 0.5, "mid": 0.5, "treb": 0.5, "vol": 0.5}
        layer, state = process([], p, ctx, state)
        arr = np.asarray(layer.planes[0])
        assert arr.dtype == np.uint8 and np.isfinite(
            np.asarray(state[0])).all()


def test_milkdir_skips_out_of_subset_presets(tmp_path):
    """projectM skips unloadable presets instead of failing the whole
    directory: one bad file (unknown function) must not abort the open."""
    from lives_tpu.osc.server import OSCServer
    from lives_tpu.player import Player
    (tmp_path / "good.milk").write_text("[p]\nfDecay=0.9\nwave_a=1\n")
    (tmp_path / "bad.milk").write_text(
        "[p]\nper_frame_1=q1 = freembuf(0);\n")
    srv = OSCServer(player=Player())
    cid = srv.methods["/clip/open/milkdir"](str(tmp_path), 64, 48, 25.0)
    assert srv.clips[cid].playlist == ["milk_good"]


def test_generator_switch_race_with_live_pulls(tmp_path):
    """switch() on another thread while the player pulls frames must
    never feed the new filter the old filter's state pytree (the state
    write-back is guarded by the clip lock)."""
    import threading
    from lives_tpu.io.genclip import GeneratorClip
    register_milk_preset("[p]\nfDecay=0.9\nwave_a=1\nnWaveMode=5\n", "ra")
    register_milk_preset("[p]\nfDecay=0.5\nzoom=1.01\nwave_a=0.4\n", "rb")
    clip = GeneratorClip("milk_ra", width=48, height=32, fps=30.0)
    errs = []
    stop = threading.Event()

    def puller():
        n = 0
        while not stop.is_set():
            try:
                clip.get_frame(n)
                n += 1
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return
    th = threading.Thread(target=puller)
    th.start()
    try:
        for i in range(30):
            clip.switch("milk_rb" if i % 2 == 0 else "milk_ra")
    finally:
        stop.set()
        th.join(timeout=30)
    assert not errs, errs


def test_autocycle_switches_presets_during_playback(tmp_path):
    """projectM presetDuration role: with autocycle set, the player
    switches the playlist at safe points on its own clock."""
    import time as _time
    from lives_tpu.graph import SinkSpec
    from lives_tpu.osc.server import OSCServer
    from lives_tpu.player import NullSink, Player
    (tmp_path / "a.milk").write_text("[p]\nfDecay=0.9\nwave_a=1\n")
    (tmp_path / "b.milk").write_text("[p]\nfDecay=0.5\nzoom=1.01\n")
    p = Player(sink=NullSink(), sink_spec=SinkSpec(width=48, height=32),
               fps=30.0)
    srv = OSCServer(player=p)
    cid = srv.methods["/clip/open/milkdir"](str(tmp_path), 48, 32, 30.0)
    clip = srv.clips[cid]
    p.state.fg_clip = clip
    assert srv.methods["/clip/generator/autocycle"](0.4, cid) == 1
    p.set_pb_fps(30.0)
    p.start()
    names = {clip.name}
    # generous deadline: the b-preset template jit-compiles mid-window,
    # which under full-suite load can eat several seconds on the single
    # host core; the loop exits the moment the switch is observed, so
    # the uncontended case still finishes in well under a second
    t0 = _time.monotonic()
    while _time.monotonic() - t0 < 20.0 and len(names) < 2:
        p.process_one()
        names.add(clip.name)
        _time.sleep(0.002)
    p.stop()
    assert names == {"milk_a", "milk_b"}
    # 0 disables
    srv.methods["/clip/generator/autocycle"](0, cid)
    assert clip.autocycle_secs == 0.0


def test_megabuf_persists_across_frames():
    """ns-eel megabuf: indexed scratch memory persists frame to frame
    (gates post-2007 presets that buffer history); out-of-range reads
    are 0 (eel semantics), and q-vars can load from it."""
    from lives_tpu.effects.host import FrameContext
    from lives_tpu.effects.milkdrop import build_preset_process, \
        parse_preset
    txt = ("[p]\nfDecay=0.95\n"
           "per_frame_1=megabuf(frame%4) = 10 + frame;\n"
           "per_frame_2=q1 = megabuf(0);\n"
           "per_frame_3=q2 = megabuf(9999999);\n"
           "per_frame_4=q3 = megabuf(-3);\n")
    pre = parse_preset(txt, "mb")
    process, init_state = build_preset_process(pre)
    state = init_state(16, 12, None)
    assert len(state) == 5          # prev, q, inited, megabuf, gmegabuf
    p = {"bass": 1.0, "mid": 1.0, "treb": 1.0, "vol": 1.0}
    q = None
    for fn in range(6):
        ctx = FrameContext(tc=fn / 30.0, frame=fn, fps=30.0,
                           width=16, height=12)
        _, state = process([], p, ctx, state)
        q = np.asarray(state[1])
    # frame 5: slot 0 last written at frame 4 (value 14)
    assert q[0] == 14.0
    assert q[1] == 0.0 and q[2] == 0.0   # out-of-range reads are 0
    buf = np.asarray(state[3])
    # slots 1 and 3 last written at frames 5 and 3 respectively
    assert buf[1] == 15.0 and buf[3] == 13.0


def test_megabuf_not_carried_when_unused():
    """Presets without megabuf keep the 3-tuple state (no 8 MB of
    scratch in every scan carry)."""
    from lives_tpu.effects.milkdrop import build_preset_process, \
        parse_preset
    pre = parse_preset("[p]\nfDecay=0.9\nper_frame_1=q1 = time;\n", "nb")
    _, init_state = build_preset_process(pre)
    assert len(init_state(16, 12, None)) == 3
