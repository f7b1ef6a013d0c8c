"""Aux subsystems: text/subtitles, streaming, OMC learn, compound filters,
prefs, diagnostics."""

import socket
import time

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer


def mk_layer(rng, h=32, w=64):
    return Layer(planes=(jnp.asarray(
        rng.integers(0, 256, (3, h, w), np.uint8)),),
        palette=int(Palette.RGB24))


# -- text / subtitles --------------------------------------------------------

def test_text_overlay(rng):
    from lives_tpu.text import overlay_text
    lay = Layer(planes=(jnp.zeros((3, 64, 128), jnp.uint8),),
                palette=int(Palette.RGB24))
    out = overlay_text(lay, "HELLO", size=20)
    arr = np.asarray(out.planes[0])
    assert arr.max() > 128  # text pixels rendered


def test_srt_roundtrip(tmp_path):
    from lives_tpu.text import Subtitle, load_srt, save_srt, sub_at
    subs = [Subtitle(0.0, 2.5, "first line\nsecond"),
            Subtitle(3.0, 5.0, "later")]
    p = tmp_path / "t.srt"
    save_srt(p, subs)
    back = load_srt(p)
    assert len(back) == 2
    assert back[0].text == "first line\nsecond"
    assert back[0].end == pytest.approx(2.5)
    assert sub_at(back, 4.0) == "later"
    assert sub_at(back, 2.7) is None


def test_microdvd_sub(tmp_path):
    from lives_tpu.text import load_sub
    p = tmp_path / "t.sub"
    p.write_text("{0}{50}hello|world\n{75}{100}bye\n")
    subs = load_sub(p, fps=25.0)
    assert subs[0].text == "hello\nworld"
    assert subs[0].end == pytest.approx(2.0)


def test_subtitle_overlay_player(rng):
    from lives_tpu.text import Subtitle, SubtitleOverlay
    ov = SubtitleOverlay([Subtitle(0.0, 1.0, "SUB")], size=16)
    lay = Layer(planes=(jnp.zeros((3, 48, 96), jnp.uint8),),
                palette=int(Palette.RGB24))
    out = ov.apply(lay, 0.5)
    assert np.asarray(out.planes[0]).max() > 0
    out2 = ov.apply(lay, 2.0)  # out of window: untouched
    assert np.asarray(out2.planes[0]).max() == 0


# -- streaming ---------------------------------------------------------------

def test_stream_send_receive(rng):
    from lives_tpu.stream import StreamReceiver, StreamSender
    rx = StreamReceiver(port=0)
    tx = StreamSender("127.0.0.1", rx.port)
    lay = mk_layer(rng, h=16, w=32)
    deadline = time.time() + 5
    while time.time() < deadline and rx._latest is None:
        tx.play_frame(lay, 0.0)  # UDP: resend until assembled
        time.sleep(0.05)
    assert rx._latest is not None, "no frame received"
    got = rx.get_frame(0)
    np.testing.assert_array_equal(np.asarray(got.planes[0]),
                                  np.asarray(lay.planes[0]))
    rx.close()
    tx.exit_screen()


def test_stream_large_frame_chunks(rng):
    from lives_tpu.stream import StreamReceiver, StreamSender
    rx = StreamReceiver(port=0)
    tx = StreamSender("127.0.0.1", rx.port)
    lay = mk_layer(rng, h=240, w=320)  # 230KB > chunk size
    deadline = time.time() + 5
    while time.time() < deadline and rx._latest is None:
        tx.play_frame(lay, 0.0)  # UDP: resend until a frame assembles
        time.sleep(0.1)
    assert rx._latest is not None
    np.testing.assert_array_equal(np.asarray(rx._latest.planes[0]),
                                  np.asarray(lay.planes[0]))
    rx.close()


# -- OMC learn ---------------------------------------------------------------

def test_midi_parse():
    from lives_tpu.omc import MIDI_CC, MIDI_NOTE_ON, parse_midi
    evs = parse_midi(bytes([0x90, 60, 100, 0xB0, 7, 64]))
    assert evs[0].key.etype == MIDI_NOTE_ON and evs[0].key.index == 60
    assert evs[0].value == pytest.approx(100 / 127)
    assert evs[1].key.etype == MIDI_CC and evs[1].key.index == 7


def test_omc_learn_and_dispatch(tmp_path):
    from lives_tpu.omc import OMCLearner
    from lives_tpu.player import CollectSink, Player
    p = Player(sink=CollectSink())
    omc = OMCLearner(p)
    omc.start_learn("fps")
    assert omc.feed_midi(bytes([0xB0, 7, 127])) == 1  # binds CC7
    assert omc.learning is None
    omc.feed_midi(bytes([0xB0, 7, 64]))               # dispatch
    assert p.state.pb_fps == pytest.approx(64 / 127 * 50.0)
    # persistence
    omc.save_map(tmp_path / "map.json")
    omc2 = OMCLearner(p)
    omc2.load_map(tmp_path / "map.json")
    omc2.feed_midi(bytes([0xB0, 7, 127]))
    assert p.state.pb_fps == pytest.approx(50.0)


def test_omc_keys():
    from lives_tpu.omc import OMCLearner
    from lives_tpu.player import CollectSink, Player
    p = Player(sink=CollectSink())
    p.keymap.set_key(0, 0, "negate")
    omc = OMCLearner(p)
    omc.start_learn("key1_toggle")
    omc.feed_midi(bytes([0x90, 36, 100]))
    omc.feed_midi(bytes([0x90, 36, 100]))
    assert p.keymap.active[0]


# -- compound filters --------------------------------------------------------

def test_compound_filters(rng):
    from lives_tpu.effects.compound import register_builtin_compounds
    from lives_tpu.effects import apply_instance, instantiate
    register_builtin_compounds()
    lay = mk_layer(rng)
    inst = instantiate("night_vision", gain=1.5)
    out = np.asarray(apply_instance(inst, [lay])[0].planes[0], np.float32)
    assert out[1].mean() > out[0].mean()  # green-tinted
    # stateful compound
    vhs = instantiate("vhs")
    o1 = apply_instance(vhs, [lay])[0]
    o2 = apply_instance(vhs, [mk_layer(rng)])[0]
    assert vhs.state is not None
    np.asarray(o2.planes[0])


# -- prefs / diagnostics -----------------------------------------------------

def test_prefs_roundtrip(tmp_path):
    from lives_tpu.prefs import PrefsStore
    s = PrefsStore(tmp_path / "prefs.json")
    s.set("def_fps", 30.0)
    s.set("custom_thing", "abc")
    s.set("pb_quality", 3, deferred=True)
    assert s.get("pb_quality") == 2  # deferred not yet applied
    s.save()
    s2 = PrefsStore(tmp_path / "prefs.json")
    assert s2.get("def_fps") == 30.0
    assert s2.get("custom_thing") == "abc"
    s2.apply_future()
    assert s2.get("pb_quality") == 3


def test_startup_diagnostics():
    from lives_tpu.diagnostics import benchmark_memcpy, run_startup_tests
    res = run_startup_tests()
    assert all(res.values()), res
    mb = benchmark_memcpy(sizes=(1 << 20,))
    assert list(mb.values())[0] > 0.1  # > 0.1 GB/s


def test_frame_ladder():
    from lives_tpu.diagnostics import FrameLadder
    lad = FrameLadder()
    for _ in range(5):
        lad.begin()
        lad.mark("loaded")
        lad.mark("converted")
        lad.mark("applied")
        lad.mark("displayed")
        lad.end()
    st = lad.stats()
    assert "total" in st and st["total"]["p99_ms"] >= 0


# -- gated device/plugin bridges ---------------------------------------------

def test_frei0r_scan_gated():
    from lives_tpu.effects.frei0r import register_frei0r_filters, scan_plugins
    plugs = scan_plugins()          # empty without frei0r installed
    assert isinstance(plugs, list)
    n = register_frei0r_filters()   # must not raise
    assert n == len([p for p in plugs if p.plugin_type == 0])


def test_v4l2_gated():
    from lives_tpu.io.videodev import V4L2Source, list_devices
    devs = list_devices()
    if not devs:
        import pytest as _pytest
        with _pytest.raises(OSError):
            V4L2Source("/dev/video0")
    else:  # pragma: no cover (no cameras in CI container)
        src = V4L2Source(devs[0])
        lay = src.get_frame()
        assert lay.width > 0
        src.close()


def test_clip_backup_restore(tmp_path):
    from lives_tpu.io import open_clip
    from lives_tpu.io.decoders import write_y4m
    from lives_tpu.sets import backup_clip, restore_clip
    frames = [(np.full((16, 32), 99, np.uint8),
               np.full((8, 16), 128, np.uint8),
               np.full((8, 16), 128, np.uint8)) for _ in range(3)]
    write_y4m(str(tmp_path / "c.y4m"), frames)
    clip = open_clip(str(tmp_path / "c.y4m"), tmp_path / "w1")
    clip.realize(0, 3)  # make frames self-contained images
    arc = backup_clip(clip, tmp_path / "clip.lvt")
    assert arc.exists()
    clip2 = restore_clip(arc, tmp_path / "w2")
    assert clip2.frames == 3 and clip2.width == 32
    a = np.asarray(clip2.get_frame(1).planes[0])
    b = np.asarray(clip.get_frame(1).planes[0])
    np.testing.assert_array_equal(a, b)


def test_y4m_stream_source(tmp_path):
    import io as _io
    from lives_tpu.io.decoders import Y4MStreamSource, write_y4m
    frames = [(np.full((16, 32), 30 + i * 20, np.uint8),
               np.full((8, 16), 128, np.uint8),
               np.full((8, 16), 128, np.uint8)) for i in range(3)]
    write_y4m(str(tmp_path / "s.y4m"), frames)
    src = Y4MStreamSource(_io.BytesIO((tmp_path / "s.y4m").read_bytes()))
    assert (src.width, src.height) == (32, 16)
    f0 = src.get_frame()
    assert int(np.asarray(f0.planes[0])[0, 0]) == 30
    f1 = src.get_frame()
    assert int(np.asarray(f1.planes[0])[0, 0]) == 50
    src.get_frame()
    held = src.get_frame()  # EOF -> hold last
    assert int(np.asarray(held.planes[0])[0, 0]) == 70


def test_audio_transition():
    from lives_tpu.audio.fx import audio_instantiate
    quad = np.zeros((100, 4), np.float32)
    quad[:, :2] = 1.0   # A loud
    quad[:, 2:] = -1.0  # B loud (opposite sign)
    t = audio_instantiate("audio_transition", amount=0.0)
    np.testing.assert_allclose(t.apply(quad)[:, 0], 1.0, atol=1e-6)
    t.values["amount"] = 1.0
    np.testing.assert_allclose(t.apply(quad)[:, 0], -1.0, atol=1e-6)
    t.values["amount"] = 0.5
    mid = t.apply(quad)[0, 0]
    assert abs(mid) < 0.01  # equal-power midpoint cancels


def test_joystick_parse_and_learn():
    """OMC joystick path (omc-learn.c js events): parse raw js_event
    structs, learn an axis onto a macro, drive it."""
    import struct
    from lives_tpu.omc import (JS_AXIS, JS_BUTTON, OMCLearner, feed_js,
                               parse_js)

    def js(value, jtype, number):
        return struct.pack("<IhBB", 0, value, jtype, number)

    evs = parse_js(js(16384, 2, 0) + js(1, 1, 3) + js(0, 0x82, 1))
    assert len(evs) == 2  # init event skipped
    assert evs[0].key.etype == JS_AXIS and abs(evs[0].value - 0.5) < 0.01
    assert evs[1].key.etype == JS_BUTTON and evs[1].value == 1.0

    got = []
    lrn = OMCLearner()
    lrn.add_macro("level", lambda v: got.append(v), takes_value=True)
    lrn.start_learn("level")
    feed_js(lrn, js(0, 2, 1))          # axis 1 wiggles -> learned
    assert lrn.learning is None
    feed_js(lrn, js(32767, 2, 1))      # full deflection
    assert got and abs(got[-1] - 1.0) < 0.01


def test_adaptive_effort_ladder():
    """Effort degrades letterbox + precache, not just resize method
    (reference effort updates, player.c)."""
    import time
    import numpy as np
    import jax.numpy as jnp
    from lives_tpu.constants import Palette
    from lives_tpu.graph import SinkSpec
    from lives_tpu.layer import Layer
    from lives_tpu.player import CollectSink, Player

    class MemClip:
        frames, fps, width, height, unique_id = 10, 25.0, 32, 24, 1

        def get_frame(self, n):
            return Layer(planes=(jnp.full((3, 24, 32), n * 9, jnp.uint8),),
                         palette=int(Palette.RGB24))

    p = Player(sink=CollectSink(),
               sink_spec=SinkSpec(width=48, height=48, letterbox=True))
    p.state.fg_clip = MemClip()
    p.adaptive_quality = True
    p.precache_depth = 2
    p.start()
    # simulate sustained over-budget frames
    p._frame_times = [1.0] * 8
    for _ in range(4):
        p._update_effort()
        p._frame_times = [1.0] * 8
    assert p.effort == 3
    assert p.sink_spec.method == "nearest"
    assert p.sink_spec.letterbox is False     # degraded
    assert p.precache_depth == 0              # paused
    # recovery restores the user's intent
    for _ in range(4):
        p._frame_times = [0.001] * 8
        p._update_effort()
    assert p.effort == 0
    assert p.sink_spec.letterbox is True
    assert p.precache_depth == 2
    p.stop()


def test_pref_single_source_of_truth(tmp_path, monkeypatch):
    """Round 3 (VERDICT item 8): pref() is the one config read path —
    PrefsStore value with LIVES_TPU_* env as the override layer; the
    reference PREF_* key namespace exists and persists."""
    from lives_tpu import prefs as P
    s = P.PrefsStore(tmp_path / "prefsrc")
    P.set_store(s)
    try:
        # default comes from ENV_KNOBS builtin
        monkeypatch.delenv("LIVES_TPU_FUSED_SWEEP", raising=False)
        assert P.pref("fused_sweep") == "1"
        # stored pref is consulted
        s.set("fused_sweep", 0)
        assert P.pref("fused_sweep") == "0"
        # env overrides the store
        monkeypatch.setenv("LIVES_TPU_FUSED_SWEEP", "1")
        assert P.pref("fused_sweep") == "1"
        # reference PREF_ keys: 186 exist, persist through save/load
        assert len(P.REFERENCE_PREF_KEYS) >= 180
        # completeness audit against the reference header itself: every
        # PREF_ string key in preferences.h is covered ("foo" is the doc
        # example at preferences.h:1131, not a real pref)
        import pathlib
        import re
        hdr = pathlib.Path("/root/reference/src/preferences.h")
        if hdr.exists():
            refk = set(re.findall(r'#define\s+PREF_\w+\s+"([^"]+)"',
                                  hdr.read_text(errors="ignore"))) - {"foo"}
            missing = refk - set(P.REFERENCE_PREF_KEYS)
            assert not missing, f"unported PREF_ keys: {sorted(missing)}"
        s.set("mt_def_fps", 50.0)
        s.set("rec_stop-dwarn", 1)
        s.save()
        s2 = P.PrefsStore(tmp_path / "prefsrc")
        assert s2.get("mt_def_fps") == 50.0
        assert s2.get("rec_stop-dwarn") == 1
    finally:
        P.set_store(None)


def test_pref_live_deferred_over_osc(tmp_path):
    """preferences.h:1080+ prefs/future_prefs model over the OSC surface."""
    from lives_tpu import prefs as P
    s = P.PrefsStore(tmp_path / "prefsrc")
    P.set_store(s)
    try:
        from lives_tpu.osc.server import OSCServer
        from lives_tpu.player import Player, NullSink
        srv = OSCServer(Player(sink=NullSink()))
        live = srv.methods["/pref/set"]
        get = srv.methods["/pref/get"]
        live("def_fps", "50")
        assert get("def_fps") == 50 and s.prefs.def_fps == 50
        live("encoder", "ffmpeg_encoder")
        assert get("encoder") == "ffmpeg_encoder"
        # deferred lands in future until apply_future (the "restart")
        live("def_fps", "60", 1)
        assert get("def_fps") == 50
        srv.methods["/pref/apply_future"]()
        assert get("def_fps") == 60
    finally:
        P.set_store(None)
