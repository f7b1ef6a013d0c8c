"""Clip audio editing (audioedit.py) — the reference's Audio menu
(callbacks.c on_fade_audio_activate:11832, on_normalise_audio:11520,
on_trim_audio:11748, on_del_audio:11958, on_ins_silence:12416,
on_append_audio:11577): sample-accurate asserts over the on-disk PCM,
plus the OSC routes operating on the frame selection."""

import numpy as np
import pytest

from lives_tpu import audioedit as ae
from lives_tpu.io.clips import create_clip

RATE = 8000


@pytest.fixture
def clip(tmp_path):
    c = create_clip(tmp_path, 64, 48, fps=10.0, name="a")
    c.frames = 20                      # 2 s of video at 10 fps
    t = np.arange(RATE * 2, dtype=np.float32) / RATE
    wave = 0.5 * np.sin(2 * np.pi * 220 * t)
    c.write_audio(np.stack([wave, wave], axis=1), RATE)
    return c


def test_fade_in_out(clip):
    a0 = clip.read_audio()
    ae.fade_in(clip, 1.0)
    a = clip.read_audio()
    assert abs(a[0, 0]) < 1e-6                       # starts silent
    np.testing.assert_allclose(a[RATE:], a0[RATE:], atol=2 / 32768)
    w = slice(RATE // 2 - 200, RATE // 2 + 200)
    mid = float(np.sqrt((a[w] ** 2).mean() / (a0[w] ** 2).mean()))
    assert 0.4 < mid < 0.6                           # linear ramp midpoint
    before_tail = a[: RATE + RATE // 2].copy()
    ae.fade_out(clip, 0.5)
    a = clip.read_audio()
    assert abs(a[-1, 0]) <= 2 / 32768                # ends silent
    np.testing.assert_allclose(a[: RATE + RATE // 2], before_tail,
                               atol=2 / 32768)       # head untouched
    tail = slice(-RATE // 4 - 200, -RATE // 4 + 200)
    assert np.sqrt((a[tail] ** 2).mean()) < \
        0.7 * np.sqrt((a0[tail] ** 2).mean())        # tail fading


def test_fade_span_selection(clip):
    ae.fade_span(clip, 0.5, 1.0, 1.0, 0.0)
    a = clip.read_audio()
    assert abs(a[RATE - 1, 0]) <= 2 / 32768
    assert np.abs(a[RATE + RATE // 2:]).max() > 0.3  # after span untouched


def test_normalize_and_voladj(clip):
    gain = ae.normalize(clip)
    a = clip.read_audio()
    assert abs(np.abs(a).max() - 0.95) < 2 / 32768
    assert gain == pytest.approx(0.95 / 0.5, rel=1e-3)
    ae.voladj(clip, 0.5)
    assert abs(np.abs(clip.read_audio()).max() - 0.475) < 2 / 32768
    # silent clip: normalize is a no-op with gain 1
    clip.write_audio(np.zeros((100, 2), np.float32), RATE)
    assert ae.normalize(clip) == 1.0


def test_trim_pad(clip):
    a0 = clip.read_audio()
    ae.trim_pad(clip, 0.5, 1.5)                      # inside: pure trim
    a = clip.read_audio()
    assert len(a) == RATE
    np.testing.assert_array_equal(a, a0[RATE // 2: RATE + RATE // 2])
    ae.trim_pad(clip, 0.0, 2.0)                      # beyond: zero-pad
    a = clip.read_audio()
    assert len(a) == 2 * RATE
    assert np.abs(a[RATE:]).max() == 0.0             # padded tail silent


def test_delete_and_silence(clip):
    a0 = clip.read_audio()
    ae.delete_span(clip, 0.5, 1.0)
    a = clip.read_audio()
    assert len(a) == len(a0) - RATE // 2
    np.testing.assert_array_equal(a[: RATE // 2], a0[: RATE // 2])
    np.testing.assert_array_equal(a[RATE // 2:], a0[RATE:])
    ae.insert_silence(clip, 0.5, 1.0)
    a2 = clip.read_audio()
    assert len(a2) == len(a0)
    assert np.abs(a2[RATE // 2: RATE]).max() == 0.0
    np.testing.assert_array_equal(a2[RATE:], a0[RATE:])
    ae.delete_span(clip)                             # delete all
    assert len(clip.read_audio()) == 0
    # silence into an empty track pads from zero (has_new_audio path)
    ae.insert_silence(clip, 0.25, 0.75)
    assert len(clip.read_audio()) == int(0.75 * RATE)


def test_append_and_sync(clip):
    a0 = clip.read_audio()
    # mono at half rate: resampled + channel-matched
    mono = np.ones((RATE // 2, 1), np.float32) * 0.25
    ae.append_audio(clip, mono, RATE // 2)
    a = clip.read_audio()
    assert a.shape[1] == 2
    assert len(a) == pytest.approx(len(a0) + RATE, abs=8)
    assert np.abs(a[len(a0) + 100] - 0.25).max() < 0.01
    ae.adjust_sync(clip, 0.5)                        # delay: silence lead-in
    a2 = clip.read_audio()
    assert len(a2) == len(a) + RATE // 2
    assert np.abs(a2[: RATE // 2]).max() == 0.0
    ae.adjust_sync(clip, -0.5)                       # advance: cut back
    np.testing.assert_allclose(clip.read_audio(), a, atol=2 / 32768)


def test_undo_single_slot(clip):
    a0 = clip.read_audio()
    ae.normalize(clip)
    assert ae.undo_audio(clip)
    np.testing.assert_array_equal(clip.read_audio(), a0)
    assert not ae.undo_audio(clip)                   # slot consumed
    # undo restores the PREVIOUS state only (single level, like the ref)
    ae.fade_in(clip, 1.0)
    ae.voladj(clip, 0.1)
    assert ae.undo_audio(clip)
    a = clip.read_audio()
    assert abs(a[0, 0]) < 1e-6                       # fade_in still applied


def test_osc_audio_routes(tmp_path):
    """The /clip/audio/* routes operate on the frame selection of the
    foreground clip (1-based spans -> seconds at the clip fps)."""
    from lives_tpu.osc.server import OSCServer
    from lives_tpu.player import CollectSink, Player

    c = create_clip(tmp_path, 64, 48, fps=10.0)
    c.frames = 20
    c.write_audio(np.full((2 * RATE, 2), 0.5, np.float32), RATE)
    srv = OSCServer(player=Player(sink=CollectSink()))
    srv.clips[1] = c
    srv.player.state.fg_clip = c
    mm = srv.methods
    mm["/clip/audio/fadein"](1.0)
    assert abs(c.read_audio()[0, 0]) < 1e-6
    g = mm["/clip/audio/normalize"]()
    assert g == pytest.approx(0.95 / 0.5, rel=1e-3)
    # selection frames 5..9 (0-based internal) = 0.5..1.0 s at 10 fps
    srv.player.state.sel_start, srv.player.state.sel_end = 5, 9
    mm["/clip/audio/insert_silence"]()
    a = c.read_audio()
    assert len(a) == int(2.5 * RATE)
    assert np.abs(a[RATE // 2: RATE]).max() == 0.0
    mm["/clip/audio/trim"]()
    assert len(c.read_audio()) == RATE // 2          # exactly the selection
    assert mm["/clip/audio/undo"]() == 1
    assert len(c.read_audio()) == int(2.5 * RATE)
    mm["/clip/audio/delete_all"]()
    assert len(c.read_audio()) == 0
    mm["/clip/audio/sync/adjust"](0.25)
    assert len(c.read_audio()) == RATE // 4          # silent lead-in
