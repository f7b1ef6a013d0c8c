"""Audio engine tests: conversion roundtrips, resample, velocity pull,
mixing, event-list audio render."""

import numpy as np
import pytest

from lives_tpu.audio import (mix_tracks, render_audio, resample,
                             sample_convert, velocity_resample)
from lives_tpu.audio.engine import sample_encode, to_channels


def sine(n=4410, f=440.0, rate=44100, ch=2):
    t = np.arange(n) / rate
    return np.stack([np.sin(2 * np.pi * f * t)] * ch, 1).astype(np.float32)


def test_s16_roundtrip():
    a = sine()
    raw = sample_encode(a, 16)
    b = sample_convert(raw, 16, channels=2)
    assert b.shape == a.shape
    assert np.abs(a - b).max() < 1e-3


def test_s8_unsigned_roundtrip():
    a = sine() * 0.5
    raw = sample_encode(a, 8, signed=False)
    b = sample_convert(raw, 8, signed=False, channels=2)
    assert np.abs(a - b).max() < 1e-1


def test_float32_roundtrip():
    a = sine()
    raw = sample_encode(a, 32)
    b = sample_convert(raw, 32, channels=2)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_resample_lengths():
    a = sine(4410)
    up = resample(a, 44100, 48000)
    assert abs(len(up) - 4800) <= 1
    down = resample(a, 44100, 22050)
    assert abs(len(down) - 2205) <= 1
    # frequency preserved approximately: zero crossings
    zc = lambda x: (np.diff(np.signbit(x[:, 0])) != 0).sum()
    assert abs(zc(up) / (len(up) / 48000) - zc(a) / 0.1 / 441 * 44.1) < 1000


def test_velocity_resample_reverse():
    a = sine(1000, ch=1)
    fwd, pos = velocity_resample(a, 0.0, 1.0, 500)
    np.testing.assert_allclose(fwd[:, 0], a[:500, 0], atol=1e-5)
    assert pos == 500.0
    rev, _ = velocity_resample(a, 999.0, -1.0, 500)
    np.testing.assert_allclose(rev[:, 0], a[999:499:-1, 0], atol=1e-5)


def test_velocity_double_speed():
    a = sine(1000, ch=1)
    fast, _ = velocity_resample(a, 0.0, 2.0, 100)
    np.testing.assert_allclose(fast[:, 0], a[0:200:2, 0], atol=1e-5)


def test_mix_tracks_volumes():
    a = np.full((100, 2), 0.5, np.float32)
    b = np.full((50, 2), 0.5, np.float32)
    m = mix_tracks([a, b], [1.0, 0.5])
    assert m.shape == (100, 2)
    np.testing.assert_allclose(m[:50], 0.75, atol=1e-6)
    np.testing.assert_allclose(m[50:], 0.5, atol=1e-6)


def test_mix_clips_hard():
    a = np.full((10, 1), 0.9, np.float32)
    m = mix_tracks([a, a])
    assert m.max() <= 1.0


def test_to_channels():
    mono = sine(100, ch=1)
    st = to_channels(mono, 2)
    assert st.shape == (100, 2)
    back = to_channels(st, 1)
    np.testing.assert_allclose(back, mono, atol=1e-6)


def test_render_audio_from_event_list(tmp_path):
    from lives_tpu.events import EventList, frame_event, TICKS_PER_SECOND
    from lives_tpu.io import create_clip
    clip = create_clip(tmp_path, 8, 8)
    clip.write_audio(sine(44100), arate=44100)  # 1s tone
    el = EventList(fps=25.0)
    tpf = TICKS_PER_SECOND // 25
    for i in range(50):  # 2s timeline
        el.insert(frame_event(i * tpf, [1], [i]))
    out = render_audio(el, {1: clip}, arate=44100)
    assert len(out) >= 44100 * 2 - 4410
    assert np.abs(out[:44100]).max() > 0.5   # tone present
    assert np.abs(out[44200:]).max() < 1e-6  # silence after clip ends


def test_render_audio_from_seeks_reproduces_scratch():
    """Recorded audio seeks re-render the performance's audio: a reverse
    scratch shows up as time-reversed source audio."""
    import numpy as np
    from lives_tpu.audio.engine import render_audio_from_seeks
    from lives_tpu.events.event_list import (EventList, TICKS_PER_SECOND,
                                             frame_event)

    RATE = 8000

    class Clip:
        arate, achans, frames, fps = RATE, 1, 100, 25.0

        def read_audio(self):
            # a ramp: sample value encodes position
            return np.linspace(0, 1, RATE * 2,
                               dtype=np.float32).reshape(-1, 1)

    el = EventList(fps=25.0)
    # forward 0->0.5s over 0.5s, then REVERSE back to 0.25s over 0.25s
    pts = [(0.0, 0.0), (0.5, 0.5), (0.75, 0.25)]
    for t, seek in pts:
        el.insert(frame_event(int(t * TICKS_PER_SECOND), [7], [0],
                              audio_clips=[7], audio_seeks=[seek]))
    out = render_audio_from_seeks(el, {7: Clip()}, arate=RATE, channels=1)
    # at output t=0.25s the source position is 0.25s -> value ~0.125
    assert abs(out[int(0.25 * RATE), 0] - 0.125) < 0.01
    # during the reverse span the values DECREASE
    seg = out[int(0.55 * RATE): int(0.7 * RATE), 0]
    assert seg[0] > seg[-1]
    # value at 0.6s: source pos = 0.5 - (0.6-0.5)*1.0 = 0.4s -> 0.2
    assert abs(out[int(0.6 * RATE), 0] - 0.2) < 0.02
