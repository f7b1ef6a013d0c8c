"""Audio fx host + realtime feeder + clip editing tests."""

import numpy as np
import pytest

from lives_tpu.audio.fx import (AudioPlayer, NullAudioSink, WavAudioSink,
                                apply_audio_chain, audio_instantiate,
                                list_audio_filters, tone_gen)


def test_registry():
    names = list_audio_filters()
    for n in ("gain", "echo", "lowpass", "compressor"):
        assert n in names


def test_gain():
    blk = np.full((100, 2), 0.5, np.float32)
    g = audio_instantiate("gain", gain=0.5)
    out = apply_audio_chain([g], blk)
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def test_echo_delays():
    rate = 1000
    blk = np.zeros((1000, 1), np.float32)
    blk[0] = 1.0
    e = audio_instantiate("echo", delay=0.1, feedback=0.5, rate=rate)
    out = e.apply(blk)
    assert out[0, 0] == pytest.approx(1.0)
    # second block: the echo of the impulse appears delay*rate in
    out2 = e.apply(np.zeros((1000, 1), np.float32))
    assert out2.max() > 0  # state carried


def test_tone_gen_phase_continuity():
    b1, ph = tone_gen(1000, 440, 44100)
    b2, _ = tone_gen(1000, 440, 44100, phase=ph)
    joined = np.concatenate([b1[:, 0], b2[:, 0]])
    # no discontinuity at the seam
    assert abs(joined[1000] - joined[999]) < 0.07


def test_compressor_limits():
    loud = np.ones((512, 2), np.float32)
    c = audio_instantiate("compressor", threshold=0.5, ratio=100.0)
    out = c.apply(loud)
    assert out.max() < 0.55


class FakeClip:
    frames, fps, width, height, unique_id, achans, arate = \
        100, 25.0, 8, 8, 1, 2, 44100

    def read_audio(self):
        t = np.arange(44100) / 44100
        return np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1).astype(
            np.float32)


def test_audio_player_velocity():
    from lives_tpu.player import CollectSink, Player
    p = Player(sink=CollectSink())
    p.state.fg_clip = FakeClip()
    ap = AudioPlayer(p, NullAudioSink(), rate=44100, block=512)
    ap.load_clip_audio(FakeClip())
    b1 = ap.pull()
    assert b1.shape == (512, 2) and np.abs(b1).max() > 0.1
    # double speed -> audio advances twice as fast
    p.state.pb_fps = 50.0
    pos0 = ap._pos
    ap.pull()
    assert ap._pos - pos0 == pytest.approx(1024, abs=2)


def test_audio_player_thread_runs():
    sink = NullAudioSink()
    ap = AudioPlayer(None, sink, rate=44100, block=441)
    ap._data = FakeClip().read_audio()
    ap.start()
    import time
    time.sleep(0.25)
    ap.stop()
    assert sink.frames > 441


def test_wav_audio_sink(tmp_path):
    sink = WavAudioSink(str(tmp_path / "out.wav"))
    sink.write(np.zeros((100, 2), np.float32), 44100)
    sink.close()
    assert (tmp_path / "out.wav").read_bytes()[:4] == b"RIFF"


# -- clip editing -------------------------------------------------------------

def make_clip(tmp_path, n=10):
    from lives_tpu.io import open_clip
    from lives_tpu.io.decoders import write_y4m
    frames = [(np.full((16, 32), 20 + i * 10, np.uint8),
               np.full((8, 16), 128, np.uint8),
               np.full((8, 16), 128, np.uint8)) for i in range(n)]
    write_y4m(str(tmp_path / "c.y4m"), frames, fps=25.0)
    clip = open_clip(str(tmp_path / "c.y4m"), tmp_path / "work")
    t = np.arange(int(44100 * n / 25.0)) / 44100
    clip.write_audio(np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1)
                     .astype(np.float32), 44100)
    return clip


def luma0(clip, n):
    from lives_tpu.constants import Palette
    from lives_tpu.ops.colorspace import convert_layer
    return int(np.asarray(convert_layer(clip.get_frame(n),
                                        Palette.RGB24).planes[0])[1, 0, 0])


def exp_rgb(i):
    """Expected RGB grey of source frame i (clamped Y=20+10i -> full range)."""
    return int((20 + 10 * i - 16) * 255 / 219)


def test_copy_cut_paste(tmp_path):
    from lives_tpu.clipedit import copy_frames, cut_frames, paste_insert
    clip = make_clip(tmp_path)
    cb = copy_frames(clip, 2, 5)
    assert len(cb) == 3 and cb.audio is not None
    cut = cut_frames(clip, 0, 2)
    assert clip.frames == 8
    # old frame 2 is now frame 0
    assert abs(luma0(clip, 0) - exp_rgb(2)) <= 2
    paste_insert(clip, 0, cut)
    assert clip.frames == 10
    assert abs(luma0(clip, 0) - exp_rgb(0)) <= 2  # original first frame restored
    a = clip.read_audio()
    assert abs(len(a) - int(44100 * 10 / 25)) < 4410


def test_trim(tmp_path):
    from lives_tpu.clipedit import trim_clip
    clip = make_clip(tmp_path)
    trim_clip(clip, 3, 7)
    assert clip.frames == 4
    assert abs(luma0(clip, 0) - exp_rgb(3)) <= 2


def test_delete_with_images(tmp_path):
    from lives_tpu.clipedit import delete_frames
    clip = make_clip(tmp_path)
    clip.realize(0, 4)  # materialise first 4 as images
    delete_frames(clip, 1, 3)
    assert clip.frames == 8
    assert abs(luma0(clip, 0) - exp_rgb(0)) <= 2
    assert abs(luma0(clip, 1) - exp_rgb(3)) <= 2  # old frame 3


def test_record_autosave(tmp_path):
    from lives_tpu.player import CollectSink, Player

    class MemClip:
        frames, fps, width, height, unique_id = 10, 25.0, 32, 16, 1

        def get_frame(self, n):
            import jax.numpy as jnp
            from lives_tpu.layer import Layer
            from lives_tpu.constants import Palette
            return Layer(planes=(jnp.zeros((3, 16, 32), jnp.uint8),),
                         palette=int(Palette.RGB24))

    p = Player(sink=CollectSink())
    p.state.fg_clip = MemClip()
    backup = tmp_path / "rec_backup.json"
    p.record_start(32, 16, backup_path=str(backup), backup_every=0.0)
    p.start()
    p.process_one()
    p.state.frame = -1
    import time
    p._clock0 = time.monotonic()
    p._frame0 = 3.0
    p.process_one()
    # the snapshot write runs on a worker thread (it must never stall
    # the serving loop): poll briefly
    deadline = time.monotonic() + 3.0
    while time.monotonic() < deadline and not backup.exists():
        time.sleep(0.02)
    assert backup.exists()
    from lives_tpu.events import EventList
    el = EventList.from_autosave(backup.read_text())
    assert len(el.frame_events()) >= 1


def test_player_audio_integration(tmp_path):
    """Video player + attached audio feeder + OSC volume control."""
    import time
    from lives_tpu.audio.fx import NullAudioSink
    from lives_tpu.osc import build_message
    from lives_tpu.osc.server import OSCServer
    from lives_tpu.player import CollectSink, Player
    from tests.test_audio_fx import make_clip  # self-import for fixture

    clip = make_clip(tmp_path)
    p = Player(sink=CollectSink())
    p.state.fg_clip = clip
    sink = NullAudioSink()
    p.attach_audio(sink)
    srv = OSCServer(p, port=0)
    srv.start()
    import socket
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    p.start()
    time.sleep(0.3)
    assert sink.frames > 0  # audio flowing
    tx.sendto(build_message("/audio/volume/set", 0.25),
              ("127.0.0.1", srv.port))
    tx.sendto(build_message("/audio/mute/set", 1), ("127.0.0.1", srv.port))
    deadline = time.time() + 2
    while time.time() < deadline and not p.audio.muted:
        time.sleep(0.02)
    assert p.audio.muted and p.audio.volume == 0.25
    p.stop()
    srv.stop()
    assert not p.audio._running


def test_av_sync_bounded_over_scratch_playback():
    """A/V sync closure (reference video_sync_ready, player.c:120):
    60 simulated seconds of scratch playback — random fps changes incl.
    reverse — keeps |audio - video| bounded and hard-resyncs on loop
    wraps."""
    import numpy as np
    from lives_tpu.audio.fx import AudioPlayer, NullAudioSink

    RATE, FPS, SECS = 44100, 25.0, 30.0

    class Clip:
        frames, fps = int(SECS * FPS * 2), FPS
        arate, achans = RATE, 2

        def read_audio(self):
            t = np.arange(int(SECS * 2 * RATE))
            x = np.sin(2 * np.pi * 220 * t / RATE).astype(np.float32) * 0.5
            return np.stack([x, x], -1)

    class P:
        pass

    player = P()

    class State:
        pass

    st = State()
    st.fg_clip = Clip()
    st.pb_fps = FPS
    st.frame = 0
    player.state = st

    ap = AudioPlayer(player, NullAudioSink(), rate=RATE, block=1024)
    ap.load_clip_audio(st.fg_clip)

    rng = np.random.default_rng(11)
    dt = ap.block / RATE
    vfrac = 0.0
    deltas = []
    n_steps = int(60.0 / dt)  # 60 s of wall time
    for i in range(n_steps):
        if i % 100 == 50:  # scratch: change speed/direction
            st.pb_fps = float(rng.choice([-50, -25, 12.5, 25, 50, 75]))
        # advance the video clock like the player does
        vfrac += st.pb_fps * dt
        st.frame = int(vfrac) % st.fg_clip.frames
        ap.pull()
        d = ap.sync_delta()
        if i > 20 and d is not None:
            deltas.append(abs(d))
    deltas = np.asarray(deltas)
    # bounded drift: correction keeps p95 within tolerance + one block
    assert np.percentile(deltas, 95) < ap.sync_tolerance + 0.05, \
        np.percentile(deltas, 95)
    assert deltas[-50:].max() < 0.2
    assert ap.sync_corrections > 0  # the soft loop actually engaged


def test_audio_master_time_source():
    """time_source='audio': the video target frame derives from the audio
    feeder's clip position (reference soundcard time source)."""
    import numpy as np
    from lives_tpu.audio.fx import AudioPlayer, NullAudioSink
    from lives_tpu.player import CollectSink, Player

    RATE, FPS = 44100, 25.0

    class Clip:
        frames, fps, width, height = 250, FPS, 32, 24
        arate, achans, unique_id = RATE, 2, 1

        def read_audio(self):
            return np.zeros((RATE * 10, 2), np.float32)

        def get_frame(self, n):
            import jax.numpy as jnp
            from lives_tpu.constants import Palette
            from lives_tpu.layer import Layer
            return Layer(planes=(jnp.full((3, 24, 32), n % 251,
                                          jnp.uint8),),
                         palette=int(Palette.RGB24))

    p = Player(sink=CollectSink())
    p.state.fg_clip = Clip()
    ap = AudioPlayer(p, NullAudioSink(), rate=RATE, block=1024)
    ap.load_clip_audio(p.state.fg_clip)
    p.audio = ap
    p.time_source = "audio"
    p.state.playing = True
    # advance audio by exactly 2 s of clip time
    for _ in range(int(2.0 * RATE / 1024)):
        ap.pull()
    target = p._target_frame_f()
    assert abs(target - 2.0 * FPS) < 2.0  # ~frame 50
    p.process_one()
    assert abs(p.state.frame - 50) <= 2


def test_seek_render_clip_switch_no_chirp():
    """Review finding: a clip switch between FRAME events must not sweep
    the old clip's audio (cross-clip seek interpolation)."""
    from lives_tpu.audio.engine import render_audio_from_seeks
    from lives_tpu.events import (EventList, TICKS_PER_SECOND, frame_event)

    class C:
        def __init__(self, uid, val):
            self.unique_id, self._v, self.arate, self.achans = uid, val, 8000, 1
        def read_audio(self):
            return np.full((8000, 1), self._v, np.float32)

    a, b = C(1, 0.25), C(2, -0.25)
    el = EventList(fps=25.0, width=8, height=8)
    TPF = int(TICKS_PER_SECOND / 25.0)
    # clip 1 playing near its END, then switch to clip 2 at its start
    el.insert(frame_event(0, [1], [0], audio_clips=[1], audio_seeks=[0.9]))
    el.insert(frame_event(TPF, [1], [1], audio_clips=[1],
                          audio_seeks=[0.94]))
    el.insert(frame_event(2 * TPF, [2], [0], audio_clips=[2],
                          audio_seeks=[0.0]))
    el.insert(frame_event(3 * TPF, [2], [1], audio_clips=[2],
                          audio_seeks=[0.04]))
    out = render_audio_from_seeks(el, {1: a, 2: b}, arate=8000, channels=1)
    # the switch interval must be clip 1 audio at normal velocity (constant
    # 0.25), NOT a backwards sweep; after the switch, clip 2's value
    assert abs(out[int(1.5 * 8000 / 25), 0] - 0.25) < 1e-3
    assert abs(out[int(2.5 * 8000 / 25), 0] + 0.25) < 1e-3
    # audio extends to the buffer end (duration_ticks), not cut at the
    # second-to-last event
    assert abs(out[-2, 0] + 0.25) < 1e-3


def test_echo_survives_channel_change():
    from lives_tpu.audio.fx import audio_instantiate
    inst = audio_instantiate("echo", delay=0.01, rate=8000)
    inst.apply(np.zeros((64, 2), np.float32))
    out = inst.apply(np.zeros((64, 1), np.float32))  # mono follows stereo
    assert out.shape == (64, 1)


def test_audio_player_double_start_and_rate_injection():
    from lives_tpu.audio.fx import (AudioPlayer, NullAudioSink,
                                    audio_instantiate)

    class _P:
        state = type("S", (), {"pb_fps": 25.0, "fg_clip": None,
                               "frame": 0})()
        time_source = "system"

    ap = AudioPlayer(_P, NullAudioSink(), rate=48000, block=480)
    ap.chain.append(audio_instantiate("echo", delay=0.01))
    ap.start()
    t1 = ap._thread
    ap.start()               # no duplicate feeder
    assert ap._thread is t1
    assert ap.chain[0].values["rate"] == 48000  # stream rate injected
    ap.stop()


# -- round 3: widened fx surface + PulseAudio sink --------------------------

def _blk(n=4096, ch=2, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((n, ch)).astype(np.float32) - 0.5)


def test_highpass_removes_dc():
    from lives_tpu.audio.fx import audio_instantiate, apply_audio_chain
    inst = audio_instantiate("highpass", cutoff=0.05)
    blk = _blk() + 0.5          # DC offset
    out = blk
    for _ in range(6):
        out = apply_audio_chain([inst], out)
    assert abs(float(out[-1024:].mean())) < 0.05


def test_eq3_band_gains():
    from lives_tpu.audio.fx import audio_instantiate, apply_audio_chain
    # silence the high band of white noise: output power drops
    inst = audio_instantiate("eq3", low=1.0, mid=1.0, high=0.0)
    blk = _blk()
    out = apply_audio_chain([inst], blk)
    assert float(np.abs(out).mean()) < float(np.abs(blk).mean())
    # unity gains pass through (steady state)
    flat = audio_instantiate("eq3")
    out2 = apply_audio_chain([flat], blk)
    assert np.abs(out2[256:] - blk[256:]).max() < 0.02


def test_reverb_tail_and_wet():
    from lives_tpu.audio.fx import audio_instantiate, apply_audio_chain
    inst = audio_instantiate("reverb", room=0.8, wet=1.0)
    impulse = np.zeros((8192, 2), np.float32)
    impulse[0] = 1.0
    out = apply_audio_chain([inst], impulse)
    # energy arrives later than the dry impulse (comb delays ~30-44 ms)
    assert np.abs(out[1200:]).max() > 0.1
    silence = np.zeros((8192, 2), np.float32)
    tail = apply_audio_chain([inst], silence)
    assert np.abs(tail).max() > 0.01      # state carries the tail


def test_chorus_modulates():
    from lives_tpu.audio.fx import audio_instantiate, apply_audio_chain
    inst = audio_instantiate("chorus", mix=1.0)
    t = np.arange(8192) / 44100.0
    tone = np.repeat(np.sin(2 * np.pi * 440 * t)[:, None], 2, 1
                     ).astype(np.float32)
    out = apply_audio_chain([inst], tone)
    assert out.shape == tone.shape
    assert not np.allclose(out[4096:], tone[4096:] * 1.4, atol=0.2)


def test_noise_gate():
    from lives_tpu.audio.fx import audio_instantiate, apply_audio_chain
    inst = audio_instantiate("noise_gate", threshold=0.1)
    quiet = np.full((1024, 2), 0.01, np.float32)
    loud = np.full((1024, 2), 0.5, np.float32)
    assert np.abs(apply_audio_chain([inst], quiet)).max() == 0.0
    inst2 = audio_instantiate("noise_gate", threshold=0.1)
    assert np.abs(apply_audio_chain([inst2], loud)).max() > 0.4


def test_pulse_sink_mock():
    import ctypes
    from lives_tpu.audio.fx import PulseAudioSink

    class MockPulse:
        def __init__(self):
            self.written = b""

        def pa_simple_new(self, *a):
            return 0xBEEF

        def pa_simple_write(self, s, data, nbytes, err):
            self.written += ctypes.string_at(data, nbytes)
            return 0

        def pa_simple_drain(self, s, err):
            return 0

        def pa_simple_free(self, s):
            self.freed = True

    mock = MockPulse()
    s = PulseAudioSink(lib=mock)
    s.write(np.full((100, 2), 0.5, np.float32), 44100)
    assert len(mock.written) == 100 * 2 * 2
    vals = np.frombuffer(mock.written, "<i2")
    assert abs(int(vals[0]) - 16383) <= 1
    s.close()
    assert getattr(mock, "freed", False)


def test_sync_survives_jittered_and_late_callbacks():
    """Drift corrector vs a misbehaving CALLBACK clock (reference
    pulse.c pull model under soundcard jitter/xruns): mildly jittered
    callback periods are absorbed by the soft velocity stretch (no hard
    resyncs); an xrun-sized stall hard-resyncs once and recovers within
    a few blocks."""
    from lives_tpu.audio.fx import AudioPlayer, NullAudioSink

    RATE, FPS = 44100, 25.0

    class Clip:
        frames, fps = int(120 * FPS), FPS
        arate, achans = RATE, 2

        def read_audio(self):
            t = np.arange(int(120 * RATE))
            x = np.sin(2 * np.pi * 220 * t / RATE).astype(np.float32) * .5
            return np.stack([x, x], -1)

    class P:
        pass

    player = P()

    class State:
        pass

    st = State()
    st.fg_clip = Clip()
    st.pb_fps = FPS
    st.frame = 0
    player.state = st

    ap = AudioPlayer(player, NullAudioSink(), rate=RATE, block=1024)
    ap.load_clip_audio(st.fg_clip)
    nominal = ap.block / RATE
    rng = np.random.default_rng(7)

    vtime = 0.0

    def callback(period):
        """One audio callback arriving `period` seconds after the last:
        the video clock advanced that much; the sink pulls one block."""
        nonlocal vtime
        vtime += period * FPS / FPS  # wall time == clip time at 1x
        st.frame = int(vtime * FPS) % st.fg_clip.frames
        ap.pull()
        return ap.sync_delta()

    # phase 1: +-30% period jitter for 20 s — soft loop only
    deltas = []
    for i in range(int(20.0 / nominal)):
        d = callback(nominal * rng.uniform(0.7, 1.3))
        if i > 20:
            deltas.append(abs(d))
    assert ap.sync_resyncs == 0, "jitter must not trigger hard resyncs"
    assert ap.sync_corrections > 0
    assert np.percentile(deltas, 95) < ap.sync_tolerance + 2 * nominal

    # phase 2: an xrun — the callback stalls for 0.5 s
    before = ap.sync_resyncs
    callback(0.5)
    recovered = [abs(callback(nominal)) for _ in range(6)]
    assert ap.sync_resyncs >= before + 1, "xrun gap must hard-resync"
    assert min(recovered) < ap.sync_deadband + 2 * nominal
    assert recovered[-1] < ap.sync_tolerance

    # phase 3: consumer runs 10% slow for 10 s (late every callback) —
    # drift stays bounded (soft stretch + occasional resync, no runaway)
    tail = []
    for i in range(int(10.0 / nominal)):
        tail.append(abs(callback(nominal * 1.1)))
    assert np.asarray(tail).max() < ap.sync_tolerance + 0.1
    assert tail[-1] < ap.sync_tolerance + 2 * nominal


def test_edit_undo_restores_and_redoes(tmp_path):
    """Frame-edit undo (reference per-clip undo for insert/delete): a
    delete restores exactly; a second undo redoes (swap buffer)."""
    from lives_tpu.clipedit import delete_frames, undo_edit
    clip = make_clip(tmp_path)
    clip.realize(0, 3)                    # mix of images and virtual
    before = [luma0(clip, i) for i in range(10)]
    delete_frames(clip, 2, 6)
    assert clip.frames == 6
    assert undo_edit(clip)
    assert clip.frames == 10
    assert [luma0(clip, i) for i in range(10)] == before
    a = clip.read_audio()
    assert abs(len(a) - int(44100 * 10 / 25)) < 4410
    assert undo_edit(clip)                # redo: the delete re-applies
    assert clip.frames == 6
    assert undo_edit(clip)                # undo again
    assert clip.frames == 10


def test_edit_undo_after_paste_and_trim(tmp_path):
    from lives_tpu.clipedit import (copy_frames, paste_insert, trim_clip,
                                    undo_edit)
    clip = make_clip(tmp_path)
    cb = copy_frames(clip, 0, 3)
    paste_insert(clip, 5, cb)
    assert clip.frames == 13
    assert undo_edit(clip)
    assert clip.frames == 10
    trim_clip(clip, 2, 8)                 # one undo step for both ends
    assert clip.frames == 6
    assert abs(luma0(clip, 0) - exp_rgb(2)) <= 2
    assert undo_edit(clip)
    assert clip.frames == 10
    assert abs(luma0(clip, 0) - exp_rgb(0)) <= 2


def test_merge_clipboard_undoes(tmp_path):
    from lives_tpu.clipedit import copy_frames, merge_clipboard, undo_edit
    clip = make_clip(tmp_path)
    cb = copy_frames(clip, 0, 4)
    before = [luma0(clip, i) for i in range(10)]
    done = merge_clipboard(clip, cb, "crossfade", start=4, end=8,
                           ramp=(1.0, 1.0))   # fully the clipboard
    assert done == 4
    assert abs(luma0(clip, 4) - exp_rgb(0)) <= 3   # clipboard frame 0
    assert undo_edit(clip)
    assert [luma0(clip, i) for i in range(10)] == before
