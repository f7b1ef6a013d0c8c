"""Player tests: clock/frame targeting, trickplay, rte keys, fg/bg blend,
recording -> batch re-render equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.player import CollectSink, Player
from lives_tpu.graph import SinkSpec


class MemClip:
    """In-memory clip: deterministic frames."""

    def __init__(self, n=20, h=24, w=48, uid=1):
        self.frames = n
        self.fps = 25.0
        self.width, self.height = w, h
        self.unique_id = uid

    def frame_array(self, n):
        rng = np.random.default_rng(self.unique_id * 7919 + n)
        return rng.integers(0, 256, (3, self.height, self.width), np.uint8)

    def get_frame(self, n):
        return Layer(planes=(jnp.asarray(self.frame_array(n)),),
                     palette=int(Palette.RGB24))


def make_player(**kw):
    sink = CollectSink()
    p = Player(sink=sink, sink_spec=SinkSpec(), **kw)
    p.state.fg_clip = MemClip()
    return p, sink


def test_basic_playback_frames_advance():
    p, sink = make_player()
    p.start()
    # force deterministic targeting: directly step frames
    for i in range(5):
        p._clock0 = None  # use state.frame
        p.state.frame = -1  # force change detection
        p._frame0 = float(i)
        p.state.frame = i - 1 if i else 19
        p._clock0 = None
        p.state.playing = True
        p.state.frame = i - 1 if i > 0 else 5  # any != target
        p._target = i

    # simpler: drive process_one with manual targets via clamp
    assert p.clamp_frame(25.0) == 5  # loops over 20 frames


def test_clamp_modes():
    p, _ = make_player()
    p.state.loop = True
    assert p.clamp_frame(22) == 2
    p.state.ping_pong = True
    assert p.clamp_frame(21) == 18  # bounce back
    p.state.ping_pong = False
    p.state.loop = False
    assert p.clamp_frame(50) == 19
    p.state.sel_start, p.state.sel_end = 5, 9
    p.state.loop = True
    assert p.clamp_frame(10) == 5


def test_process_one_renders_to_sink():
    p, sink = make_player()
    p.start()
    assert p.process_one()
    assert len(sink.frames) == 1
    assert sink.frames[0].shape == (3, 24, 48)


def test_rte_key_chain():
    p, sink = make_player()
    p.async_compile = False  # pin the synchronous toggle path
    p.keymap.set_key(0, 0, "negate")
    p.start()
    p.process_one()
    clean = sink.frames[-1]
    p.key_toggle(0, True)
    p.state.frame = -1  # force redraw of same target
    p._clock0 = None
    p._frame0 = 0.0
    p._clock0 = __import__("time").monotonic()
    p.process_one()
    fx = sink.frames[-1]
    np.testing.assert_array_equal(fx, 255 - clean)
    # key mode cycling
    p.keymap.set_key(0, 1, "greyscale")
    p.keymap.next_mode(0)
    assert p.keymap.current_filter(0) == "greyscale"


def test_fg_bg_blend():
    p, sink = make_player()
    p.state.bg_clip = MemClip(uid=2)
    p.state.blend_amount = 0.0  # all bg
    p.start()
    p.process_one()
    bg0 = p.state.bg_clip.frame_array(p.state.frame)
    np.testing.assert_array_equal(sink.frames[-1], bg0)


def test_recording_produces_event_list():
    p, sink = make_player()
    p.keymap.set_key(0, 0, "negate")
    p.record_start(width=48, height=24)
    p.start()
    p.process_one()
    p.key_toggle(0, True)
    p.state.frame = -1
    p._clock0 = __import__("time").monotonic()
    p._frame0 = 3.0
    p.process_one()
    p.key_toggle(0, False)
    el = p.record_stop()
    types = [e.type.name for e in el.events]
    assert "FRAME" in types and "FILTER_INIT" in types \
        and "FILTER_DEINIT" in types
    s = el.to_json()
    from lives_tpu.events import EventList
    assert len(EventList.from_json(s)) == len(el)


def test_trickplay_reverse():
    p, _ = make_player()
    p.set_pb_fps(-25.0)
    assert p.state.pb_fps == -25.0
    assert p.clamp_frame(-3.0) == 17  # wraps backwards


def test_stats():
    p, sink = make_player()
    p.start()
    p.process_one()
    st = p.stats()
    assert st["frames_shown"] == 1
    assert st["inst_fps"] > 0


def test_precache_prefetches_frames():
    p, sink = make_player()
    p.precache_depth = 3
    p.start()
    p.process_one()
    import time
    deadline = time.time() + 3
    while time.time() < deadline and len(p._precache) < 3:
        time.sleep(0.02)
    assert len(p._precache) >= 3
    # next cycle consumes from the cache
    key = p._ck(p.state.fg_clip, p.clamp_frame(p.state.frame + 1))
    assert key in p._precache


def test_async_compile_serves_old_graph_then_swaps():
    import time
    p, sink = make_player()
    p.async_compile = True
    p.keymap.set_key(0, 0, "negate")
    p.start()
    p.process_one()  # establishes the empty-chain graph
    base = sink.frames[-1]
    p.key_toggle(0, True)
    # immediately after toggle the old (identity) graph may still serve
    p.state.frame = -1
    p._clock0 = time.monotonic()
    p._frame0 = 0.0
    p.process_one()
    # wait for the background compile to finish, then the new chain applies
    deadline = time.time() + 30
    while time.time() < deadline and p._served_key != p._chain_cache_key():
        time.sleep(0.05)
    assert p._served_key == p._chain_cache_key()
    p.state.frame = -1
    p._clock0 = time.monotonic()
    p._frame0 = 0.0
    p.process_one()
    import numpy as _np
    _np.testing.assert_array_equal(sink.frames[-1], 255 - base)


def test_toggle_never_blocks_serving_loop():
    """VERDICT r3 item 3: a key toggle must not stall process_one — the
    frame after the toggle serves the OLD (warm) graph while the new
    template compiles off-thread, and the in-flight compile's key is
    tracked so a prewarm gets upgraded rather than recompiled."""
    import time
    p, sink = make_player()
    assert p.async_compile  # the mitigation is the default now
    p.keymap.set_key(0, 0, "negate")
    p.start()
    p.process_one()
    base = sink.frames[-1]
    served_before = p._served_key
    p.key_toggle(0, True)
    p.state.frame = -1
    p._clock0 = time.monotonic()
    p._frame0 = 0.0
    t0 = time.monotonic()
    p.process_one()
    dt = time.monotonic() - t0
    # the serving path never pays a template compile: either the OLD
    # graph still serves (identical output, compile in flight) or the
    # prewarmed template already adopted (persistent XLA cache makes
    # that near-instant) and the NEW chain serves — both are correct;
    # blocking the loop is not
    if p._served_key == served_before:
        np.testing.assert_array_equal(sink.frames[-1], base)
    else:
        np.testing.assert_array_equal(sink.frames[-1], 255 - base)
    assert dt < 0.5, f"toggle blocked the serving loop for {dt:.2f}s"
    # compile-in-flight bookkeeping: desired chain is compiling, adopted
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline \
            and p._served_key != p._chain_cache_key():
        time.sleep(0.05)
    assert p._served_key == p._chain_cache_key()


def test_prewarm_precompiles_one_toggle_away():
    """Safe-point prewarm (player.c:2655 nodemodel pre-build): after a
    few idle frames the mapped-but-inactive key's chain template is
    already compiled, so the actual toggle swaps instantly."""
    import time
    p, sink = make_player()
    p.keymap.set_key(0, 0, "negate")
    p.start()
    p.process_one()  # safe point triggers the prewarm compile
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and len(p._graphs) < 2:
        p.process_one()
        time.sleep(0.02)
    assert len(p._graphs) >= 2  # empty chain + prewarmed negate chain
    base = sink.frames[-1]
    p.key_toggle(0, True)
    p.state.frame = -1
    p._clock0 = time.monotonic()
    p._frame0 = 0.0
    p.process_one()
    # prewarmed template: the effect applies on the very next frame
    np.testing.assert_array_equal(sink.frames[-1], 255 - base)


def test_l2l_two_player_pipeline(rng):
    """LiVES-to-LiVES: player A streams to player B's source."""
    import time
    from lives_tpu.stream import StreamReceiver, StreamSender

    rx = StreamReceiver(port=0)
    a, _ = make_player()
    a.sink = StreamSender("127.0.0.1", rx.port)
    a.start()
    a.process_one()
    deadline = time.time() + 3
    while time.time() < deadline and rx._latest is None:
        a.state.frame = -1
        a._clock0 = __import__("time").monotonic()
        a.process_one()
        time.sleep(0.05)
    assert rx._latest is not None

    b = Player(sink=CollectSink())
    b.state.fg_clip = rx  # receiver is clip-like
    b.start()
    assert b.process_one()
    assert b.sink.frames[0].shape[0] == 3
    rx.close()


def test_render_recording_bridge():
    from lives_tpu.events.renderer import render_recording
    from lives_tpu.graph import SinkSpec
    p, sink = make_player()
    clip = p.state.fg_clip
    p.record_start(clip.width, clip.height)
    p.start()
    p.process_one()
    import time
    p.state.frame = -1
    p._clock0 = time.monotonic()
    p._frame0 = 2.0
    p.process_one()
    el = p.record_stop()
    frames, tcs = render_recording(
        el, {clip.unique_id: clip},
        SinkSpec(width=clip.width, height=clip.height), fps=25.0,
        batch_size=8)
    assert frames.shape[1:] == (3, clip.height, clip.width)
    assert len(frames) >= 1


def test_frame_drop_accounting():
    import time
    p, sink = make_player()
    p.start()
    p.process_one()
    # clock jumps 5 frames ahead -> 4 dropped
    p._clock0 = time.monotonic()
    p._frame0 = float(p.state.frame + 5)
    p.process_one()
    assert p.frames_dropped >= 4


def test_bg_clip_select_after_cache_reblends():
    """Regression (ADVICE r1 high): graph cache key must include bg-clip
    presence — selecting a bg clip after the chain's graph was cached must
    apply the crossfade, and clearing it must not serve the cached
    crossfade graph (which indexes a missing track 1)."""
    p, sink = make_player()
    p.start()

    def step():
        import time as _t
        p.state.frame = -1
        p._clock0 = _t.monotonic()
        p._frame0 = float((p.frames_shown + 1) % 5)
        p.process_one()
        return np.asarray(sink.frames[-1])

    pure_fg = step()                       # caches the no-bg graph
    p.state.bg_clip = MemClip(uid=2)
    p.state.blend_amount = 0.0             # full bg
    blended = step()
    assert not np.array_equal(blended, pure_fg)  # bg actually shows
    # live blend factor follows state without rebuilding
    p.state.blend_amount = 1.0             # full fg
    refg = step()
    fg_expected = np.asarray(
        p.state.fg_clip.get_frame(p.state.frame).planes[0])
    assert np.max(np.abs(refg.astype(int)
                         - fg_expected.astype(int))) <= 1
    # clearing bg goes back to the 1-track graph without error
    p.state.bg_clip = None
    out = step()
    assert out.shape == pure_fg.shape


def test_per_key_fx_defaults_persist(tmp_path):
    """fxdefs.perkey analogue: per-(key,mode) param defaults apply on
    instantiation and survive keymap save/load."""
    p, sink = make_player()
    p.keymap.set_key(2, 0, "brightness_contrast")
    p.keymap.set_key_defaults(2, 0, brightness=0.4, contrast=2.0)
    p.key_toggle(2, True)
    inst = p.keymap.instances[2]
    assert inst.values["brightness"] == 0.4
    assert inst.values["contrast"] == 2.0
    path = tmp_path / "map.json"
    p.keymap.save(path)
    q, _ = make_player()
    q.keymap.load(path)
    q.key_toggle(2, True)
    assert q.keymap.instances[2].values["brightness"] == 0.4


def test_player_subtitle_overlay(tmp_path):
    """Subtitles composite during playback at the right times."""
    import time
    srt = tmp_path / "subs.srt"
    srt.write_text("1\n00:00:00,000 --> 00:00:00,200\nHELLO\n\n"
                   "2\n00:00:02,000 --> 00:00:03,000\nWORLD\n")
    p, sink = make_player()
    p.load_subtitles(srt, size=12)
    p.start()

    def show(frame):
        p.state.frame = -1
        p._clock0 = time.monotonic()
        p._frame0 = float(frame)
        p.process_one()
        return np.asarray(sink.frames[-1])

    with_sub = show(2)     # t=0.08s -> HELLO visible
    no_sub = show(10)      # t=0.4s -> between subtitles
    base = np.asarray(p.state.fg_clip.get_frame(2).planes[0])
    assert not np.array_equal(with_sub, base)     # text burned in
    base10 = np.asarray(p.state.fg_clip.get_frame(10).planes[0])
    assert np.array_equal(no_sub, base10)         # untouched between subs
    p.stop()


def test_record_start_snapshots_active_chain():
    """Review finding: effects live at record start must appear in the
    re-rendered event list."""
    from lives_tpu.events.event_list import EventType
    p, _ = make_player()
    p.keymap.set_key(0, 0, "negate")
    p.key_toggle(0, True)
    p.record_start(width=32, height=16)
    el = p.event_list
    inits = [e for e in el.events if e.type == EventType.FILTER_INIT]
    assert len(inits) == 1 and inits[0].props["filter"] == "negate"
    p.record_stop()


def test_idempotent_toggle_records_once():
    from lives_tpu.events.event_list import EventType
    p, _ = make_player()
    p.keymap.set_key(0, 0, "negate")
    p.record_start(width=32, height=16)
    p.key_toggle(0, True)
    p.key_toggle(0, True)   # idempotent: no duplicate init
    p.key_toggle(0, True)
    el = p.event_list
    inits = [e for e in el.events if e.type == EventType.FILTER_INIT]
    assert len(inits) == 1
    p.record_stop()


def test_chain_key_matches_active_chain():
    """Review finding: a key left active with no materialised instance
    (mode change) must not appear in the cache key."""
    p, _ = make_player()
    p.keymap.set_key(0, 0, "negate")
    p.keymap.set_key(0, 1, "sepia")
    p.key_toggle(0, True)
    k1 = p.keymap.chain_key()
    assert len(k1) == 1
    p.keymap.next_mode(0)          # instance dropped, key still active
    assert p.keymap.active_chain() == []
    assert p.keymap.chain_key() == ()  # agrees with active_chain
    p.key_toggle(0, False)
    p.key_toggle(0, True)          # new instance (sepia)
    k2 = p.keymap.chain_key()
    assert len(k2) == 1 and k2 != k1


def test_list_filters_has_no_sentinel():
    from lives_tpu.effects.host import get_filter, list_filters
    for n in list_filters():
        assert not n.startswith("_")
        assert hasattr(get_filter(n), "process")


def test_nervous_mode_records_deterministically():
    """Nervous trickplay (player.c:1013): random-walk frame jitter around
    the playhead; the jittered frames are what's shown AND recorded, so a
    recorded nervous session re-renders exactly."""
    import time as _t
    from lives_tpu.events.event_list import EventType
    p, sink = make_player()
    p._nervous_rng = np.random.default_rng(123)
    p.state.nervous = True
    p.record_start(width=48, height=24)
    p.start()
    shown = []
    for k in range(8):
        p.state.frame = -1            # force a re-show each cycle
        p._clock0 = _t.monotonic()
        p._frame0 = float(k)
        p.process_one()
        shown.append(p.state.frame)
    el = p.record_stop()
    p.stop()
    rec = [e.frames[0] for e in el.events if e.type == EventType.FRAME]
    # the recorded frames are the jittered ones actually shown
    assert rec == [f for f in shown]
    # jitter really happened (a clock-only session would be 0..7)
    assert rec != sorted(set(rec)) or any(f > 7 for f in rec) \
        or len(set(rec)) < len(rec) or rec != list(range(8))


def test_nervous_respects_can_reverse():
    p, _ = make_player()
    p.state.fg_clip.can_reverse = False
    p._nervous_rng = np.random.default_rng(1)
    p.state.nervous = True
    p.start()
    import time as _t
    p.state.frame = -1
    p._clock0 = _t.monotonic()
    p._frame0 = 5.0
    p.process_one()
    assert p.state.frame == 5     # jitter suppressed


def test_autotransition_on_clip_switch():
    """Autotransition (player.c:1001 set_trans_amt / prefs autotrans):
    switching fg during playback rides a crossfade — old clip lands on
    the bg track, the transition key engages, blend ramps 1->0, then the
    bg track and key release."""
    import time as _t
    p, sink = make_player()
    old = p.state.fg_clip
    new = MemClip(uid=2)
    p.keymap.set_key(3, 0, "crossfade")
    p.set_autotrans(3, duration=0.2)
    p.start()
    p.process_one()
    p.switch_fg(new)
    assert p.state.fg_clip is new and p.state.bg_clip is old
    assert p.keymap.active[3]
    assert p.state.blend_amount == 0.0   # crossfade amount weights FG
    p.state.frame = -1
    p._clock0 = _t.monotonic()
    p.process_one()
    assert 0.0 <= p.state.blend_amount < 1.0
    _t.sleep(0.25)
    p.state.frame = -1
    p._clock0 = _t.monotonic()
    p.process_one()
    assert p.state.bg_clip is None          # released
    assert not p.keymap.active[3]
    p.stop()


def test_switch_fg_hard_cut_without_autotrans():
    p, _ = make_player()
    new = MemClip(uid=3)
    p.start()
    p.switch_fg(new)
    assert p.state.fg_clip is new and p.state.bg_clip is None
    p.stop()


def test_recording_captures_bg_blend():
    """The fg/bg auto-mix is recorded (crossfade init + amount pchain)
    so blend scratching re-renders; removing the bg records the deinit."""
    import time as _t
    from lives_tpu.events.event_list import EventType
    p, _ = make_player()
    p.state.bg_clip = MemClip(uid=2)
    p.record_start(width=48, height=24)
    p.start()

    def step(i, blend):
        p.state.blend_amount = blend
        p.state.frame = -1
        p._clock0 = _t.monotonic()
        p._frame0 = float(i)
        p.process_one()
    step(0, 0.2)
    step(1, 0.2)      # unchanged: no extra pchain point
    step(2, 0.9)
    p.state.bg_clip = None
    step(3, 0.9)
    el = p.record_stop()
    p.stop()
    inits = [e for e in el.events if e.type == EventType.FILTER_INIT
             and e.props["filter"] == "crossfade"]
    assert len(inits) == 1
    assert inits[0].props["in_tracks"] == [0, 1]
    assert inits[0].props["values"]["amount"] == pytest.approx(0.2)
    pcs = [e for e in el.events if e.type == EventType.PARAM_CHANGE
           and e.props["init_event"] == inits[0].event_id]
    assert len(pcs) == 1 and pcs[0].props["value"] == pytest.approx(0.9)
    deinits = [e for e in el.events if e.type == EventType.FILTER_DEINIT
               and e.props["init_event"] == inits[0].event_id]
    assert len(deinits) == 1
    # the blend survives a re-render (amount weights the FG input:
    # 0.2 -> 0.2 fg + 0.8 bg)
    from lives_tpu.events.renderer import render_recording
    clips = {1: p.state.fg_clip, 2: MemClip(uid=2)}
    frames, _tcs = render_recording(el, clips,
                                    fps=25.0, batch_size=8)
    fg0 = clips[1].frame_array(0).astype(float)
    bg0 = clips[2].frame_array(0).astype(float)
    blend = frames[0].astype(float)
    d_pure = np.abs(blend - fg0).mean()
    assert d_pure > 2.0          # not a plain fg frame
    exp = fg0 * 0.2 + bg0 * 0.8
    assert np.abs(blend - exp).mean() < 3.0


def test_chaotic_recording_rerenders_deterministically():
    """A recorded performance under random trickplay (key toggles, fps
    scratching, nervous mode, bg blending, param tweaks) re-renders to
    the SAME pixels twice — the event list is a complete, deterministic
    description of what happened (the durable-source-of-truth contract,
    SURVEY 5.3)."""
    import random
    import time as _t
    from lives_tpu.events.renderer import render_recording
    rng = random.Random(4)
    p, _ = make_player()
    p._nervous_rng = np.random.default_rng(7)
    p.state.bg_clip = MemClip(uid=2)
    p.keymap.set_key(0, 0, "negate")
    p.keymap.set_key(1, 0, "saturation")
    p.record_start(width=48, height=24)
    p.start()
    for i in range(25):
        op = rng.random()
        if op < 0.2:
            p.key_toggle(rng.randrange(2))
        elif op < 0.3:
            p.set_pb_fps(rng.choice([25.0, -50.0, 12.5]))
        elif op < 0.4:
            p.state.nervous = not p.state.nervous
        elif op < 0.5:
            p.state.blend_amount = rng.random()
        elif op < 0.6:
            p.set_key_param(1, "saturation", rng.uniform(0.5, 2.0))
        p.state.frame = -1
        p._clock0 = _t.monotonic()
        p._frame0 = float(i % 20)
        p.process_one()
    el = p.record_stop()
    p.stop()
    clips = {1: MemClip(uid=1), 2: MemClip(uid=2)}
    f1, t1 = render_recording(el, clips, fps=25.0, batch_size=8)
    f2, t2 = render_recording(el, clips, fps=25.0, batch_size=8)
    assert t1 == t2
    np.testing.assert_array_equal(f1, f2)
    assert len(f1) >= 1
    # and the serialized form re-renders identically too
    from lives_tpu.events import EventList
    el2 = EventList.from_json(el.to_json())
    f3, _ = render_recording(el2, clips, fps=25.0, batch_size=8)
    np.testing.assert_array_equal(f1, f3)


def test_fetch_batch_delivers_identical_frames():
    """Batched display fetch (groups of K stacked into one transfer)
    must deliver the same frames, in order, as the per-frame pop path."""
    import time

    def drive(fetch, n=10):
        p, sink = make_player()
        p.pipeline_depth = 2
        p.fetch_batch = fetch
        p.start()
        for i in range(n):
            p.state.frame = -1
            p._clock0 = time.monotonic()
            p._frame0 = float(i)
            p.process_one()
        p.stop()  # drains the pipeline
        return [np.asarray(f) for f in sink.frames], sink.tcs

    base, base_tcs = drive(0)
    batched, tcs = drive(3)
    assert len(batched) == len(base)
    assert tcs == base_tcs
    for a, b in zip(base, batched):
        np.testing.assert_array_equal(a, b)


def test_fetch_batch_mixed_shapes_falls_back():
    """A config change mid-group (different plane shapes) must not break
    the stacked fetch — the group passes through unfetched."""
    from lives_tpu.layer import Layer as _Layer

    p, sink = make_player()
    p.pipeline_depth = 0
    p.fetch_batch = 2
    a = _Layer(planes=(jnp.zeros((3, 8, 16), jnp.uint8),))
    b = _Layer(planes=(jnp.zeros((3, 4, 16), jnp.uint8),))
    out = p._fetch_host_layers([(a, 0.0), (b, 0.1)])
    assert out[0][0] is a and out[1][0] is b


def test_precache_is_lru_and_version_keyed():
    """Hits stay cached (looping clips re-decode nothing) and a clip
    content edit (version bump) invalidates naturally via the key."""
    p, _ = make_player()
    clip = p.state.fg_clip
    p.precache_depth = 2
    marker = clip.get_frame(3)
    p._precache[p._ck(clip, 3)] = marker
    assert p._pull(clip, 3) is marker
    assert p._pull(clip, 3) is marker          # still cached after a hit
    clip.version = 1                           # simulated content edit
    fresh = p._pull(clip, 3)
    assert fresh is not marker                 # stale entry not served


def test_recorded_generator_performance_scraps_and_rerenders(tmp_path):
    """Reference scrap-file role (frameloader.c:1212): recording a live
    generator captures its output to an MJPEG scrap clip via the device
    encode lane; FRAME events reference the scrap, and the re-render
    replays the performance from it — preset switches included."""
    import time as _time
    from lives_tpu.effects.milkdrop import register_milk_preset
    from lives_tpu.events.renderer import render_recording
    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.genclip import GeneratorClip
    from lives_tpu.io.jpeg_ingest import load_jpegcoef
    from lives_tpu.player import NullSink, Player
    if load_jpegcoef() is None:
        import pytest as _pytest
        _pytest.skip("jpeg bridge unavailable")
    register_milk_preset(
        "[p]\nfDecay=0.9\nwave_a=1\nnWaveMode=5\nwave_r=1\n", "scrp_a")
    register_milk_preset(
        "[p]\nfDecay=0.5\nzoom=1.02\nwave_a=0.6\nwave_b=1\n", "scrp_b")
    w, h = 64, 48
    clip = GeneratorClip("milk_scrp_a", width=w, height=h, fps=30.0)
    p = Player(sink=NullSink(), sink_spec=SinkSpec(width=w, height=h),
               fps=30.0)
    p.state.fg_clip = clip
    p.set_pb_fps(30.0)
    p.start()
    p.record_start(w, h)
    t0 = _time.monotonic()
    switched = False
    while _time.monotonic() - t0 < 3.0:
        p.process_one()
        if not switched and _time.monotonic() - t0 > 1.5:
            clip.switch("milk_scrp_b")   # live preset switch mid-take
            switched = True
        _time.sleep(0.002)
    el = p.record_stop()
    p.stop()
    assert p.rec_scrap_clips, "no scrap clip captured"
    uid, scrap = next(iter(p.rec_scrap_clips.items()))
    fevents = [e for e in el if getattr(e, "clips", None)]
    scrap_refs = [e for e in fevents if e.clips[0] == uid]
    assert scrap_refs, "frame events do not reference the scrap clip"
    # every scrap index referenced must exist in the finalized clip
    assert max(e.frames[0] for e in scrap_refs) < scrap.frames
    # re-render the performance against the scrap
    frames, tcs = render_recording(
        el, {uid: scrap, clip.unique_id: clip}, batch_size=8)
    assert frames.shape[0] > 0 and frames.dtype == np.uint8
    assert np.isfinite(frames.astype(np.float32)).all()
    assert frames.max() > 0


def test_live_feed_sources_scrap_on_record():
    """Non-replayable live feeds (V4L2 camera, network streams, y4m
    fifos) set scrap_on_record: recording them captures frames to a
    scrap clip exactly like generators (save_to_scrap_file role)."""
    import time as _time
    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.jpeg_ingest import load_jpegcoef
    from lives_tpu.player import NullSink, Player
    if load_jpegcoef() is None:
        import pytest as _pytest
        _pytest.skip("jpeg bridge unavailable")

    class LiveFeed:
        """Clip-like camera stand-in: every pull is a fresh frame."""
        width, height, fps = 64, 48, 30.0
        frames = 1 << 30
        unique_id = 0xCAFE
        scrap_on_record = True

        def __init__(self):
            self._n = 0

        def get_frame(self, n):
            # YUV420P like a real camera/stream feed: the scrap worker
            # must convert to RGB24 off the serving thread
            import jax.numpy as jnp
            self._n += 1
            rng = np.random.default_rng(self._n)
            return Layer(planes=(
                jnp.asarray(rng.integers(16, 235, (48, 64), np.uint8)),
                jnp.asarray(rng.integers(16, 240, (24, 32), np.uint8)),
                jnp.asarray(rng.integers(16, 240, (24, 32), np.uint8))),
                palette=int(Palette.YUV420P))

    feed = LiveFeed()
    p = Player(sink=NullSink(), sink_spec=SinkSpec(width=64, height=48),
               fps=30.0)
    p.precache_depth = 0            # live feeds pull inline
    p.state.fg_clip = feed
    p.set_pb_fps(30.0)
    p.start()
    p.record_start(64, 48)
    t0 = _time.monotonic()
    while _time.monotonic() - t0 < 2.0:
        p.process_one()
        _time.sleep(0.002)
    el = p.record_stop()
    p.stop()
    assert p.rec_scrap_clips, "live feed was not scrapped"
    uid, scrap = next(iter(p.rec_scrap_clips.items()))
    refs = [e for e in el if getattr(e, "clips", None)
            and e.clips[0] == uid]
    assert refs and max(e.frames[0] for e in refs) < scrap.frames


def test_recorded_audio_follows_source_not_scrap(tmp_path):
    """Scrap substitution must not hijack audio_clips: audio follows the
    SOURCE clip (whose audio_source plays), not the video-only scrap
    clip (events.c:5665 pair schema)."""
    import time as _time
    from lives_tpu.graph import SinkSpec
    from lives_tpu.io.jpeg_ingest import load_jpegcoef
    from lives_tpu.player import NullSink, Player
    from lives_tpu.audio.fx import AudioPlayer
    if load_jpegcoef() is None:
        import pytest as _pytest
        _pytest.skip("jpeg bridge unavailable")

    class Feed:
        width, height, fps = 64, 48, 30.0
        frames = 1 << 30
        unique_id = 0xBEEF
        scrap_on_record = True

        def get_frame(self, n):
            import jax.numpy as jnp
            return Layer(planes=(jnp.zeros((3, 48, 64), jnp.uint8),),
                         palette=int(Palette.RGB24))

    feed = Feed()
    p = Player(sink=NullSink(), sink_spec=SinkSpec(width=64, height=48),
               fps=30.0)
    p.precache_depth = 0
    p.state.fg_clip = feed
    # an audio feeder with data makes the recorder write audio pairs
    p.audio = AudioPlayer(p, sink=None)
    p.audio._data = np.zeros((44100, 2), np.float32)
    p.audio._src_rate = 44100
    p.audio._pos = 0.0
    p.set_pb_fps(30.0)
    p.start()
    p.record_start(64, 48)
    t0 = _time.monotonic()
    while _time.monotonic() - t0 < 1.0:
        p.process_one()
        _time.sleep(0.002)
    el = p.record_stop()
    p.stop()
    assert p.rec_scrap_clips
    uid = next(iter(p.rec_scrap_clips))
    scrapped = [e for e in el if getattr(e, "clips", None)
                and e.clips[0] == uid]
    assert scrapped, "scrap never engaged"
    for e in scrapped:
        ac = e.props.get("audio_clips")
        if ac:
            assert ac[1] == 0xBEEF, "audio pair points at the scrap clip"


def test_scrap_worker_failure_rewrites_events_to_source(monkeypatch):
    """If the encode worker dies mid-take, record_stop rewrites the
    affected FRAME events back to the live-source reference captured at
    record time — degraded replay, never blank frames."""
    import time as _time
    from lives_tpu import io as _io
    from lives_tpu.graph import SinkSpec
    from lives_tpu.player import NullSink, Player
    import lives_tpu.io.jpeg_encode as je

    class Boom:
        def __init__(self, *a, **k):
            raise RuntimeError("encoder unavailable")

    monkeypatch.setattr(je, "JpegDeviceEncoder", Boom)

    class Feed:
        width, height, fps = 64, 48, 30.0
        frames = 1 << 30
        unique_id = 0xD00D
        scrap_on_record = True

        def get_frame(self, n):
            import jax.numpy as jnp
            return Layer(planes=(jnp.zeros((3, 48, 64), jnp.uint8),),
                         palette=int(Palette.RGB24))

    feed = Feed()
    p = Player(sink=NullSink(), sink_spec=SinkSpec(width=64, height=48),
               fps=30.0)
    p.precache_depth = 0
    p.state.fg_clip = feed
    p.set_pb_fps(30.0)
    p.start()
    p.record_start(64, 48)
    t0 = _time.monotonic()
    while _time.monotonic() - t0 < 1.0:
        p.process_one()
        _time.sleep(0.002)
    el = p.record_stop()
    p.stop()
    assert not p.rec_scrap_clips            # nothing finalized
    fevents = [e for e in el if getattr(e, "clips", None)]
    assert fevents
    for e in fevents:                       # every event restored
        assert e.clips[0] == 0xD00D
        assert e.frames[0] >= 0


def test_double_record_stop_keeps_last_take():
    """A stray second record_stop (OSC /record/disable twice) must not
    clobber the saved take."""
    from lives_tpu.graph import SinkSpec
    from lives_tpu.player import NullSink, Player
    import time as _time
    p = Player(sink=NullSink(), sink_spec=SinkSpec(width=32, height=16),
               fps=25.0)
    p.state.fg_clip = MemClip()
    p.start()
    p.record_start(32, 16)
    for i in range(3):
        p.state.frame = -1
        p._clock0 = _time.monotonic()
        p._frame0 = float(i)
        p.process_one()
    el = p.record_stop()
    assert p.last_recording is el and len(el.events)
    p.record_stop()                         # stray second stop
    assert p.last_recording is el           # take survives
    p.stop()


def test_record_toggle_storm_never_kills_serving_loop():
    """record_start/record_stop hammered from another thread (the OSC
    surface) while the serving loop pumps: the loop must never die on
    the event list being swapped out mid-section (chaos test for the
    snapshot-local fix)."""
    import threading
    import time as _time
    from lives_tpu.graph import SinkSpec
    from lives_tpu.player import NullSink, Player
    p = Player(sink=NullSink(), sink_spec=SinkSpec(width=32, height=16),
               fps=25.0)
    p.state.fg_clip = MemClip()
    p.start()
    errors = []
    stop = threading.Event()

    def pump():
        i = 0
        while not stop.is_set():
            try:
                p.state.frame = -1
                p._clock0 = _time.monotonic()
                p._frame0 = float(i % 20)
                p.process_one()
                p.key_toggle(0, i % 2 == 0)   # records inits/deinits too
                i += 1
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    p.keymap.set_key(0, 0, "negate")
    t = threading.Thread(target=pump)
    t.start()
    deadline = _time.monotonic() + 3.0
    n = 0
    while _time.monotonic() < deadline:
        p.record_start(32, 16)
        _time.sleep(0.002)
        p.record_stop()
        n += 1
    stop.set()
    t.join(timeout=10)
    assert not errors, f"serving loop died: {errors[0]!r}"
    assert n > 50
