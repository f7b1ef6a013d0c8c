"""Multitrack model tests: block CRUD as event-list rewrites, gravity,
undo/redo, effects regions, keyframes, layout save/load, render."""

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.multitrack import Block, Gravity, Multitrack


class Src:
    def __init__(self, h=16, w=32):
        self.h, self.w = h, w

    def frame(self, c, f):
        if c < 0:
            return np.zeros((3, self.h, self.w), np.uint8)
        rng = np.random.default_rng(c * 1000 + f)
        return rng.integers(0, 256, (3, self.h, self.w), np.uint8)

    def get_batch(self, clip_ids, frame_nums):
        arr = np.stack([self.frame(c, f)
                        for c, f in zip(clip_ids, frame_nums)])
        return Layer(planes=(jnp.asarray(arr),), palette=int(Palette.RGB24))


def test_insert_and_blocks():
    mt = Multitrack(n_tracks=2, width=32, height=16)
    b = mt.insert_block(0, clip=5, start=0, length=10)
    assert b == Block(0, 0, 10, 5, 0)
    assert mt.blocks(0) == [b]
    assert mt.n_frames == 10
    b2 = mt.insert_block(1, clip=7, start=5, length=10, offset=3)
    assert mt.blocks(1) == [b2]
    assert mt.n_frames == 15


def test_delete_block_and_tail_prune():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    b = mt.insert_block(0, 5, 0, 10)
    mt.delete_block(b)
    assert mt.blocks(0) == []
    assert mt.n_frames == 0


def test_move_block():
    mt = Multitrack(n_tracks=2, width=32, height=16)
    b = mt.insert_block(0, 5, 0, 6)
    nb = mt.move_block(b, 1, 4)
    assert mt.blocks(0) == []
    assert mt.blocks(1) == [Block(1, 4, 6, 5, 0)]


def test_gravity_left():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.insert_block(0, 1, 0, 5)
    mt.gravity = Gravity.LEFT
    b = mt.insert_block(0, 2, 20, 5)  # snaps to end of previous block
    assert b.start == 5


def test_split_block():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    b = mt.insert_block(0, 1, 0, 10, offset=2)
    a, c = mt.split_block(b, 4)
    assert a.length == 4 and c.start == 4 and c.offset == 6


def test_undo_redo():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.insert_block(0, 1, 0, 5)
    mt.insert_block(0, 2, 5, 5)
    assert len(mt.blocks(0)) == 2
    assert mt.undo()
    assert len(mt.blocks(0)) == 1
    assert mt.redo()
    assert len(mt.blocks(0)) == 2
    assert mt.undo() and mt.undo()
    assert mt.blocks(0) == []


def test_effect_region_and_filter_maps():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.insert_block(0, 1, 0, 10)
    fid = mt.add_effect("negate", [0], start=3, length=4)
    assert len(mt.el.active_inits_at(mt.frame_tc(3))) == 1
    assert len(mt.el.active_inits_at(mt.frame_tc(8))) == 0
    src = Src()
    out, _ = mt.render(src, batch_size=4)
    np.testing.assert_array_equal(out[0], src.frame(1, 0))
    np.testing.assert_array_equal(out[3], 255 - src.frame(1, 3))
    np.testing.assert_array_equal(out[7], src.frame(1, 7))
    mt.remove_effect(fid)
    assert len(mt.el.active_inits_at(mt.frame_tc(3))) == 0


def test_keyframed_param_render():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.insert_block(0, 1, 0, 11)
    fid = mt.add_effect("brightness_contrast", [0], 0, 11,
                        values={"brightness": -1.0})
    mt.set_keyframe(fid, 0, "brightness", -1.0)
    mt.set_keyframe(fid, 10, "brightness", 0.0)
    src = Src()
    out, _ = mt.render(src, batch_size=6)
    assert out[0].max() == 0                      # fully dark
    assert out[10].mean() > out[5].mean() > out[1].mean()


def test_transition_between_tracks():
    mt = Multitrack(n_tracks=2, width=32, height=16)
    mt.insert_block(0, 1, 0, 8)
    mt.insert_block(1, 2, 0, 8)
    mt.add_effect("crossfade", [0, 1], 0, 8, values={"amount": 0.5})
    src = Src()
    out, _ = mt.render(src, batch_size=8)
    a = src.frame(1, 0).astype(np.float32)
    b = src.frame(2, 0).astype(np.float32)
    exp = np.floor((a + b) / 2 / 255 * 255 + 0.5)
    assert np.abs(out[0].astype(np.float32) - exp).max() <= 1


def test_layout_roundtrip(tmp_path):
    mt = Multitrack(n_tracks=2, width=32, height=16)
    mt.insert_block(0, 1, 0, 5)
    mt.insert_block(1, 2, 2, 5)
    mt.add_effect("vignette", [0], 0, 7)
    p = tmp_path / "layout.json"
    mt.save_layout(str(p))
    mt2 = Multitrack.load_layout(str(p))
    assert mt2.n_tracks == 2
    assert mt2.blocks(0) == mt.blocks(0)
    assert mt2.blocks(1) == mt.blocks(1)


def test_multitrack_audio_mix(tmp_path):
    from lives_tpu.io import create_clip
    mt = Multitrack(n_tracks=2, width=16, height=8)
    c1 = create_clip(tmp_path, 16, 8)
    c2 = create_clip(tmp_path, 16, 8)
    t = np.linspace(0, 1, 44100)
    c1.write_audio(np.stack([np.full(44100, 0.5)] * 2, 1).astype(np.float32),
                   44100)
    c2.write_audio(np.stack([np.full(44100, 0.5)] * 2, 1).astype(np.float32),
                   44100)
    mt.insert_block(0, 1, 0, 25)
    mt.insert_block(1, 2, 0, 25)
    mt.set_track_volume(1, 0.0)  # mute track 1
    out = mt.render_audio({1: c1, 2: c2})
    assert np.abs(out[:44000] - 0.5).max() < 1e-3  # only track 0 audible
    mt.set_track_volume(1, 1.0)
    out2 = mt.render_audio({1: c1, 2: c2})
    assert np.abs(out2[:44000] - 1.0).max() < 1e-2  # both mixed


# ---------------------------------------------------------------------------
# Round-3 depth: gravity/insert modes, gaps, audio blocks, avol keyframes
# (reference multitrack.h:101-117 modes; events.c:1251 audio transitions;
#  events.c:2636 add_track_to_avol_init)

from lives_tpu.multitrack import AudioBlock, InsertMode


def test_gravity_right():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.insert_block(0, 1, 20, 5)            # block at [20, 25)
    mt.gravity = Gravity.RIGHT
    b = mt.insert_block(0, 2, 0, 5)         # snaps forward against it
    assert b.start == 15 and b.end == 20


def test_gravity_right_clamps_to_previous():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.insert_block(0, 1, 0, 8)             # [0, 8)
    mt.insert_block(0, 2, 10, 5)            # [10, 15)
    mt.gravity = Gravity.RIGHT
    b = mt.insert_block(0, 3, 9, 5, mode=InsertMode.NORMAL)
    # wants to end at 10 but only [8, 10) is free -> clipped
    assert b.start == 8 and b.length == 2


def test_insert_mode_normal_fits_gap():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.insert_block(0, 1, 0, 5)
    mt.insert_block(0, 2, 10, 5)
    b = mt.insert_block(0, 3, 5, 100)       # gap is [5, 10)
    assert b.start == 5 and b.length == 5
    assert mt.insert_block(0, 4, 2, 3) is None   # inside a block


def test_insert_mode_fill_selection():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.insert_block(0, 1, 0, 5)
    mt.insert_block(0, 2, 20, 5)
    mt.select_region([0], 8, 16)
    b = mt.insert_block(0, 3, 9, 100, mode=InsertMode.FILL)
    assert b.start == 8 and b.end == 16     # fills selection (gap is wider)
    mt.undo()
    mt.gravity = Gravity.RIGHT              # fill from the selection end
    b = mt.insert_block(0, 3, 9, 4, mode=InsertMode.FILL)
    assert b.end == 16 and b.length == 4


def test_insert_and_remove_gap():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.insert_block(0, 1, 0, 5)
    mt.insert_block(0, 2, 5, 5)
    mt.insert_gap([0], 5, 3)
    assert [(b.start, b.clip) for b in mt.blocks(0)] == [(0, 1), (8, 2)]
    mt.remove_gaps([0], 0, mt.n_frames)
    assert [(b.start, b.clip) for b in mt.blocks(0)] == [(0, 1), (5, 2)]


def test_insert_gap_shifts_effects():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.insert_block(0, 1, 0, 10)
    fid = mt.add_effect("negate", [0], 4, 4)
    mt.insert_gap([0], 2, 5)
    init = mt.el.get(fid)
    assert mt.tc_frame(init.tc) == 9        # effect moved with content


def test_audio_block_views_and_state():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    ab = mt.insert_audio_block(-1, 9, 5, 10, seek=2.0)
    assert ab == AudioBlock(-1, 5, 10, 9, 2.0, 1.0)
    assert mt.audio_blocks(-1) == [ab]
    st = mt._audio_state_at(-1, mt.frame_tc(10))
    assert st is not None and st[0] == 9
    assert abs(st[1] - 2.2) < 1e-6          # 5 frames @25fps past seek 2.0
    assert mt._audio_state_at(-1, mt.frame_tc(16)) is None  # past block
    mt.delete_audio_block(ab)
    assert mt.audio_blocks(-1) == []


def test_audio_block_under_video_mixdown(tmp_path):
    from lives_tpu.io import create_clip
    mt = Multitrack(n_tracks=1, width=16, height=8)
    cv = create_clip(tmp_path, 16, 8)
    ca = create_clip(tmp_path, 16, 8)
    cv.write_audio(np.full((44100, 2), 0.25, np.float32), 44100)
    ca.write_audio(np.full((44100, 2), 0.5, np.float32), 44100)
    mt.insert_block(0, 1, 0, 25)            # video track with audio, 1 s
    mt.insert_audio_block(-1, 2, 0, 25)     # backing audio underneath
    out = mt.render_audio({1: cv, 2: ca})
    assert np.abs(out[1000:20000] - 0.75).max() < 1e-2
    # backing track volume rides its own avol slot
    mt.set_track_volume(-1, 0.5)
    out = mt.render_audio({1: cv, 2: ca})
    assert np.abs(out[1000:20000] - 0.5).max() < 1e-2


def test_avol_volume_keyframes_audible(tmp_path):
    from lives_tpu.io import create_clip
    mt = Multitrack(n_tracks=1, width=16, height=8)
    c = create_clip(tmp_path, 16, 8)
    c.write_audio(np.full((88200, 2), 0.5, np.float32), 44100)
    mt.insert_block(0, 1, 0, 50)            # 2 s
    mt.set_track_volume(0, 1.0, frame=0)
    mt.set_track_volume(0, 0.0, frame=50)   # fade out over the block
    out = mt.render_audio({1: c})
    n = len(out)
    early = np.abs(out[: n // 8]).mean()
    late = np.abs(out[-n // 8:]).mean()
    assert early > 0.35 and late < 0.15
    # static volume API reads back the init value
    mt.set_track_volume(0, 0.7)
    assert abs(mt.track_volume(0) - 0.7) < 1e-9


def test_audio_block_velocity_reverse(tmp_path):
    from lives_tpu.io import create_clip
    mt = Multitrack(n_tracks=1, width=16, height=8)
    c = create_clip(tmp_path, 16, 8)
    ramp = np.linspace(0, 1, 44100, dtype=np.float32)
    c.write_audio(np.stack([ramp, ramp], 1), 44100)
    mt.insert_audio_block(-1, 1, 0, 25, seek=1.0, vel=-1.0)  # reverse
    out = mt.render_audio({1: c})
    # ramp played backwards: starts loud, decays
    assert out[100, 0] > out[20000, 0] > out[40000, 0]


def test_audio_trim_and_block_termination(tmp_path):
    from lives_tpu.io import create_clip
    mt = Multitrack(n_tracks=2, width=16, height=8)
    c = create_clip(tmp_path, 16, 8)
    c.write_audio(np.full((88200, 2), 0.5, np.float32), 44100)
    mt.insert_block(1, 3, 0, 50, with_audio=False)  # holds timeline length
    b = mt.insert_block(0, 1, 0, 50)
    kept = mt.trim_block(b, 25)             # audio must stop at frame 25
    assert kept.length == 25
    out = mt.render_audio({1: c})
    assert np.abs(out[:42000]).mean() > 0.4
    assert np.abs(out[46000:]).max() < 1e-6


def test_avol_add_track_widens_keyframes():
    mt = Multitrack(n_tracks=1, width=32, height=16)
    mt.set_track_volume(0, 0.5, frame=10)
    mt.add_track()
    init = mt.el.get(mt._avol_id)
    assert init.props["in_tracks"] == [-1, 0, 1]
    for pc in mt.el.pchain(mt._avol_id, "volume"):
        assert len(pc.props["value"]) == 3
    assert mt.track_volume(1) == 1.0


def test_avol_binary_roundtrip(tmp_path):
    mt = Multitrack(n_tracks=2, width=32, height=16)
    mt.insert_block(0, 1, 0, 10)
    mt.set_track_volume(0, 0.25)
    p = tmp_path / "layout.lay"
    mt.save_layout(str(p))
    mt2 = Multitrack.load_layout(str(p))
    assert abs(mt2.track_volume(0) - 0.25) < 1e-9
    init = mt2.el.get(mt2._avol_id)
    assert init.props.get("audio") is True


def test_editor_ops_fast_on_long_timeline():
    """Editor edits must not scan the whole event list per frame
    (VERDICT: O(L x N) insert_block on 100k events).

    Bounds are RELATIVE to the measured cost of building the timeline
    in this process: absolute wall-clock asserts flaked whenever the
    single shared host core was busy (round-4 full-suite run), and a
    red suite for scheduler noise trains people to ignore red. A true
    O(L) regression still fails by orders of magnitude."""
    import time
    mt = Multitrack(n_tracks=2, width=32, height=16)
    # build a 50k-frame timeline through the fast append path; its
    # duration is the machine-speed baseline the asserts scale by
    t0 = time.monotonic()
    for i in range(50_000):
        e = mt._ensure_frame_event(i)
        e.props["clips"][0] = 1
        e.props["frames"][0] = i
    build = max(time.monotonic() - t0, 0.05)
    # min-of-3: a single sample still catches scheduler spikes from
    # sibling tests' background threads in a full-suite run
    dts = []
    for k in range(3):
        t0 = time.monotonic()
        mt.insert_block(1, 2, 40_000 + k * 1000, 200,
                        mode=InsertMode.OVERWRITE)
        dts.append(time.monotonic() - t0)
    dt = min(dts)
    # a 200-frame window edit on a 50k timeline must cost a small
    # fraction of touching all 50k events once
    assert dt < build * 0.5, f"insert took {dt:.2f}s (build {build:.2f}s)"
    dts = []
    for _ in range(3):
        t0 = time.monotonic()
        e = mt.el.get_frame_event_at(mt.frame_tc(25_000))
        dts.append(time.monotonic() - t0)
    dt = min(dts)
    assert e is not None and dt < max(0.01, build * 0.02), \
        f"indexed lookup took {dt:.4f}s (build {build:.2f}s)"


def test_silent_blocks_stay_silent_through_edits(tmp_path):
    """Review fix: move/trim of a with_audio=False block must not
    conjure audio transitions."""
    from lives_tpu.io import create_clip
    mt = Multitrack(n_tracks=2, width=16, height=8)
    c = create_clip(tmp_path, 16, 8)
    c.write_audio(np.full((88200, 2), 0.5, np.float32), 44100)
    b = mt.insert_block(0, 1, 0, 25, with_audio=False)
    out = mt.render_audio({1: c})
    assert np.abs(out).max() < 1e-6
    nb = mt.move_block(b, 1, 5)
    out = mt.render_audio({1: c})
    assert np.abs(out).max() < 1e-6
    kept = mt.trim_block(nb, 10, from_start=True)
    out = mt.render_audio({1: c})
    assert np.abs(out).max() < 1e-6
    # while an audioful block keeps its audio through a move
    b2 = mt.insert_block(0, 1, 0, 25)
    nb2 = mt.move_block(b2, 0, 10)
    out = mt.render_audio({1: c})
    assert np.abs(out).max() > 0.4


def test_timeline_audio_effects(tmp_path):
    """Audio-filter regions render during the timeline mixdown
    (weed_apply_audio_instance role): per-track gain region halves one
    half of a block; keyframed gain ramps; master-bus region affects the
    mix."""
    from lives_tpu.io import create_clip
    mt = Multitrack(n_tracks=1, width=16, height=8)
    c = create_clip(tmp_path, 16, 8)
    c.write_audio(np.full((88200, 2), 0.5, np.float32), 44100)
    mt.insert_block(0, 1, 0, 50)            # 2 s
    fid = mt.add_audio_effect("gain", [0], 25, 25, values={"gain": 0.5})
    out = mt.render_audio({1: c})
    assert np.abs(out[:42000] - 0.5).max() < 1e-3      # untouched half
    assert np.abs(out[46000:86000] - 0.25).max() < 1e-3  # gained half
    # keyframed: ramp the gain across the region
    mt.set_keyframe(fid, 25, "gain", 1.0)
    mt.set_keyframe(fid, 50, "gain", 0.0)
    out2 = mt.render_audio({1: c})
    assert out2[46000].mean() > out2[66000].mean() > out2[85000].mean()
    # master-bus region (no tracks): scales everything in range
    mt.remove_effect(fid)
    mt.add_audio_effect("gain", [], 0, 50, values={"gain": 0.1})
    out3 = mt.render_audio({1: c})
    assert np.abs(out3[1000:85000] - 0.05).max() < 1e-2


def test_autotransition_on_overlap():
    """mt->opts.atrans_fx: inserting a block overlapping the neighbour
    track auto-adds the transition over the overlap with a 0->1 ramp."""
    mt = Multitrack(n_tracks=2, width=32, height=16)
    mt.autotrans_filter = "crossfade"
    mt.insert_block(0, 1, 0, 10)
    b = mt.insert_block(1, 2, 5, 10)        # overlap [5, 10)
    fx = mt.effects()
    assert len(fx) == 1
    assert fx[0]["filter"] == "crossfade"
    assert fx[0]["start"] == 5 and fx[0]["end"] == 10
    assert sorted(fx[0]["tracks"]) == [0, 1]
    kfs = mt.keyframes(fx[0]["id"], "amount")
    assert kfs[0] == (5, 0.0) and kfs[-1][0] == 10
    # renders: midpoint is a blend of both tracks
    src = Src()
    out, _ = mt.render(src, batch_size=8)
    a = src.frame(1, 7).astype(int)
    bfr = src.frame(2, 2).astype(int)
    mid = out[7].astype(int)
    assert np.abs(mid - a).mean() > 4 and np.abs(mid - bfr).mean() > 4
    # undo removes the block AND its auto transition in one step
    assert mt.undo()
    assert mt.effects() == [] and mt.blocks(1) == []


def test_split_block_is_durable(tmp_path):
    """split_block records an EVENT_MARKER_BLOCK_START (events.h:357) so
    the halves stay separate views, survive a binary round trip, and
    edit independently."""
    mt = Multitrack(n_tracks=1, width=32, height=16)
    b = mt.insert_block(0, 1, 0, 10, offset=2)
    a, c = mt.split_block(b, 4)
    got = mt.blocks(0)
    assert got == [a, c]
    # the halves edit independently now
    mt.delete_block(got[0])
    assert mt.blocks(0) == [c]
    assert mt.undo()                 # delete undone
    assert mt.blocks(0) == [a, c]
    p = tmp_path / "layout.lay"
    mt.save_layout(str(p))
    mt2 = Multitrack.load_layout(str(p))
    assert mt2.blocks(0) == [a, c]   # marker survived binary round trip


def test_audio_fx_keyframe_without_init_value(tmp_path):
    """A keyframe on a param never set at init time still applies
    (review fix: only init-value params were interpolated)."""
    from lives_tpu.io import create_clip
    mt = Multitrack(n_tracks=1, width=16, height=8)
    c = create_clip(tmp_path, 16, 8)
    c.write_audio(np.full((88200, 2), 0.5, np.float32), 44100)
    mt.insert_block(0, 1, 0, 50)
    fid = mt.add_audio_effect("gain", [0], 0, 50)     # no values
    mt.set_keyframe(fid, 0, "gain", 0.2)
    mt.set_keyframe(fid, 50, "gain", 0.2)
    out = mt.render_audio({1: c})
    assert np.abs(out[2000:80000] - 0.1).max() < 0.02
