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
        rng = np.random.default_rng(c * 1000 + f)
        if c < 0:
            return np.zeros((3, self.h, self.w), np.uint8)
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
