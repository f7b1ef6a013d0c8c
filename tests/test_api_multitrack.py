"""liblives-style multitrack/block API (reference liblives.hpp:761-915:
multitrack::insertBlock/setCurrentTrack/setCurrentTime/render,
block::startTime/length/track/remove/moveTo)."""

import numpy as np
import pytest

from lives_tpu.api import LiVESApp
from lives_tpu.io.decoders import write_y4m
from lives_tpu.multitrack import Gravity, InsertMode, Multitrack
from lives_tpu.osc.server import NOTIFY


@pytest.fixture
def app(tmp_path):
    p = str(tmp_path / "a.y4m")
    frames = [(np.full((16, 32), 100 + i, np.uint8),
               np.full((8, 16), 96, np.uint8),
               np.full((8, 16), 128, np.uint8)) for i in range(20)]
    write_y4m(p, frames, fps=25.0)
    a = LiVESApp(workdir=str(tmp_path / "wd"))
    a.multitrack = Multitrack(width=32, height=16)
    a._test_clip_path = p
    return a


def test_insert_block_and_views(app):
    c = app.open_file(app._test_clip_path)
    mtk = app.get_multitrack()
    assert mtk.set_current_track(0)
    mtk.set_current_time(0.0)
    b = mtk.insert_block(c)
    assert b is not None and b.is_valid
    assert b.start_time() == 0.0
    assert abs(b.length() - 20 / 25.0) < 1e-9
    assert b.track() == 0


def test_selection_limits_insert(app):
    c = app.open_file(app._test_clip_path)
    c.set_selection_start(5)
    c.set_selection_end(10)
    mtk = app.get_multitrack()
    b = mtk.insert_block(c)
    assert abs(b.length() - 6 / 25.0) < 1e-9   # frames 5..10 inclusive
    b2 = mtk.insert_block(c, ignore_selection_limits=True)
    # NORMAL insert mode: no room at time 0 on the same track
    assert b2 is None
    mtk.set_current_time(1.0)
    b3 = mtk.insert_block(c, ignore_selection_limits=True)
    assert abs(b3.length() - 20 / 25.0) < 1e-9


def test_block_move_remove_notify(app):
    events = []
    app.add_callback(NOTIFY.BLOCK_INSERTED, lambda d: events.append("ins"))
    app.add_callback(NOTIFY.BLOCK_MOVED, lambda d: events.append("mov"))
    app.add_callback(NOTIFY.BLOCK_DELETED, lambda d: events.append("del"))
    c = app.open_file(app._test_clip_path)
    mtk = app.get_multitrack()
    b = mtk.insert_block(c)
    assert b.move_to(1, 0.4)
    assert b.track() == 1 and abs(b.start_time() - 0.4) < 1e-9
    assert b.remove()
    assert not b.is_valid
    assert events == ["ins", "mov", "del"]


def test_modes_and_tracks_surface(app):
    mtk = app.get_multitrack()
    assert mtk.set_gravity(Gravity.LEFT) == Gravity.LEFT
    assert mtk.gravity() == Gravity.LEFT
    assert mtk.set_insert_mode(InsertMode.OVERWRITE) == InsertMode.OVERWRITE
    assert mtk.num_video_tracks() == 2
    assert mtk.num_audio_tracks() == 1
    assert mtk.add_video_track()
    assert mtk.num_video_tracks() == 3
    assert mtk.fps() == 25.0
    mtk.set_track_label(0, "cam A")
    assert mtk.track_label(0) == "cam A"
    assert mtk.track_label(-1).startswith("Audio")


def test_audio_track_insert(app):
    c = app.open_file(app._test_clip_path)
    c.raw().write_audio(np.full((44100, 2), 0.5, np.float32), 44100)
    mtk = app.get_multitrack()
    assert mtk.set_current_track(-1)
    b = mtk.insert_block(c)
    assert b is not None
    assert len(app.multitrack.audio_blocks(-1)) == 1


def test_render_to_clip(app):
    c = app.open_file(app._test_clip_path)
    c.raw().write_audio(np.full((44100, 2), 0.25, np.float32), 44100)
    mtk = app.get_multitrack()
    mtk.insert_block(c)
    out = mtk.render(render_audio=True)
    assert out is not None
    assert out.frames == 20
    assert out.width == 32 and out.height == 16
    lay = out.raw().get_frame(0)
    assert np.asarray(lay.planes[0]).shape == (3, 16, 32)
    audio = out.raw().read_audio()
    assert len(audio) > 30000 and np.abs(audio).max() > 0.1


def test_wipe_and_layout_roundtrip(app, tmp_path):
    c = app.open_file(app._test_clip_path)
    mtk = app.get_multitrack()
    mtk.insert_block(c)
    path = str(tmp_path / "l.json")
    mtk.save_layout(path)
    mtk.wipe_layout(force=True)
    assert app.multitrack.n_frames == 0
    assert mtk.reload_layout(path)
    assert len(app.multitrack.blocks(0)) == 1
