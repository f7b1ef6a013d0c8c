"""Video resample (fps retime / reverse), LADSPA bridge gating, messaging."""

import numpy as np
import pytest

from lives_tpu.io import open_clip
from lives_tpu.io.decoders import write_y4m
from lives_tpu.resample import resample_clip_fps, reverse_clip, speed_change


def make_clip(tmp_path, n=10):
    frames = [(np.full((16, 32), 20 + i * 10, np.uint8),
               np.full((8, 16), 128, np.uint8),
               np.full((8, 16), 128, np.uint8)) for i in range(n)]
    write_y4m(str(tmp_path / "c.y4m"), frames, fps=25.0)
    return open_clip(str(tmp_path / "c.y4m"), tmp_path / "work")


def luma0(clip, n):
    return int(np.asarray(clip.get_frame(n).planes[0])[0, 0])


def test_resample_up(tmp_path):
    clip = make_clip(tmp_path)
    n = resample_clip_fps(clip, 50.0)
    assert n == 20 and clip.fps == 50.0
    # doubled frames: pairs show the same source
    assert luma0(clip, 0) == luma0(clip, 1) == 20
    assert luma0(clip, 18) == luma0(clip, 19) == 110


def test_resample_down(tmp_path):
    clip = make_clip(tmp_path)
    n = resample_clip_fps(clip, 12.5)
    assert n == 5
    assert luma0(clip, 0) in (20, 30)
    assert luma0(clip, 4) in (100, 110)


def test_reverse_virtual(tmp_path):
    clip = make_clip(tmp_path)
    reverse_clip(clip)
    assert luma0(clip, 0) == 110 and luma0(clip, 9) == 20


def test_reverse_with_images(tmp_path):
    clip = make_clip(tmp_path)
    clip.realize(0, 3)  # frames 0..2 become PNGs
    first_rgb = np.asarray(clip.get_frame(0).planes[0]).copy()
    reverse_clip(clip)
    # old frame 0 now lives at position 9 (as an image)
    got = np.asarray(clip.get_frame(9).planes[0])
    np.testing.assert_array_equal(got, first_rgb)
    assert luma0(clip, 0) == 110  # virtual end frame now first


def test_speed_change(tmp_path):
    clip = make_clip(tmp_path)
    speed_change(clip, 2.0)
    assert clip.fps == 50.0 and clip.frames == 10


def test_ladspa_scan_gated():
    from lives_tpu.audio.ladspa import scan_plugins, search_paths
    plugs = scan_plugins()  # empty in this container, must not raise
    assert isinstance(plugs, list)
    for p in plugs:
        assert p.name


def test_messaging_ring():
    from lives_tpu.messaging import MessageRing
    r = MessageRing(capacity=5)
    got = []
    r.listeners.append(lambda lvl, m: got.append((lvl, m)))
    for i in range(8):
        r.info(f"m{i}")
    r.debug("hidden")          # below default level
    assert len(r.ring) == 5    # bounded
    assert got[-1] == ("info", "m7")
    assert ("debug", "hidden") not in got


def test_messaging_save_log(tmp_path):
    from lives_tpu.messaging import MessageRing
    r = MessageRing()
    r.error("boom")
    r.save_log(tmp_path / "log.txt")
    assert "boom" in (tmp_path / "log.txt").read_text()
