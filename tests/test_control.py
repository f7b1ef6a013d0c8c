"""Control plane tests: OSC wire protocol, server dispatch over real UDP,
notify sockets, liblives-style API, sets + crash recovery."""

import socket
import time

import numpy as np
import pytest

import jax.numpy as jnp

from lives_tpu.constants import Palette
from lives_tpu.layer import Layer
from lives_tpu.osc import OSCMessage, OSCServer, build_message, parse_packet
from lives_tpu.player import CollectSink, Player


class MemClip:
    def __init__(self, n=10, h=16, w=32, uid=1):
        self.frames, self.fps = n, 25.0
        self.width, self.height, self.unique_id = w, h, uid

    def get_frame(self, n):
        rng = np.random.default_rng(self.unique_id * 31 + n)
        return Layer(planes=(jnp.asarray(
            rng.integers(0, 256, (3, self.height, self.width), np.uint8)),),
            palette=int(Palette.RGB24))


# -- wire protocol -----------------------------------------------------------

def test_osc_roundtrip_types():
    pkt = build_message("/test/path", 42, 3.5, "hello", True, None,
                        b"\x01\x02")
    msgs = parse_packet(pkt)
    assert len(msgs) == 1
    m = msgs[0]
    assert m.address == "/test/path"
    assert m.args[0] == 42
    assert m.args[1] == pytest.approx(3.5)
    assert m.args[2] == "hello"
    assert m.args[3] is True and m.args[4] is None
    assert m.args[5] == b"\x01\x02"


def test_osc_int64():
    pkt = build_message("/x", 1 << 40)
    assert parse_packet(pkt)[0].args[0] == 1 << 40


def test_osc_bundle():
    inner1 = build_message("/a", 1)
    inner2 = build_message("/b", 2)
    import struct
    bundle = (b"#bundle\0" + b"\0" * 8
              + struct.pack(">i", len(inner1)) + inner1
              + struct.pack(">i", len(inner2)) + inner2)
    msgs = parse_packet(bundle)
    assert [m.address for m in msgs] == ["/a", "/b"]


# -- server over real UDP ----------------------------------------------------

@pytest.fixture
def served():
    player = Player(sink=CollectSink())
    player.state.fg_clip = MemClip()
    srv = OSCServer(player, port=0)
    srv.start()
    cli = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    yield srv, player, cli
    cli.close()
    srv.stop()


def send_wait(cli, srv, path, *args, wait=0.3):
    cli.sendto(build_message(path, *args), ("127.0.0.1", srv.port))
    deadline = time.time() + wait
    while time.time() < deadline:
        time.sleep(0.01)


def test_server_play_stop(served):
    srv, player, cli = served
    send_wait(cli, srv, "/video/play")
    assert player.state.playing
    send_wait(cli, srv, "/video/stop")
    assert not player.state.playing


def test_server_fps_and_keys(served):
    srv, player, cli = served
    send_wait(cli, srv, "/video/fps/set", 50.0)
    assert player.state.pb_fps == pytest.approx(50.0)
    send_wait(cli, srv, "/effect_key/map", 1, "negate")
    send_wait(cli, srv, "/effect_key/enable", 1)
    assert player.keymap.active[0]
    send_wait(cli, srv, "/effect_key/disable", 1)
    assert not player.keymap.active[0]


def test_notify_socket(served):
    srv, player, cli = served
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    send_wait(cli, srv, "/lives/open_notify_socket", port)
    send_wait(cli, srv, "/video/play")
    data, _ = rx.recvfrom(1024)
    assert data.decode().startswith("2|")  # PLAYBACK_STARTED
    rx.close()


def test_unknown_method_survives(served):
    srv, player, cli = served
    send_wait(cli, srv, "/no/such/path", 1)
    send_wait(cli, srv, "/video/play")  # still serving
    assert player.state.playing


# -- liblives-style API ------------------------------------------------------

def test_api_end_to_end(tmp_path):
    from lives_tpu.api import LiVESApp
    from lives_tpu.io.decoders import write_y4m
    frames = [(np.full((16, 32), 100, np.uint8),
               np.full((8, 16), 128, np.uint8),
               np.full((8, 16), 128, np.uint8)) for _ in range(6)]
    write_y4m(str(tmp_path / "c.y4m"), frames)
    app = LiVESApp(workdir=tmp_path / "wd", sink=CollectSink())
    events = []
    from lives_tpu.osc.server import NOTIFY
    app.add_callback(NOTIFY.CLIP_OPENED, lambda d: events.append(d))
    clip = app.open_file(str(tmp_path / "c.y4m"))
    assert clip.frames == 6 and events == ["1"]
    assert app.set.num_clips == 1
    app.effect_key_map[0].map("negate")
    app.effect_key_map[0].set_enabled(True)
    app.player.play()
    app.player.tick(2)
    app.player.stop()
    assert app.player._player.frames_shown >= 1
    app.effect_key_map.clear()
    assert not app.effect_key_map[0].enabled
    app.quit()


def test_sets_and_recovery(tmp_path):
    from lives_tpu.api import LiVESApp
    from lives_tpu.io.decoders import write_y4m
    from lives_tpu.sets import (check_recovery, clear_recovery, list_sets,
                                load_set, recover_clips)
    frames = [(np.full((16, 32), 90, np.uint8),
               np.full((8, 16), 128, np.uint8),
               np.full((8, 16), 128, np.uint8)) for _ in range(4)]
    write_y4m(str(tmp_path / "c.y4m"), frames)
    app = LiVESApp(workdir=tmp_path / "wd")
    app.open_file(str(tmp_path / "c.y4m"))
    app.multitrack.insert_block(0, 1, 0, 4)
    app.set.save("myset")
    assert list_sets(app.workdir) == ["myset"]

    # crash recovery journal survives
    assert len(check_recovery(app.workdir)) == 1
    app2 = LiVESApp(workdir=tmp_path / "wd")
    assert recover_clips(app2) == 1
    assert app2.set.num_clips == 1
    clear_recovery(app2.workdir)
    assert check_recovery(app2.workdir) == []

    # set reload into a fresh app
    app3 = LiVESApp(workdir=tmp_path / "wd")
    assert load_set(app3, "myset") == 1
    assert app3.set.num_clips == 1
    assert len(app3.multitrack.blocks(0)) == 1


def test_extended_osc_namespace(served):
    srv, player, cli = served
    srv.clips[1] = player.state.fg_clip
    send_wait(cli, srv, "/clip/select", 1)
    assert player.state.fg_clip is srv.clips[1]
    send_wait(cli, srv, "/effect_key/map", 2, "vignette")
    send_wait(cli, srv, "/effect_key/enable", 2)
    assert srv.methods["/effect_key/state/get"](2) == 1
    assert srv.methods["/effect_key/name/get"](2) == "vignette"
    assert srv.methods["/clip/count"]() == 1
    send_wait(cli, srv, "/clip/foreground/fps/faster")
    assert player.state.pb_fps > 25.0
    send_wait(cli, srv, "/clip/close", 1)
    assert player.state.fg_clip is None


def test_api_record_render_to_clip(tmp_path):
    """liblives-style post-record render choice: record a short
    performance through the API, then render_recording() materialises it
    as a NEW clip in the app (deal_with_render_choice, events.c:5101)."""
    import time as _time
    from lives_tpu.events.event_list import \
        TICKS_PER_SECOND as _TPS
    TICKS = _TPS / 25.0

    from lives_tpu.api import LiVESApp
    from lives_tpu.io.decoders import write_y4m
    frames = [(np.full((16, 32), 60 + 20 * i, np.uint8),
               np.full((8, 16), 128, np.uint8),
               np.full((8, 16), 128, np.uint8)) for i in range(8)]
    write_y4m(str(tmp_path / "c.y4m"), frames)
    app = LiVESApp(workdir=tmp_path / "wd", sink=CollectSink())
    app.open_file(str(tmp_path / "c.y4m"))
    app.effect_key_map[0].map("negate")
    app.player.play()
    app.player.record_start()
    assert app.player.recording
    pl = app.player._player
    from conftest import drive_recorded_frame
    for i in range(6):
        if i == 2:
            app.effect_key_map[0].set_enabled(True)
        drive_recorded_frame(pl, i, TICKS)
    el = app.player.record_stop()
    app.player.stop()
    assert not app.player.recording
    assert sum(1 for e in el.events if e.type.name == "FRAME") == 6
    n_before = app.set.num_clips
    out = app.player.render_recording()
    assert out is not None and app.set.num_clips == n_before + 1
    assert out.raw().frames == 6
    lay = out.raw().get_frame(0)
    arr = np.asarray(lay.planes[0])
    assert arr.shape[-2:] == (16, 32) and arr.max() > 0
    app.quit()


def test_api_preview_recording_paces_frames_to_sink(tmp_path):
    """Render-choice "preview" (deal_with_render_choice, events.c:5955):
    the last take plays through the sink paced to its fps, without
    creating a clip."""
    import time as _time
    from lives_tpu.events.event_list import \
        TICKS_PER_SECOND as _TPS
    TICKS = _TPS / 25.0

    from lives_tpu.api import LiVESApp
    from lives_tpu.io.decoders import write_y4m
    frames = [(np.full((16, 32), 60 + 20 * i, np.uint8),
               np.full((8, 16), 128, np.uint8),
               np.full((8, 16), 128, np.uint8)) for i in range(8)]
    write_y4m(str(tmp_path / "c.y4m"), frames)
    sink = CollectSink()
    app = LiVESApp(workdir=tmp_path / "wd", sink=sink)
    app.open_file(str(tmp_path / "c.y4m"))
    app.player.play()
    app.player.record_start()
    pl = app.player._player
    from conftest import drive_recorded_frame
    for i in range(5):
        drive_recorded_frame(pl, i, TICKS)
    app.player.record_stop()
    app.player.stop()
    n_before = app.set.num_clips
    live_shown = len(sink.frames)
    t0 = _time.monotonic()
    shown = app.player.preview_recording()
    dt = _time.monotonic() - t0
    assert shown == 5
    assert len(sink.frames) == live_shown + 5   # frames hit the sink
    assert app.set.num_clips == n_before        # no clip materialised
    assert dt >= 4 / 25.0 * 0.8                 # paced, not dumped
    app.quit()


def test_recording_crash_recovery_renders_in_fresh_app(tmp_path):
    """Crash between record_stop and render: the final autosave (with
    durable scrap refs) recovers in a FRESH app and renders — the
    reference's deal_with_render_choice(is_recovery) flow."""
    import time as _time
    from lives_tpu.api import LiVESApp
    from lives_tpu.effects.milkdrop import register_milk_preset
    from lives_tpu.io.genclip import GeneratorClip
    from lives_tpu.io.jpeg_ingest import load_jpegcoef
    if load_jpegcoef() is None:
        import pytest as _pytest
        _pytest.skip("jpeg bridge unavailable")
    register_milk_preset("[p]\nfDecay=0.9\nwave_a=1\nzoom=1.01\n",
                         "recov_t")
    wd = tmp_path / "wd"
    app = LiVESApp(workdir=wd, sink=CollectSink())
    gen = GeneratorClip("milk_recov_t", width=64, height=48, fps=30.0)
    app.player._player.state.fg_clip = gen
    app.player._player.set_pb_fps(30.0)
    app.player.play()
    app.player.record_start()
    t0 = _time.monotonic()
    while _time.monotonic() - t0 < 1.5:
        app.player._player.process_one()
        _time.sleep(0.002)
    app.player.record_stop()
    app.player.stop()
    assert app.check_recording_recovery()
    # "crash": a brand-new app over the same workdir, no in-memory state
    app2 = LiVESApp(workdir=wd, sink=CollectSink())
    assert app2.check_recording_recovery()
    out = app2.recover_recording()
    assert out is not None and out.raw().frames > 0
    arr = np.asarray(out.raw().get_frame(0).planes[0])
    assert arr.shape[0] == 3 and arr.max() > 0
    assert not app2.check_recording_recovery()   # autosave consumed
    app.quit()
    app2.quit()


def test_mid_take_autosave_has_no_scrap_refs(tmp_path):
    """A crash mid-take leaves an autosave whose FRAME events reference
    the live SOURCES (scrap clips aren't durable until record_stop) —
    it must load and render approximately, never dangle."""
    import time as _time
    from lives_tpu.api import LiVESApp
    from lives_tpu.effects.milkdrop import register_milk_preset
    from lives_tpu.events.event_list import EventList
    from lives_tpu.io.genclip import GeneratorClip
    from lives_tpu.io.jpeg_ingest import load_jpegcoef
    if load_jpegcoef() is None:
        import pytest as _pytest
        _pytest.skip("jpeg bridge unavailable")
    register_milk_preset("[p]\nfDecay=0.8\nwave_a=1\n", "recov_m")
    wd = tmp_path / "wd"
    app = LiVESApp(workdir=wd, sink=CollectSink())
    gen = GeneratorClip("milk_recov_m", width=64, height=48, fps=30.0)
    app.player._player.state.fg_clip = gen
    app.player._player.set_pb_fps(30.0)
    app.player.play()
    app.player.record_start(backup_every=0.0)   # autosave every frame
    t0 = _time.monotonic()
    while _time.monotonic() - t0 < 1.0:
        app.player._player.process_one()
        _time.sleep(0.002)
    # crash: NO record_stop — read the mid-take autosave directly
    el = EventList.from_autosave(
        (wd / "recording.autosave.json").read_text())
    scrap_uids = {r.unique_id
                  for r in app.player._player._scrap_recs.values()}
    for e in el:
        if getattr(e, "clips", None):
            assert e.clips[0] not in scrap_uids
            assert e.clips[0] == gen.unique_id
    app.player._player.record = False           # silence the take
    app.player.stop()
    app.quit()


def test_recover_recording_keeps_autosave_when_unresolvable(tmp_path):
    """A recovered take whose sources don't resolve in this session must
    NOT be rendered blank and destroyed — recover returns None and the
    autosave survives for a later attempt."""
    import json
    from lives_tpu.api import LiVESApp
    from lives_tpu.events.event_list import EventList, frame_event
    wd = tmp_path / "wd"
    wd.mkdir(parents=True)
    el = EventList(fps=25.0)
    for i in range(4):
        el.insert(frame_event(i * 4_000_000, [0x5EED], [i]))
    (wd / "recording.autosave.json").write_text(el.to_json())
    app = LiVESApp(workdir=wd)
    assert app.check_recording_recovery()
    assert app.recover_recording() is None
    assert app.check_recording_recovery()       # autosave preserved
    app.quit()


def test_mid_take_crash_recovers_from_sources_in_fresh_app(tmp_path):
    """Crash BEFORE record_stop: the JSONL autosave holds live-source
    references; a fresh session that re-creates the same generator
    (process-stable uid) recovers and renders from it."""
    import time as _time
    from lives_tpu.api import LiVESApp
    from lives_tpu.effects.milkdrop import register_milk_preset
    from lives_tpu.io.genclip import GeneratorClip
    from lives_tpu.io.jpeg_ingest import load_jpegcoef
    if load_jpegcoef() is None:
        import pytest as _pytest
        _pytest.skip("jpeg bridge unavailable")
    register_milk_preset("[p]\nfDecay=0.85\nwave_a=1\n", "recov_j")
    wd = tmp_path / "wd"
    app = LiVESApp(workdir=wd, sink=CollectSink())
    gen = GeneratorClip("milk_recov_j", width=64, height=48, fps=30.0)
    app.player._player.state.fg_clip = gen
    app.player._player.set_pb_fps(30.0)
    app.player.play()
    app.player.record_start(backup_every=0.0)
    t0 = _time.monotonic()
    while _time.monotonic() - t0 < 1.0:
        app.player._player.process_one()
        _time.sleep(0.002)
    # crash: NO record_stop, fresh app over the same workdir
    app.player._player.record = False
    app.player._player.state.playing = False
    app2 = LiVESApp(workdir=wd, sink=CollectSink())
    assert app2.check_recording_recovery()
    # the performer reopens the same generator: same stable uid
    gen2 = GeneratorClip("milk_recov_j", width=64, height=48, fps=30.0)
    assert gen2.unique_id == gen.unique_id
    app2.player._player.state.fg_clip = gen2
    out = app2.recover_recording()
    assert out is not None and out.raw().frames > 0
    assert np.asarray(out.raw().get_frame(0).planes[0]).max() > 0
    app.quit(); app2.quit()


def test_batchproc_tool(served):
    """tools/batchproc.py — the batchproc.pl successor: runs a templated
    OSC command once per open clip with $clip substitution, selecting
    each clip first and using a ping barrier for completion (reference
    tools/batchproc.pl loop)."""
    import importlib.util as ilu
    import os as _os
    spec = ilu.spec_from_file_location(
        "batchproc", _os.path.join(_os.path.dirname(__file__), "..",
                                   "tools", "batchproc.py"))
    bp = ilu.module_from_spec(spec)
    spec.loader.exec_module(bp)

    srv, player, cli = served
    srv.clips[1] = player.state.fg_clip
    srv.clips[4] = MemClip(uid=4)          # sparse ids on purpose
    logs = []
    res = bp.run_batch("/clip/name/set,take$clip", port=srv.port,
                       log=logs.append)
    assert res == [(1, True), (4, True)]
    assert srv.clips[1].name == "take1"
    assert srv.clips[4].name == "take4"
    # after the loop the last clip is foreground (select side effect)
    assert player.state.fg_clip is srv.clips[4]
    # failing command per clip -> ok=False, engine keeps serving
    res = bp.run_batch("/clip/encode_as", port=srv.port, log=logs.append)
    assert res and all(not ok for _, ok in res)
    assert any("FAILED" in line for line in logs)


def test_rte_test_tool():
    """tools/rte_test.py — the lives-rte-test.pl successor: maps each
    filter on a key over real UDP while a self-hosted player renders,
    sweeps every parameter (min/mid/max, bool states, choice indices)
    with ping barriers and value/get echo checks."""
    import importlib.util as ilu
    import os as _os
    spec = ilu.spec_from_file_location(
        "rte_test", _os.path.join(_os.path.dirname(__file__), "..",
                                  "tools", "rte_test.py"))
    rt = ilu.module_from_spec(spec)
    spec.loader.exec_module(rt)
    logs = []
    names, failures = rt.run_rte_test(limit=4, frames=1, log=logs.append)
    assert len(names) == 4 and not failures, failures
    assert sum(1 for line in logs if line.startswith("ok")) == 4
    # a filter name that cannot instantiate surfaces as a failure
    names, failures = rt.run_rte_test(match="zzz_no_such", log=logs.append)
    assert names == [] and not failures
